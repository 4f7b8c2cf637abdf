"""Multimodal column conventions: image/audio/video as opaque binary
columns with typed metadata (north-star training-data pipeline surface).

Design: media payloads ride as `binary` columns next to structured
metadata (modality, format, dims, duration).  Decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas iterators
(`mapInPandas`) so a 100 TB corpus streams batch-by-batch through Python
workers without per-row serde.  The actual codec step is STUBBED (the
image/audio libraries are not in this container): `decode_stub=True`
produces deterministic fake features so the Spark-side plumbing — schema,
batching, partitioning — is real and tested; a production deployment
swaps `_decode_image_batch` for a Pillow/OpenCV implementation without
touching the plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical schema for a multimodal asset table.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("media_format", StringType(), True),  # png|wav|mp4|...
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_features(payload: bytes | None) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256(payload) scaled to [0, 1).  Replace with a real decoder+model
    in production; shape and dtype are the contract."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def _decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decode: production would decode pdf['payload'] via Pillow and
    run a feature extractor.  The container lacks image libs, so features
    are the deterministic fake above (raise NotImplementedError here if a
    hard failure is preferred over fake features)."""
    return pd.DataFrame(
        {
            "asset_id": pdf["asset_id"],
            "modality": pdf["modality"],
            "payload_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
            "payload_sha": pdf["payload"].map(
                lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
            ),
            "features": pdf["payload"].map(_fake_features),
        }
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams one pandas batch per Arrow chunk — constant memory
    per task regardless of corpus size; partition count controls
    parallelism (repartition upstream for small-file corpora)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_image_batch(pdf)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def synthesize_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (payload = repeated id
    bytes; no external media libs needed)."""
    rows = []
    for i in range(n):
        payload = bytes([i % 256] * (64 + i))
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                modality,
                {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                payload,
                64 if modality == "image" else None,
                48 if modality == "image" else None,
                1000 * i if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan-shape for video frame sampling: explode timestamps at a fixed
    stride (decode of each frame is the stubbed step).  Demonstrates the
    partition-preserving explode pattern: no shuffle, output rows stay on
    the worker holding the payload."""
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("asset_id", "media_format", "frame_ts_ms", "payload")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """STUB image resize over mapInPandas (production: Pillow/OpenCV
    decode → resample → re-encode).  The fake keeps the contract real:
    output payload is a deterministic function of the input payload and
    the target dims (here: sha256-keyed truncation to width*height bytes),
    and the declared dims are rewritten.  Plan shape is identical to a
    real resize: narrow (no shuffle), Arrow-batched, constant memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            def fake_resize(p: bytes | None) -> bytes | None:
                if p is None:
                    return None
                seed = hashlib.sha256(p).digest()
                reps = target // len(seed) + 1
                return (seed * reps)[:target]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_format": pdf["media_format"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(fake_resize),
                }
            )

    return assets.filter(F.col("modality") == "image").select(
        "asset_id", "media_format", "payload"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)


def audio_window_plan(assets: DataFrame, window_ms: int = 500) -> DataFrame:
    """Plan-shape for audio windowing (the audio twin of
    frame_sample_plan): explode fixed-stride windows over the declared
    duration; per-window decode/feature-extract is the stubbed step.
    Partition-preserving — rows stay with the payload's worker."""
    return (
        assets.filter(F.col("modality") == "audio")
        .withColumn(
            "window_start_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(window_ms))),
        )
        .select("asset_id", "media_format", "window_start_ms", "payload")
    )


_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha256
FROM documents
"""


def _register_multimodal_query() -> None:
    from pyspark.sql import SparkSession

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.registry import query

    @query(
        "multimodal_features",
        oracle=_FEATURES_ORACLE,
        tags=("pipeline", "multimodal", "pandas_udf"),
    )
    def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Arrow-batched binary-column feature extraction, value-verified:
        each document's text is carried as an opaque `binary` payload (the
        multimodal column convention) and a `mapInPandas` iterator computes
        byte length + SHA-256 per payload — exactly what a real image/audio
        featurizer does before the codec call.  Because the payload is
        derived from the text column, DuckDB replays the whole thing
        (octet_length + sha256), making this the oracle-checked proof that
        the Arrow batch path (BinaryType → pandas bytes → schema'd output)
        is lossless.  The codec-dependent stubs above stay rows-only."""
        schema = StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("n_bytes", LongType(), False),
                StructField("payload_sha256", StringType(), False),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": pdf["payload"].map(len).astype("int64"),
                        "payload_sha256": pdf["payload"].map(
                            lambda b: hashlib.sha256(bytes(b)).hexdigest()
                        ),
                    }
                )

        d = table(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        )
        return d.mapInPandas(run, schema=schema)


_register_multimodal_query()
