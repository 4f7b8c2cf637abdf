"""Bloom-sidecar point-lookup bench: byte-identical hash-scattered
fledir tables with and without `bloomcols`, probed by the same eq
lookup through the real DSv2 scan path.

The layout is the adversarial one for the stats tier: the id column is
hash-scattered, so every segment's manifest min/max spans nearly the
whole domain and file pruning is impossible — the case where the
reference's hash bitmap probe (hdfs-parquet-scanner.cc:235-246) is the
only thing standing between a point lookup and a full-table decode.

Run: python tools/fle_bloom_bench.py [n_rows] [n_segments] [reps]
"""
from __future__ import annotations

import gc
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark.session import get_spark  # noqa: E402
from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (  # noqa: E402
    encode_segment_columns,
    register_fledir,
)


def build(spark, path: str, n_rows: int, n_segments: int,
          bloom: bool) -> None:
    import pandas as pd

    if os.path.isdir(path):
        shutil.rmtree(path)
    per = n_rows // n_segments

    def encode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                i = int(row["seg_id"])
                # segment i holds ids ≡ i (mod n_segments): every
                # segment's [min, max] spans ~the whole domain
                ids = np.arange(i, n_rows, n_segments, dtype=np.int64)
                # a realistic wide row: ~40 payload bytes of opaque
                # text per row (the shape of a documents/log table) —
                # the point lookup reads only `rid`, but without a
                # bloom every segment's BYTES must still be read and
                # parsed before the kernels can reject it
                fp = np.array(
                    [f"fp-{v:016d}-{v * 2654435761 % 10 ** 12:012d}"
                     for v in ids],
                    dtype=object,
                )
                payload = encode_segment_columns([
                    ("rid", ids),
                    ("fp", fp, "str_plain"),
                    ("val", ids * 3 % 1000),
                ])
                yield pd.DataFrame(
                    {"seg_id": [i], "payload": [payload]}
                )

    w = (
        spark.createDataFrame(
            [(i,) for i in range(n_segments)], "seg_id long"
        )
        .repartition(8)
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", path)
    )
    if bloom:
        w = w.option("bloomcols", "rid")
    w.save()
    assert per > 0


def lookup(spark, path: str, key: int) -> int:
    from pyspark.sql import functions as F

    df = (
        spark.read.format("fledir").option("path", path).load()
        .filter(F.col("rid") == key)
    )
    return df.count()


def timed(spark, path: str, key: int, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        n = lookup(spark, path, key)
        out.append(time.time() - t0)
        assert n == 1, n
    return out


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("bloom-bench", cpus=8)
    register_fledir(spark)
    root = "/tmp/spark_graft_bloom_bench"
    with_bf = os.path.join(root, "with_bloom")
    without = os.path.join(root, "no_bloom")
    build(spark, with_bf, n_rows, n_segments, bloom=True)
    build(spark, without, n_rows, n_segments, bloom=False)
    key = 7 * n_segments + 5  # lives in exactly one segment
    # warm both paths once (JIT, module import on workers)
    lookup(spark, with_bf, key)
    lookup(spark, without, key)
    t_bf = timed(spark, with_bf, key, reps)
    t_no = timed(spark, without, key, reps)
    bf_bytes = sum(
        os.path.getsize(os.path.join(with_bf, f))
        for f in os.listdir(with_bf)
        if f.endswith(".bf")
    )
    print(
        f"rows={n_rows} segments={n_segments} reps={reps}\n"
        f"with blooms:  min {min(t_bf):.3f}s  reps {['%.3f' % t for t in t_bf]}\n"
        f"without:      min {min(t_no):.3f}s  reps {['%.3f' % t for t in t_no]}\n"
        f"speedup (min/min): {min(t_no) / min(t_bf):.2f}x\n"
        f"sidecar bytes total: {bf_bytes} "
        f"({bf_bytes / max(n_rows, 1):.2f} B/row)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
