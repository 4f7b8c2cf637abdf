"""fledir streaming SINK: `writeStream.format("fledir")` with
exactly-once epoch commits — stream copy equals batch, restart picks
up only new data, epoch replay is idempotent via deterministic
per-batch names + prefix replacement, the full type matrix round-trips
through the sink, and sink output composes with the batch reader,
metadata aggregates, and time travel."""
from __future__ import annotations

import decimal as decm
import os

import numpy as np
import pytest

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
    _history_generations,
    _manifest_entries,
    encode_segment_columns,
    fledir_row_count,
    register_fledir,
)


def _put_feed(d: str, seg_id: int, lo: int, n: int = 10) -> None:
    os.makedirs(d, exist_ok=True)
    ids = np.arange(lo, lo + n, dtype=np.int64)
    payload = encode_segment_columns([
        ("k", ids),
        ("tag", np.array([f"t{v % 3}" for v in ids], dtype=object)),
    ])
    with open(os.path.join(d, f"seg_{seg_id:06d}.fle"), "wb") as fh:
        fh.write(payload)


def _rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.format("fledir")
        .option("path", path).load().select("k", "tag").collect()
    )


def test_stream_copy_equals_batch_and_restart_exactly_once(
    spark, tmp_path
):
    register_fledir(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    for i, lo in ((1, 0), (2, 100)):
        _put_feed(src, i, lo)

    def run():
        q = (
            spark.readStream.format("fledir")
            .option("path", src).load()
            .writeStream.format("fledir")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run()
    src_rows = sorted(
        (v, f"t{v % 3}")
        for lo in (0, 100)
        for v in range(lo, lo + 10)
    )
    assert _rows(spark, dst) == src_rows
    assert fledir_row_count(dst) == 20  # manifest metadata works
    # restart with MORE source data: only the new rows land, once
    _put_feed(src, 3, 500)
    run()
    assert len(_rows(spark, dst)) == 30
    assert {r[0] for r in _rows(spark, dst)} == (
        set(range(0, 10)) | set(range(100, 110)) | set(range(500, 510))
    )
    # rerun with NO new data: nothing changes (no empty-batch litter)
    before = _manifest_entries(dst)
    run()
    assert _manifest_entries(dst) == before
    # sink commits recorded generations (time travel on sink output)
    assert len(_history_generations(dst)) >= 2
    g1 = os.path.join(dst, "_history", "1.manifest")
    assert os.path.exists(g1)


def test_epoch_replay_is_idempotent_even_with_narrower_retry(
    spark, tmp_path
):
    """Simulate a crashed epoch retried with fewer partitions: the
    second commit of the SAME batchId must leave exactly its own rows
    — the wider first attempt's extra segment is swept."""
    from pyspark.sql import types as T

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleStreamWriter,
        _stream_rows_to_columns,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
    ])
    d = str(tmp_path / "replay")
    w = FleStreamWriter({"path": d}, schema)

    class Row2(tuple):
        pass

    def msg(rows):
        return w.write(iter([Row2(r) for r in rows]))

    # attempt 1 of batch 7: two partitions
    m1 = msg([(1, "a"), (2, "b")])
    m2 = msg([(3, "c")])
    w.commit([m1, m2], batchId=7)
    assert fledir_row_count(d) == 3
    names1 = {n for n, _ in _manifest_entries(d)}
    assert names1 == {"seg_s7_0.fle", "seg_s7_1.fle"}
    # attempt 2 (replay) of batch 7: ONE partition, same logical rows
    m3 = msg([(1, "a"), (2, "b"), (3, "c")])
    w.commit([m3], batchId=7)
    assert {n for n, _ in _manifest_entries(d)} == {"seg_s7_0.fle"}
    assert fledir_row_count(d) == 3
    # no orphan bytes from the wider attempt
    assert sorted(
        f for f in os.listdir(d) if f.endswith(".fle")
    ) == ["seg_s7_0.fle"]
    # a later epoch APPENDS
    w.commit([msg([(9, "z")])], batchId=8)
    assert fledir_row_count(d) == 4
    assert _rows(spark, d) == sorted(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")]
    )


def test_sink_type_matrix_roundtrip(spark, tmp_path):
    """Every supported Spark type through the sink and back through
    the batch reader, NULLs intact."""
    import datetime as dtm

    from pyspark.sql import types as T

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleStreamWriter,
    )

    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("neg", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("dt", T.DateType()),
        T.StructField("m", T.DecimalType(12, 2)),
    ])
    rows = [
        (1, -5, "aa", 1.5, True,
         dtm.datetime(1995, 6, 1, 12), dtm.date(1995, 6, 1),
         decm.Decimal("1.25")),
        (None, None, None, None, None, None, None, None),
        (7, 3, "zz", -2.25, False,
         dtm.datetime(1997, 1, 2), dtm.date(1997, 1, 2),
         decm.Decimal("-3.50")),
    ]
    d = str(tmp_path / "types")
    w = FleStreamWriter({"path": d}, schema)
    w.commit([w.write(iter(rows))], batchId=0)
    register_fledir(spark)
    got = sorted(
        (tuple(r) for r in spark.read.format("fledir")
         .option("path", d).load().collect()),
        key=str,
    )
    assert got == sorted(rows, key=str)


def test_sink_bloomcols_and_unsupported_type(spark, tmp_path):
    from pyspark.sql import types as T

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleStreamWriter,
        bloom_sidecar_refutes,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
    ])
    d = str(tmp_path / "bf")
    w = FleStreamWriter({"path": d, "bloomcols": "k"}, schema)
    w.commit([w.write(iter([(1, "a"), (5, "b")]))], batchId=0)
    bf = os.path.join(d, "seg_s0_0.fle.bf")
    assert os.path.exists(bf)
    assert not bloom_sidecar_refutes(bf, [("k", [5])])
    assert bloom_sidecar_refutes(bf, [("k", [999_999])])
    with pytest.raises(ValueError, match="not in the stream schema"):
        FleStreamWriter({"path": d, "bloomcols": "nope"}, schema)
    arr_schema = T.StructType([
        T.StructField("a", T.ArrayType(T.LongType())),
    ])
    w2 = FleStreamWriter({"path": str(tmp_path / "x")}, arr_schema)
    with pytest.raises(ValueError, match="unsupported column type"):
        w2.write(iter([([1, 2],)]))


def test_sink_output_composes_with_maintenance(spark, tmp_path):
    """Sink segments are first-class: compaction + vacuum over sink
    output keeps rows and the sum metadata exact."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleStreamWriter,
        fledir_sum,
    )
    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        compact_fledir,
        vacuum_fledir,
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
    ])
    d = str(tmp_path / "mx")
    w = FleStreamWriter({"path": d}, schema)
    for b in range(4):
        w.commit(
            [w.write(iter([(b * 10 + j, "x") for j in range(5)]))],
            batchId=b,
        )
    total = sum(b * 10 + j for b in range(4) for j in range(5))
    assert fledir_sum(d, ["k"]) == {"k": (total, 20)}
    register_fledir(spark)
    compact_fledir(spark, d, target_rows=1000)
    vacuum_fledir(d)
    assert fledir_row_count(d) == 20
    assert fledir_sum(d, ["k"]) == {"k": (total, 20)}
