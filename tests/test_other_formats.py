"""Additional source formats beyond parquet/CSV: ORC and JSON round-trips
(SURVEY §2B multi-format scan; Avro needs an external jar — gated)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table


def _rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert _rows(back, "o_orderkey") == _rows(src, "o_orderkey")


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc2")
    src.write.mode("overwrite").orc(out)
    got = spark.read.orc(out).filter(F.col("o_totalprice") > 450000).count()
    want = src.filter(F.col("o_totalprice") > 450000).count()
    assert got == want


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    assert _rows(back, "c_custkey") == _rows(src, "c_custkey")


def test_json_nested_read(spark, tmp_path):
    p = tmp_path / "nested.json"
    p.write_text(
        '{"id": 1, "meta": {"tags": ["a", "b"], "score": 0.5}}\n'
        '{"id": 2, "meta": {"tags": [], "score": null}}\n'
    )
    df = spark.read.schema(
        "id long, meta struct<tags: array<string>, score: double>"
    ).json(str(p))
    rows = {r.id: (r.meta.tags, r.meta.score) for r in df.collect()}
    assert rows == {1: (["a", "b"], 0.5), 2: ([], None)}
    # nested access + explode
    n = df.select("id", F.explode_outer("meta.tags").alias("tag")).count()
    assert n == 3  # two tags for id 1, one null row for id 2


def test_avro_gated(spark, tmp_path):
    """Avro requires the external spark-avro jar; absent here by design
    (SURVEY §1.1 declares it out of scope for v1) — pin the clean error."""
    df = spark.range(3)
    with pytest.raises(Exception, match="avro|AVRO|Failed to find"):
        df.write.format("avro").save(str(tmp_path / "a"))
