"""Bucketing: pre-shuffled table layout so equi-joins and aggregations on
the bucket key run with ZERO exchanges — the 100 TB co-location lever
(pyspark guide 'Partitioning & shuffle'; SURVEY §2B partition machinery).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.plans import exchange_count


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    (
        l.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    li, ord_ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = (
            spark.table(li)
            .join(spark.table(ord_), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "l_quantity", "o_totalprice")
        )
        # co-located buckets: the sort-merge join needs no shuffle at all
        assert exchange_count(joined) == 0
        # and the result is still correct
        expect = (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = spark.table(li).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert exchange_count(agg) == 0


def test_bucketed_registry_query_reregisters_external_layout(spark, sf_dir):
    """join_bucketed_colocated's write-once layout survives catalog loss
    (a fresh driver session has an empty in-memory catalog while the
    /tmp layout persists): dropping the catalog entries and re-invoking
    must re-register the EXTERNAL bucketed tables over the existing
    files via DDL — same values, and the join still plans with only the
    final rollup exchange."""
    from impala_avx2_parquet_scanner_spark.operators.joins import (
        bucketed_orderkey_tables,
        join_bucketed_colocated,
    )

    li, od = bucketed_orderkey_tables(spark, sf_dir)
    before = {
        r.o_orderpriority: (r.n_lines, r.revenue)
        for r in join_bucketed_colocated(spark, sf_dir).collect()
    }
    # simulate the fresh-session state: catalog gone, files still there
    spark.sql(f"DROP TABLE {li}")
    spark.sql(f"DROP TABLE {od}")
    df = join_bucketed_colocated(spark, sf_dir)
    assert exchange_count(df) == 1  # join itself still exchange-free
    after = {
        r.o_orderpriority: (r.n_lines, r.revenue) for r in df.collect()
    }
    assert after == before
