"""Relational-operator properties not covered by the oracle hash: approx
sketch error bounds, as-of join edge cases, runtime-filter plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

import impala_avx2_parquet_scanner_spark as engine
from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.operators.asof import asof_join
from impala_avx2_parquet_scanner_spark.registry import REGISTRY

engine.load_all()


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """agg_approx surfaces tolerance booleans (HLL at rsd=0.01 vs exact
    within 5%; GK quantiles vs exact percentile within 5%) — the oracle
    pins them to TRUE, and so does this test; exact_orders must equal the
    independent countDistinct."""
    rows = {r.l_returnflag: r for r in REGISTRY["agg_approx"].fn(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: r.n
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, r in rows.items():
        assert r.exact_orders == exact[flag]
        assert r.approx_distinct_ok


def test_percentile_approx_within_range(spark, sf_dir):
    for r in REGISTRY["agg_approx"].fn(spark, sf_dir).collect():
        assert r.approx_median_ok
        assert r.approx_p99_ok


def test_asof_join_no_prior_row_is_null(spark):
    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 50, "L0"), (2, 10, "Lx")], "k long, t long, lbl string"
    )
    right = spark.createDataFrame(
        [(1, 60, 9.0), (1, 99, 11.0), (3, 5, 7.0)], "k long, t long, v double"
    )
    out = {
        (r.k, r.t): r.asof_v
        for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()
    }
    assert out[(1, 100)] == 11.0  # latest right t<=100 is 99
    assert out[(1, 50)] is None   # no right row at/before 50
    assert out[(2, 10)] is None   # key has no right rows at all


def test_asof_join_equal_time_matches(spark):
    """right_time == left_time qualifies (<= contract, DuckDB parity)."""
    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame([(1, 100, 5.0)], "k long, t long, v double")
    row = asof_join(left, right, "k", "t", "t", ["v"]).collect()[0]
    assert row.asof_v == 5.0


def test_bloom_filter_runtime_conf_active(spark):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_pivot_matches_case_form(spark, sf_dir):
    """DataFrame .pivot() and the conditional-agg form produce the same
    table (same Catalyst plan family)."""
    wide = {r.o_orderstatus: (r.n_urgent, r.n_low, r.n_other)
            for r in REGISTRY["pivot_wide"].fn(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders")
    manual = {
        r.o_orderstatus: (r.u, r.l, r.o)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("u"),
            F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)).alias("l"),
            F.sum(
                F.when(~F.col("o_orderpriority").isin("1-URGENT", "5-LOW"), 1).otherwise(0)
            ).alias("o"),
        )
        .collect()
    }
    assert wide == manual
