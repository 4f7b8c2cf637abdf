"""Property-style predicate parity (seeded, mirroring the reference's
randomized round-trip tests — fle-test.cc:264-275 but deterministic):
for arbitrary thresholds/flags, Spark's pushed-down filter must select
exactly the rows DuckDB selects."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,  # seeded: same examples every run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    qty=st.floats(min_value=0.0, max_value=55.0, allow_nan=False),
    flag=st.sampled_from(["A", "N", "R"]),
    line_lo=st.integers(min_value=1, max_value=7),
)
def test_conjunctive_filter_count_matches_duckdb(spark, duck, sf_dir, qty, flag, line_lo):
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") <= qty)
            & (F.col("l_returnflag") == flag)
            & (F.col("l_linenumber") >= line_lo)
        )
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_quantity <= ? AND l_returnflag = ?"
        " AND l_linenumber >= ?",
        [qty, flag, line_lo],
    ).fetchone()[0]
    assert got == want


@settings(**_SETTINGS)
@given(
    lo=st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
    width=st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
)
def test_between_on_discount_matches_duckdb(spark, duck, sf_dir, lo, width):
    hi = lo + width
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount").between(lo, hi))
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_discount BETWEEN ? AND ?", [lo, hi]
    ).fetchone()[0]
    assert got == want


@settings(**_SETTINGS)
@given(date_str=st.dates().map(str))
def test_date_range_matches_duckdb(spark, duck, sf_dir, date_str):
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit(date_str).cast("timestamp_ntz"))
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_shipdate < CAST(? AS TIMESTAMP)",
        [date_str],
    ).fetchone()[0]
    assert got == want
