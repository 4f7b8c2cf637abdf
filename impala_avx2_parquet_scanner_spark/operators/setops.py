"""Set operations (SURVEY.md §2B — not in the reference slice; part of the
north-star relational surface).  UNION [ALL] / INTERSECT / EXCEPT with
exact bag/set semantics matching ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query


def _big_spenders(spark, sf_dir) -> DataFrame:
    """custkeys with an order > 450k."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _urgent_custs(spark, sf_dir) -> DataFrame:
    """custkeys with an urgent order."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


_A_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000"
_B_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query(
    "set_union_distinct",
    oracle=f"{_A_SQL} UNION {_B_SQL}",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — dedup via hash aggregate after the union."""
    return _big_spenders(spark, sf_dir).union(_urgent_custs(spark, sf_dir)).distinct()


@query(
    "set_union_all_counted",
    oracle=f"""
SELECT custkey, COUNT(*) AS n FROM ({_A_SQL} UNION ALL {_B_SQL}) u GROUP BY custkey
""",
    tags=("setop",),
)
def set_union_all_counted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (surfaced as multiplicity counts so the
    unordered hash compare still pins bag semantics)."""
    return (
        _big_spenders(spark, sf_dir)
        .union(_urgent_custs(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_intersect",
    oracle=f"{_A_SQL} INTERSECT {_B_SQL}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    return _big_spenders(spark, sf_dir).intersect(_urgent_custs(spark, sf_dir))


@query(
    "set_except",
    oracle=f"{_A_SQL} EXCEPT {_B_SQL}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): removes every custkey present in B regardless of
    multiplicity (subtract = ANSI EXCEPT, not exceptAll's bag difference)."""
    return _big_spenders(spark, sf_dir).subtract(_urgent_custs(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle=f"{_A_SQL} INTERSECT ALL {_B_SQL}",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min multiplicity)."""
    return _big_spenders(spark, sf_dir).intersectAll(_urgent_custs(spark, sf_dir))
