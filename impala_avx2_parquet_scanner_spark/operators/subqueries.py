"""Subquery + reshaping surface (SURVEY.md §2B — FE territory in Impala,
native in Spark SQL): scalar subqueries, IN-subqueries, correlated
EXISTS, pivot/unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import register_views, table
from impala_avx2_parquet_scanner_spark.registry import query


@query(
    "subq_scalar",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
""",
    tags=("subquery",),
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (broadcast single value — the scalable
    form of a global statistic filter).  AVG over doubles is order-
    dependent in the last ulp, but the 1.5× threshold sits far from any
    data point so both engines agree on the row set."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "subq_in",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
  AND c_mktsegment = 'MACHINERY'
""",
    tags=("subquery", "semi"),
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → planned as left semi join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
          AND c_mktsegment = 'MACHINERY'
        """
    )


@query(
    "subq_correlated_exists",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_quantity = 50 AND l_discount = 0.0)
""",
    tags=("subquery", "correlated"),
)
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated to a semi join by Catalyst
    (RewriteCorrelatedScalarSubquery family, SURVEY.md §4)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity = 50
                        AND l_discount = 0.0)
        """
    )


@query(
    "pivot_wide",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
       COUNT(*) FILTER (o_orderpriority = '5-LOW') AS n_low,
       COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT','5-LOW')) AS n_other
FROM orders GROUP BY o_orderstatus
""",
    tags=("pivot",),
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide via DataFrame .pivot() with an explicit value list
    (explicit lists avoid the extra distinct-scan pass at scale)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "pri_bucket",
        F.when(F.col("o_orderpriority") == "1-URGENT", "n_urgent")
        .when(F.col("o_orderpriority") == "5-LOW", "n_low")
        .otherwise("n_other"),
    )
    return (
        o.groupBy("o_orderstatus")
        .pivot("pri_bucket", ["n_urgent", "n_low", "n_other"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["n_urgent", "n_low", "n_other"])
    )


@query(
    "unpivot_long",
    oracle="""
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
) t WHERE c_custkey <= 100
""",
    tags=("pivot", "unpivot"),
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the native unpivot/melt operator."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
""",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over a projection (hash-aggregate dedup)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .dropDuplicates()
    )


@query(
    "global_sort",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
WHERE o_totalprice > 480000
ORDER BY o_totalprice DESC, o_orderkey
""",
    tags=("sort",),
)
def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort (range-partitioned exchange + per-partition
    sort — the only scalable global sort shape)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 480000)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


_NOT_IN_SQL = """
WITH hot AS (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
  UNION ALL SELECT CAST(NULL AS BIGINT)
)
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT k FROM hot)) AS n_notin_with_null,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT k FROM hot WHERE k IS NOT NULL)) AS n_notin_filtered,
  (SELECT COUNT(*) FROM customer
   WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.k = customer.c_custkey)) AS n_not_exists
"""


@query("subq_not_in", oracle=_NOT_IN_SQL, tags=("subquery", "anti", "nulls"))
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued-logic contract (compound-predicates.cc:24-245
    Kleene semantics applied to subqueries): one NULL in the subquery makes
    every NOT IN test UNKNOWN, so `n_notin_with_null` is provably 0, while
    the IS NOT NULL-filtered form and NOT EXISTS agree.  Identical SQL text
    on both engines.

    Scale note: Spark plans nullable NOT IN as a *null-aware anti join*,
    which only supports broadcast — on a large subquery this is the classic
    OOM trap.  The fix this query documents: filter NULLs (or prove the
    column non-nullable) so Catalyst plans a plain shuffleable left-anti
    join, or rewrite to NOT EXISTS."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)
