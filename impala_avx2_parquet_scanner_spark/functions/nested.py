"""Nested-type surface: arrays, higher-order lambdas, and map columns.

The reference's schema tree supports nesting but its scanner rejects any
non-flat column ("not a supported type", hdfs-parquet-scanner.cc:1430-1435)
— SURVEY §1.2 marks nested types as a capability our engine ADDS on top of
the reference contract.  This module exercises ArrayType end-to-end with a
DuckDB oracle: construction (collect), ordering (array_sort), indexing,
higher-order transform/filter/fold, and a MapType build + lookup.

Everything is JVM-side whole-stage-codegen'd expression work: the only
shuffle is the groupBy that builds the arrays, and it carries one row per
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

_NESTED_ORACLE = """
SELECT l_orderkey,
       array_to_string(qtys, ',') AS qtys,
       CAST(LEN(qtys) AS BIGINT) AS n_qtys,
       qtys[1] AS first_qty,
       qtys[-1] AS last_qty,
       array_to_string(list_transform(qtys, x -> x * 2), ',') AS doubled,
       -- COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
       COALESCE(array_to_string(list_filter(qtys, x -> x > 25.0), ','), '') AS big_qtys,
       list_reduce(qtys, (a, x) -> a + x) AS total_qty,
       map(['total'], [list_reduce(qtys, (a, x) -> a + x)])['total'][1] AS map_total
FROM (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
  FROM lineitem WHERE l_orderkey <= 400 GROUP BY l_orderkey
) t
"""


@query("fn_nested_array", oracle=_NESTED_ORACLE, tags=("function", "nested"))
def fn_nested_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda/map surface over per-order quantity vectors.

    collect_list order is partition-dependent, so array_sort is applied
    before any order-sensitive op (indexing, fold) — that is what makes
    the fold deterministic at any parallelism.  The map lookup mirrors
    DuckDB's map-extract-returns-list quirk by unwrapping with [1] on the
    oracle side only.  Array-valued outputs are emitted as CSV strings
    (same information) because the driver's pandas canonicalizer cannot
    hash ndarray cells; the arrays themselves remain the intermediate
    representation every op runs on."""

    def csv(col):
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    arr = F.array_sort(F.collect_list("l_quantity"))
    grouped = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 400)
        .groupBy("l_orderkey")
        .agg(arr.alias("qtys"))
    )
    total = F.aggregate(F.col("qtys"), F.lit(0.0), lambda a, x: a + x)
    return grouped.select(
        "l_orderkey",
        csv(F.col("qtys")).alias("qtys"),
        F.size("qtys").cast("bigint").alias("n_qtys"),
        F.element_at("qtys", 1).alias("first_qty"),
        F.element_at("qtys", -1).alias("last_qty"),
        csv(F.transform("qtys", lambda x: x * 2)).alias("doubled"),
        csv(F.filter("qtys", lambda x: x > 25.0)).alias("big_qtys"),
        total.alias("total_qty"),
        F.element_at(
            F.create_map(F.lit("total"), total), F.lit("total")
        ).alias("map_total"),
    )
