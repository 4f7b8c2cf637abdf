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


_MAP_ORACLE = """
SELECT o_orderkey,
       'okey,cust,price' AS keys_csv,
       CAST(CAST(o_orderkey AS DECIMAL(12,2)) AS VARCHAR) || ','
         || CAST(CAST(o_custkey AS DECIMAL(12,2)) AS VARCHAR) || ','
         || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS vals_csv,
       CAST(3 AS INTEGER) AS m_size,
       CAST(o_custkey AS DOUBLE) AS cust_val,
       CAST(1 AS DOUBLE) AS extra_val,
       CAST(CASE WHEN o_orderkey > 100 THEN 1 ELSE 0 END
          + CASE WHEN o_custkey  > 100 THEN 1 ELSE 0 END
          + CASE WHEN o_totalprice > 100 THEN 1 ELSE 0 END AS INTEGER) AS n_big,
       CAST(o_orderkey * 2 AS DOUBLE) AS okey_doubled
FROM orders WHERE o_custkey <= 20
"""


@query("fn_map", oracle=_MAP_ORACLE, tags=("function", "nested", "map"))
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType operator surface: construction (create_map), introspection
    (map_keys / map_values / size), lookup (element_at), merge
    (map_concat), and higher-order map lambdas (map_filter /
    transform_values) — the full map half of the nested-type capability
    the engine adds over the reference's flat-only scanner
    (hdfs-parquet-scanner.cc:1430-1435).

    Spark maps preserve insertion order, so keys_csv/vals_csv are
    deterministic; every map output is reduced to scalars/strings (the
    driver's canonicalizer cannot hash ndarray/dict cells).  The oracle
    states the expected values directly in flat SQL — the point under
    test is that Spark's map expressions compute them."""
    price = F.col("o_totalprice").cast("decimal(12,2)").cast("double")
    m = F.create_map(
        F.lit("okey"), F.col("o_orderkey").cast("double"),
        F.lit("cust"), F.col("o_custkey").cast("double"),
        F.lit("price"), price,
    )
    merged = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1.0)))
    big = F.map_filter(m, lambda k, v: v > 100.0)
    doubled = F.transform_values(m, lambda k, v: v * 2)
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 20)
        .select(
            "o_orderkey",
            F.array_join(F.map_keys(m), ",").alias("keys_csv"),
            F.array_join(
                F.transform(
                    F.map_values(m),
                    lambda v: v.cast("decimal(12,2)").cast("string"),
                ),
                ",",
            ).alias("vals_csv"),
            F.size(m).alias("m_size"),
            F.element_at(m, F.lit("cust")).alias("cust_val"),
            F.element_at(merged, F.lit("extra")).alias("extra_val"),
            F.size(big).alias("n_big"),
            F.element_at(doubled, F.lit("okey")).alias("okey_doubled"),
        )
    )


_VARIANT_ORACLE = """
WITH j AS (
  SELECT doc_id,
         '{"meta":{"lang":"' || lang || '","source":"' || source ||
         '"},"n":' || n_chars || ',"tags":[' || (doc_id % 3) || ',' ||
         (doc_id % 5) || ']}' AS payload
  FROM documents
)
SELECT doc_id,
       json_extract_string(payload, '$.meta.lang') AS lang,
       json_extract_string(payload, '$.meta.source') AS source,
       CAST(json_extract(payload, '$.n') AS BIGINT) AS n_chars,
       CAST(json_extract(payload, '$.tags[1]') AS INTEGER) AS tag1,
       json_extract_string(payload, '$.absent') AS missing_path
FROM j
"""


def _register_variant_query() -> None:
    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.registry import query

    @query(
        "fn_variant_path",
        oracle=_VARIANT_ORACLE,
        tags=("function", "nested", "variant", "json"),
    )
    def fn_variant_path(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spark 4 VARIANT — the open-format semi-structured type (binary
        JSON with typed access, the modern replacement for
        string-JSON + get_json_object): `parse_json` ingests a JSON
        payload once into VARIANT, then `variant_get(v, path, type)`
        reads typed fields without re-parsing per extraction — at 100 TB
        the parse-once property is the difference between one and N
        passes over every payload byte (and VARIANT columns shred into
        parquet for pushdown).  Pins: nested object paths, array
        subscripts ('$.tags[1]'), typed extraction (string/bigint/int),
        and a missing path returning NULL rather than erroring.  The
        JSON payload is CONSTRUCTED by identical string concatenation on
        both engines (keys without spaces, integer values — no
        serialization ambiguity), and the DuckDB oracle reads the same
        paths with its native json_extract family.  Row-local
        expressions only: scan -> project, zero shuffles.  Reference
        parity: string/JSON function scope (SURVEY §2A #21 adjacent);
        complements `events_json_props` (string-JSON path) by pinning
        the TYPED variant access path."""
        d = table(spark, sf_dir, "documents")
        payload = F.concat(
            F.lit('{"meta":{"lang":"'),
            F.col("lang"),
            F.lit('","source":"'),
            F.col("source"),
            F.lit('"},"n":'),
            F.col("n_chars").cast("string"),
            F.lit(',"tags":['),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(","),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("]}"),
        )
        v = F.parse_json(payload)
        return d.select(
            "doc_id",
            F.variant_get(v, "$.meta.lang", "string").alias("lang"),
            F.variant_get(v, "$.meta.source", "string").alias("source"),
            F.variant_get(v, "$.n", "bigint").alias("n_chars"),
            F.variant_get(v, "$.tags[1]", "int").alias("tag1"),
            F.variant_get(v, "$.absent", "string").alias("missing_path"),
        )


_register_variant_query()
