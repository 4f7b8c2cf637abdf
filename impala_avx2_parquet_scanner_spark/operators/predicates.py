"""Predicate operators — the reference's core contribution re-expressed.

The reference evaluates conjuncts of {=, <, <=, >, >=, IN, AND, OR} over
(column, literal) pairs directly on encoded parquet data
(simple-predicates.h:30-205; extraction contract scalar-fn-call.cc:733-965),
falling back to row-at-a-time evaluation for anything else
(hdfs-parquet-scanner.cc:1183-1222).  Spark's split is identical: the same
operator set becomes parquet PushedFilters (EqualTo/LessThan/…/In/And/Or),
everything else a codegen'd residual Filter.  One query per predicate form
pins both semantics and (via plan tests) the pushdown.

Kleene 3-valued AND/OR (compound-predicates.cc:23-57) is exercised with
NULLIF-manufactured nulls since the fixture tables are null-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

_PROJ = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"]
_PROJ_SQL = "l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag"


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem")


@query(
    "pred_eq",
    oracle=f"SELECT {_PROJ_SQL} FROM lineitem WHERE l_linenumber = 3",
    tags=("predicate", "pushdown"),
)
def pred_eq(spark, sf_dir):
    """EqualTo on int32 → pushed (scalar-fn-call.cc:945 'eq')."""
    return _lineitem(spark, sf_dir).filter(F.col("l_linenumber") == 3).select(*_PROJ)


@query(
    "pred_lt",
    oracle=f"SELECT {_PROJ_SQL} FROM lineitem WHERE l_quantity < 3",
    tags=("predicate", "pushdown"),
)
def pred_lt(spark, sf_dir):
    """LessThan on double → pushed ('lt')."""
    return _lineitem(spark, sf_dir).filter(F.col("l_quantity") < 3).select(*_PROJ)


@query(
    "pred_le",
    oracle=f"SELECT {_PROJ_SQL} FROM lineitem WHERE l_quantity <= 2",
    tags=("predicate", "pushdown"),
)
def pred_le(spark, sf_dir):
    """LessThanOrEqual ('le')."""
    return _lineitem(spark, sf_dir).filter(F.col("l_quantity") <= 2).select(*_PROJ)


@query(
    "pred_gt",
    oracle=f"SELECT {_PROJ_SQL} FROM lineitem WHERE l_quantity > 48",
    tags=("predicate", "pushdown"),
)
def pred_gt(spark, sf_dir):
    """GreaterThan ('gt')."""
    return _lineitem(spark, sf_dir).filter(F.col("l_quantity") > 48).select(*_PROJ)


@query(
    "pred_ge",
    oracle=f"SELECT {_PROJ_SQL} FROM lineitem WHERE l_quantity >= 49",
    tags=("predicate", "pushdown"),
)
def pred_ge(spark, sf_dir):
    """GreaterThanOrEqual ('ge')."""
    return _lineitem(spark, sf_dir).filter(F.col("l_quantity") >= 49).select(*_PROJ)


@query(
    "pred_in",
    oracle=(
        f"SELECT {_PROJ_SQL} FROM lineitem "
        "WHERE l_returnflag IN ('A', 'R') AND l_linenumber IN (1, 7)"
    ),
    tags=("predicate", "pushdown"),
)
def pred_in(spark, sf_dir):
    """In over string + int columns ('in_set_lookup',
    simple-predicates.h IN kernels / fle-encoding.h:8236-8313)."""
    return (
        _lineitem(spark, sf_dir)
        .filter(F.col("l_returnflag").isin("A", "R") & F.col("l_linenumber").isin(1, 7))
        .select(*_PROJ)
    )


@query(
    "pred_between",
    oracle=(
        f"SELECT {_PROJ_SQL} FROM lineitem "
        "WHERE l_shipdate BETWEEN TIMESTAMP '1999-06-01 00:00:00' "
        "AND TIMESTAMP '1999-06-10 00:00:00' AND l_linenumber = 1"
    ),
    tags=("predicate", "pushdown"),
)
def pred_between(spark, sf_dir):
    """BETWEEN arrives as ge AND le (README.md:7, SURVEY.md §2A note)."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            F.col("l_shipdate").between(
                F.lit("1999-06-01").cast("timestamp_ntz"),
                F.lit("1999-06-10").cast("timestamp_ntz"),
            )
            & (F.col("l_linenumber") == 1)
        )
        .select(*_PROJ)
    )


@query(
    "pred_and_or",
    oracle=(
        f"SELECT {_PROJ_SQL} FROM lineitem WHERE "
        "((l_quantity < 2 AND l_returnflag = 'A') "
        " OR (l_quantity > 49 AND l_returnflag = 'R'))"
    ),
    tags=("predicate", "pushdown", "compound"),
)
def pred_and_or(spark, sf_dir):
    """Nested AND/OR tree → pushed as Or(And(...), And(...))
    (simple-predicates.h:145-163 bitset combine)."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            ((F.col("l_quantity") < 2) & (F.col("l_returnflag") == "A"))
            | ((F.col("l_quantity") > 49) & (F.col("l_returnflag") == "R"))
        )
        .select(*_PROJ)
    )


@query(
    "pred_not",
    oracle=(
        f"SELECT {_PROJ_SQL} FROM lineitem "
        "WHERE NOT (l_returnflag = 'N') AND l_linenumber <> 1 AND l_quantity < 3"
    ),
    tags=("predicate", "compound"),
)
def pred_not(spark, sf_dir):
    """NOT / <> (compound-predicates.h:31 Not)."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            ~(F.col("l_returnflag") == "N")
            & (F.col("l_linenumber") != 1)
            & (F.col("l_quantity") < 3)
        )
        .select(*_PROJ)
    )


@query(
    "pred_kleene_null",
    oracle="""
SELECT l_orderkey, l_linenumber, d, q3
FROM (
  SELECT l_orderkey, l_linenumber,
         NULLIF(l_discount, 0.0) AS d,
         NULLIF(l_quantity, 3.0) AS q3
  FROM lineitem
) t
WHERE (d > 0.05 OR q3 < 2) AND NOT (q3 > 49) AND l_linenumber = 2
""",
    tags=("predicate", "null"),
)
def pred_kleene_null(spark, sf_dir):
    """Kleene 3-valued logic with NULL inputs (compound-predicates.cc:23-57):
    NULL OR true = true, NULL AND false = false, NOT NULL = NULL (filtered).
    Nulls are manufactured with NULLIF since fixtures are null-free."""
    l = _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("d"),
        F.nullif(F.col("l_quantity"), F.lit(3.0)).alias("q3"),
    )
    return l.filter(
        ((F.col("d") > 0.05) | (F.col("q3") < 2))
        & ~(F.col("q3") > 49)
        & (F.col("l_linenumber") == 2)
    )


@query(
    "pred_is_null",
    oracle="""
SELECT l_linenumber,
       COUNT(*) AS n,
       -- BIGINT casts: DuckDB SUM over integers yields HUGEINT → pandas
       -- float64 ('415.0' vs Spark's '415'), breaking the value hash
       CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null
FROM lineitem GROUP BY l_linenumber
""",
    tags=("predicate", "null"),
)
def pred_is_null(spark, sf_dir):
    """IsNull/IsNotNull semantics (def-level NULL handling,
    hdfs-parquet-scanner.cc:997-1002)."""
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        _lineitem(spark, sf_dir)
        .groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(d.isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(d.isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        )
    )


@query(
    "pred_residual",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity * (1 - l_discount) > 47.5 AND l_linenumber >= 5
""",
    tags=("predicate", "residual"),
)
def pred_residual(spark, sf_dir):
    """Residual (non-pushable) conjunct: arithmetic over two columns can't
    become a SimplePredicate (col-vs-col rejected, scalar-fn-call.cc:741) —
    evaluated post-scan by codegen'd Filter, exactly like the reference's
    EvalConjuncts row loop (hdfs-parquet-scanner.cc:1183-1222).  The
    l_linenumber conjunct IS pushed: Spark splits the conjunct list rather
    than the reference's all-or-nothing bail."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            (F.col("l_quantity") * (1 - F.col("l_discount")) > 47.5)
            & (F.col("l_linenumber") >= 5)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@query(
    "pred_string_cmp",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
FROM lineitem
WHERE l_returnflag < 'N' AND l_linestatus >= 'O' AND l_linenumber = 4
""",
    tags=("predicate", "string"),
)
def pred_string_cmp(spark, sf_dir):
    """Binary string range comparison (string-value.inline.h:39-62 SSE4.2
    StringCompare) — pushed as string LessThan/GreaterThanOrEqual."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            (F.col("l_returnflag") < "N")
            & (F.col("l_linestatus") >= "O")
            & (F.col("l_linenumber") == 4)
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    )


@query(
    "pred_like",
    oracle="""
SELECT p_partkey, p_name, p_type FROM part
WHERE p_type LIKE 'PRO%' AND p_name LIKE '%bolt%'
""",
    tags=("predicate", "string"),
)
def pred_like(spark, sf_dir):
    """LIKE prefix (pushed as StringStartsWith) + infix (contains)."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PRO%") & F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "pred_cast_coercion",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity = 25.0 AND l_linenumber = CAST('6' AS INTEGER)
""",
    tags=("predicate", "cast"),
)
def pred_cast_coercion(spark, sf_dir):
    """Literal↔column coercion: int literal vs double column, string literal
    cast to int (the reference coerces literals at predicate-build time,
    scalar-fn-call.cc:784-929; Catalyst's UnwrapCastInBinaryComparison keeps
    such predicates pushable)."""
    return (
        _lineitem(spark, sf_dir)
        .filter(
            (F.col("l_quantity") == 25)
            & (F.col("l_linenumber") == F.lit("6").cast("int"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


_LIKE_ADVANCED_ORACLE = """
SELECT p_partkey, p_name,
       p_name ILIKE '%CoLd%' AS cold_ci,
       p_name LIKE '%cold%' AS cold_cs,
       p_name NOT LIKE '%bolt%' AS not_bolt,
       (p_name || '_x') LIKE '%!_x' ESCAPE '!' AS esc_literal_underscore,
       p_name LIKE '_____________%' AS at_least_13_chars
FROM part WHERE p_partkey <= 400
"""


@query(
    "pred_like_advanced",
    oracle=_LIKE_ADVANCED_ORACLE,
    tags=("predicate", "like"),
)
def pred_like_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the LIKE family beyond `pred_like`'s prefix/suffix/
    contains: case-INSENSITIVE ILIKE vs case-sensitive LIKE on the same
    needle (pinning that they genuinely differ), NOT LIKE, LIKE ...
    ESCAPE (a literal '_' matched through an explicit escape character —
    without it '_' is a wildcard and everything matches), and a
    wildcard-arity pattern (13 consecutive '_' = length >= 13).  Every
    verdict is emitted as a boolean column so the hash pins each
    matcher's semantics row-by-row.  All five run as codegen'd
    LIKE/RLIKE kernels in one scan projection — zero shuffles, and the
    non-prefix patterns intentionally DON'T push down (residual-eval
    territory, reference simple-predicates.h vs residual split)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        "p_name",
        F.col("p_name").ilike("%CoLd%").alias("cold_ci"),
        F.col("p_name").like("%cold%").alias("cold_cs"),
        (~F.col("p_name").like("%bolt%")).alias("not_bolt"),
        F.expr("(p_name || '_x') LIKE '%!_x' ESCAPE '!'").alias(
            "esc_literal_underscore"
        ),
        F.col("p_name").like("_____________%").alias("at_least_13_chars"),
    )
