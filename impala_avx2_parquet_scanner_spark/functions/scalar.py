"""Scalar function surface — the reference's expression/UDF framework
(expr.h:118-383, scalar-fn-call.cc:41-973) maps onto Spark's builtin
function registry + Catalyst codegen.  The friend-class list at
expr.h:242-255 enumerates the families (Case, In, Math, String, Timestamp,
Decimal, Conditional, Utility); each family gets a projection query here.

Functions chosen are deterministic and bit-identical across Spark/DuckDB
(no transcendentals whose libm implementations may differ by an ulp; no
double→int casts, whose rounding direction differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       TRIM(CONCAT('  ', p_type, ' ')) AS type_trim,
       LPAD(p_brand, 12, '*') AS brand_lpad,
       RPAD(p_type, 10, '.') AS type_rpad,
       REPLACE(p_name, ' ', '_') AS name_snake,
       REVERSE(p_brand) AS brand_rev
FROM part WHERE p_partkey <= 300
""",
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringFunctions family (expr.h:245): substring/trim/pad mirror
    StringValue::Substring/Trim/PadWithSpaces (string-value.inline.h:64-118)."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
            F.lpad("p_brand", 12, "*").alias("brand_lpad"),
            F.rpad("p_type", 10, ".").alias("type_rpad"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.reverse("p_brand").alias("brand_rev"),
        )
    )


@query(
    "fn_math",
    oracle="""
SELECT c_custkey,
       ABS(c_acctbal) AS bal_abs,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS bal_round1,
       c_custkey % 7 AS key_mod,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 2 + 10 AS DOUBLE) AS bal_affine,
       GREATEST(c_acctbal, 0.0) AS bal_pos,
       LEAST(c_acctbal, 0.0) AS bal_neg,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign
FROM customer WHERE c_custkey <= 400
""",
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MathFunctions family (expr.h:244; `round` special-cased at
    scalar-fn-call.cc:187-193 — rounding here is done on exact decimals so
    both engines agree on half-way cases)."""
    bal = F.col("c_acctbal")
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select(
            "c_custkey",
            F.abs(bal).alias("bal_abs"),
            F.floor(bal).alias("bal_floor"),
            F.ceil(bal).alias("bal_ceil"),
            F.round(bal.cast("decimal(12,2)"), 1).cast("double").alias("bal_round1"),
            (F.col("c_custkey") % 7).alias("key_mod"),
            # affine arithmetic runs in exact decimal; the result is
            # re-widened to double because Spark DECIMAL stringifies with
            # trailing zeros in the driver's pandas canon
            (bal.cast("decimal(12,2)") * 2 + 10).cast("double").alias("bal_affine"),
            F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
            F.least(bal, F.lit(0.0)).alias("bal_neg"),
            F.signum(bal).alias("bal_sign"),
        )
    )


@query(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
       CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
       CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(o_orderdate AS DATE) AS order_date_d
FROM orders WHERE o_orderkey <= 3000
""",
    tags=("function", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimestampFunctions family (expr.h:246; DateAddSub
    scalar-fn-call.cc:386-388): extraction, truncation, interval add."""
    d = F.col("o_orderdate")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.year(d).cast("int").alias("order_year"),
            F.month(d).cast("int").alias("order_month"),
            F.dayofmonth(d).cast("int").alias("order_day"),
            F.quarter(d).cast("int").alias("order_quarter"),
            F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
            (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
            d.cast("date").alias("order_date_d"),
        )
    )


@query(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS bal_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
       CASE WHEN c_nationkey % 2 = 0 THEN c_name END AS even_nation_name,
       IF(c_acctbal >= 0, 1, 0) AS is_solvent
FROM customer WHERE c_custkey <= 400
""",
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConditionalFunctions + CaseExpr families (expr.h:242,247):
    CASE/COALESCE/NULLIF/IF."""
    bal = F.col("c_acctbal")
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select(
            "c_custkey",
            F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich").alias("bal_band"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "segment_or_other"
            ),
            F.when(F.col("c_nationkey") % 2 == 0, F.col("c_name")).alias("even_nation_name"),
            F.when(bal >= 0, 1).otherwise(0).alias("is_solvent"),
        )
    )


@query(
    "fn_regex",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CASE WHEN regexp_matches(p_name, '^(cold|hot)') THEN 1 ELSE 0 END AS temp_prefixed,
       CAST(LEN(regexp_extract_all(p_type, '[A-Z]')) AS INTEGER) AS n_upper
FROM part WHERE p_partkey <= 300
""",
    tags=("function", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: extract / replace-all / match-test / count.
    (Both engines use RE2-compatible syntax for this subset.)"""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
            F.when(F.col("p_name").rlike("^(cold|hot)"), 1).otherwise(0).alias(
                "temp_prefixed"
            ),
            F.regexp_count("p_type", F.lit("[A-Z]")).cast("int").alias("n_upper"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
       CAST(LEN(list(l_linenumber)) AS BIGINT) AS n_lines
FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_orderkey
""",
    tags=("aggregate", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect + deterministic sort (collect_list order
    is partition-dependent, so the sort is what makes the result
    reproducible at any parallelism).  The sorted array is emitted joined
    to a CSV string: semantics are unchanged, but the flat string survives
    the driver's pandas-based canonicalization (ndarray cells are
    unhashable there)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 300)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("line_numbers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "fn_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(o_custkey AS DOUBLE) AS cust_dbl,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor_int,
       CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS price_dec,
       CAST(o_orderdate AS VARCHAR) AS date_str
FROM orders WHERE o_orderkey <= 2000
""",
    tags=("function", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CastExpr family (expr.h:242; cast-wrapper handling
    scalar-fn-call.cc:736-739).  double→int goes through FLOOR because raw
    CAST rounds in DuckDB but truncates in Spark — the explicit form is
    the portable one.  The double→decimal(14,2) cast is exercised but the
    column is surfaced back as DOUBLE: Spark stringifies DECIMAL with
    trailing zeros ('205941.60') while DuckDB-through-pandas yields the
    float form ('205941.6'), so only the re-widened double is comparable."""
    k = F.col("o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .filter(k <= 2000)
        .select(
            "o_orderkey",
            k.cast("string").alias("key_str"),
            k.cast("string").cast("bigint").alias("key_roundtrip"),
            F.col("o_custkey").cast("double").alias("cust_dbl"),
            F.floor("o_totalprice").cast("bigint").alias("price_floor_int"),
            F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("price_dec"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("date_str"),
        )
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT l_orderkey,
       l_orderkey & l_partkey AS b_and,
       l_orderkey | l_partkey AS b_or,
       xor(l_orderkey, l_partkey) AS b_xor,
       l_partkey << 3 AS b_shl,
       l_orderkey >> 2 AS b_shr,
       CAST(bit_count(l_orderkey) AS INT) AS b_popcount
FROM lineitem
WHERE l_linenumber = 1
""",
    tags=("scalar", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family — the query-visible face of the reference's
    bit manipulation layer (bit-util.h:28-232: popcount, shifts, masks
    backing the FLE bit-plane kernels).  All JVM-side integer ops inside
    whole-stage codegen; DuckDB's BIGINT semantics match exactly."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    k, p = F.col("l_orderkey"), F.col("l_partkey")
    return l.select(
        "l_orderkey",
        k.bitwiseAND(p).alias("b_and"),
        k.bitwiseOR(p).alias("b_or"),
        k.bitwiseXOR(p).alias("b_xor"),
        F.shiftleft(p, 3).alias("b_shl"),
        F.shiftright(k, 2).alias("b_shr"),
        F.bit_count(k).alias("b_popcount"),
    )


@query(
    "fn_timezone",
    oracle="""
SELECT o_orderkey,
       CAST(timezone('America/New_York', CAST(o_orderdate AS TIMESTAMPTZ)) AS TIMESTAMP)
         AS local_ny,
       CAST(timezone('Europe/Paris', CAST(o_orderdate AS TIMESTAMPTZ)) AS TIMESTAMP)
         AS local_paris,
       CAST(timezone('Asia/Tokyo', o_orderdate) AS TIMESTAMP) AS utc_from_tokyo
FROM orders WHERE o_orderkey <= 2000
""",
    tags=("function", "datetime", "timezone"),
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_utc_timestamp / to_utc_timestamp (reference
    scalar-fn-call.cc:386-388: the Impala UTC-conversion builtins).  The
    fixture dates span 1995-2001, so both sides of every DST transition
    in America/New_York and Europe/Paris are exercised; DuckDB's ICU
    timezone() is the oracle twin (both engines read the IANA tzdb).
    Sessions run in UTC, so TIMESTAMPTZ casts are instant-preserving."""
    d = F.col("o_orderdate")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.from_utc_timestamp(d, "America/New_York")
            .cast("timestamp_ntz")
            .alias("local_ny"),
            F.from_utc_timestamp(d, "Europe/Paris")
            .cast("timestamp_ntz")
            .alias("local_paris"),
            F.to_utc_timestamp(d, "Asia/Tokyo")
            .cast("timestamp_ntz")
            .alias("utc_from_tokyo"),
        )
    )


@query(
    "fn_hash_utils",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS md5_hex,
       sha256(c_name) AS sha256_hex,
       CAST(('0x' || substr(md5(c_name), 1, 15)) AS BIGINT) AS h60
FROM customer WHERE c_custkey <= 500
""",
    tags=("function", "hash"),
)
def fn_hash_utils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic/uniform hash surface (reference hash-util.h:44-95:
    CRC32c + Murmur2-64 for dictionary and bitmap-filter probes).  The
    engine-portable twins are md5/sha2 plus the md5-derived 60-bit
    integer hash (`h64`) every pipeline operator keys on; Spark's native
    xxhash64/hash are faster but engine-specific, so they stay out of
    oracle-checked paths (documented in pipeline/dedup.py)."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import h64

    n = F.col("c_name")
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.md5(n).alias("md5_hex"),
            F.sha2(n, 256).alias("sha256_hex"),
            h64(n).alias("h60"),
        )
    )


@query(
    "fn_decimal",
    oracle="""
SELECT o_orderkey,
       CAST(p + CAST(123.45 AS DECIMAL(14,2)) AS DOUBLE)      AS dec_add,
       CAST(p - CAST(99.99 AS DECIMAL(14,2)) AS DOUBLE)       AS dec_sub,
       CAST(p * CAST(0.08 AS DECIMAL(4,2)) AS DOUBLE)         AS dec_mul,
       -- DuckDB decimal '/' degrades to DOUBLE; re-quantizing the quotient
       -- at Spark's result scale (6) recovers the exact shifted value
       CAST(CAST(p / CAST(100 AS DECIMAL(3,0)) AS DECIMAL(24,6)) AS DOUBLE) AS dec_div_shift,
       CAST(p % CAST(50 AS DECIMAL(14,2)) AS DOUBLE)          AS dec_mod,
       CAST(ROUND(p, 1) AS DOUBLE)                            AS dec_round1,
       CAST(ROUND(p, -2) AS DOUBLE)                           AS dec_round_neg2,
       CAST(CEIL(p) AS DOUBLE)                                AS dec_ceil,
       CAST(FLOOR(p) AS DOUBLE)                               AS dec_floor,
       CAST(ABS(p - CAST(100000 AS DECIMAL(14,2))) AS DOUBLE) AS dec_abs_diff
FROM (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(14,2)) AS p
  FROM orders WHERE o_orderkey <= 2000
) t
""",
    tags=("function", "decimal"),
)
def fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalOperators family (expr.h:242; literal re-scaling contract
    scalar-fn-call.cc:894-929): fixed-point +,-,*,%,ROUND at positive and
    negative scale, CEIL/FLOOR/ABS — all evaluated in exact DECIMAL and
    only the final value widened to DOUBLE (Decimal trailing-zero
    stringification diverges from DuckDB-through-pandas floats, so the
    re-widened double is the canon-comparable form).  Division is by a
    power of ten — a pure scale shift, exact in both engines; arbitrary
    divisors are excluded because Spark and DuckDB pick different result
    scales for repeating quotients (documented deviation).  Every op is
    JVM-side inside whole-stage codegen."""
    p = F.col("o_totalprice").cast("decimal(14,2)")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (p + F.lit(123.45).cast("decimal(14,2)")).cast("double").alias("dec_add"),
            (p - F.lit(99.99).cast("decimal(14,2)")).cast("double").alias("dec_sub"),
            (p * F.lit(0.08).cast("decimal(4,2)")).cast("double").alias("dec_mul"),
            (p / F.lit(100).cast("decimal(3,0)")).cast("double").alias("dec_div_shift"),
            (p % F.lit(50).cast("decimal(14,2)")).cast("double").alias("dec_mod"),
            F.round(p, 1).cast("double").alias("dec_round1"),
            F.round(p, -2).cast("double").alias("dec_round_neg2"),
            F.ceil(p).cast("double").alias("dec_ceil"),
            F.floor(p).cast("double").alias("dec_floor"),
            F.abs(p - F.lit(100000).cast("decimal(14,2)")).cast("double").alias("dec_abs_diff"),
        )
    )


@query(
    "fn_try",
    oracle="""
SELECT o_orderkey,
       o_totalprice / CAST(o_orderkey % 3 AS DOUBLE)        AS div_maybe0,
       o_orderkey % NULLIF(o_custkey % 5, -1)               AS mod_maybe0,
       TRY_CAST(o_orderkey AS TINYINT)                      AS tiny_ovf,
       TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
       TRY_CAST(o_orderstatus AS BIGINT)                    AS status_num,
       TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                     THEN '2024-03-01' ELSE 'not-a-date' END AS DATE) AS maybe_date
FROM orders WHERE o_orderkey <= 2000
""",
    tags=("function", "cast", "null"),
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive expression semantics — Impala evaluates bad casts and
    zero denominators to NULL instead of raising (the reference's
    expression framework returns null Get*Val results, expr.h:118-383).
    Spark's non-ANSI `/` and `%` plus the try_* family are the exact
    Spark-first twins; DuckDB agrees (x/0 → NULL, TRY_CAST → NULL), so
    every column is hash-comparable.  Data-dependent zeros/garbage make
    each column a mix of real values and NULLs."""
    k = F.col("o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .filter(k <= 2000)
        .select(
            "o_orderkey",
            F.try_divide(F.col("o_totalprice"), (k % 3).cast("double")).alias("div_maybe0"),
            F.try_mod(k, F.col("o_custkey") % 5).alias("mod_maybe0"),
            k.try_cast("tinyint").alias("tiny_ovf"),
            F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias("prio_num"),
            F.col("o_orderstatus").try_cast("bigint").alias("status_num"),
            F.when(k % 2 == 0, F.lit("2024-03-01"))
            .otherwise(F.lit("not-a-date"))
            .try_cast("date")
            .alias("maybe_date"),
        )
    )


@query(
    "fn_datearith",
    oracle="""
SELECT o_orderkey,
  CAST(datediff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00') AS INTEGER) AS days_to_99,
  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(isodow(o_orderdate) % 7 + 1 AS INTEGER) AS dow_sun1,
  CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
  strftime(o_orderdate, '%Y-%m') AS ym
FROM orders WHERE o_orderkey <= 3000
""",
    tags=("function", "datetime"),
)
def fn_datearith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date ARITHMETIC companion to `fn_datetime` (TimestampFunctions
    expr.h:246; DateAddSub scalar-fn-call.cc:386-388): day difference,
    month addition (both engines clamp Jan 31 + 1 month to Feb 28 —
    verified), last-day-of-month, day-of-week (Spark's 1=Sunday numbering
    replayed in DuckDB as isodow % 7 + 1), ISO week-of-year, and
    pattern formatting (subset where Java and strftime patterns agree)."""
    d = F.col("o_orderdate")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date"))
            .cast("int").alias("days_to_99"),
            (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
            F.last_day(d.cast("date")).alias("month_end"),
            F.dayofweek(d).cast("int").alias("dow_sun1"),
            F.weekofyear(d).cast("int").alias("iso_week"),
            F.date_format(d, "yyyy-MM").alias("ym"),
        )
    )


_IEEE_ORACLE = """
WITH v AS (
  SELECT CASE event_type
           WHEN 'view' THEN 'NaN'::DOUBLE
           WHEN 'click' THEN 'Infinity'::DOUBLE
           WHEN 'purchase' THEN '-Infinity'::DOUBLE
           ELSE value END AS x
  FROM events
),
cls AS (
  SELECT CASE WHEN isnan(x) THEN 'nan'
              WHEN x = 'Infinity'::DOUBLE THEN 'posinf'
              WHEN x = '-Infinity'::DOUBLE THEN 'neginf'
              ELSE 'finite' END AS cls, x
  FROM v
)
SELECT cls,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT x) AS BIGINT) AS n_distinct,
       isnan(MAX(x)) AS max_is_nan
FROM cls GROUP BY cls
"""


@query("fn_ieee_specials", oracle=_IEEE_ORACLE, tags=("function", "double", "edge"))
def fn_ieee_specials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-754 special-value semantics pinned across engines: NaN
    collapses to ONE group-by key and ONE distinct value (both engines
    normalize NaN for grouping), +/-Infinity compare and classify
    consistently, and NaN sorts greatest (max_is_nan proves MAX prefers
    NaN over +Infinity wherever a NaN exists).  At 100 TB a divide-by-
    zero upstream WILL reach the aggregate layer; an engine whose
    grouping semantics differ from the oracle's would silently split or
    merge those groups.  Specials are derived deterministically from
    event_type; outputs are counts and booleans only (raw NaN/Inf never
    enters the value hash)."""
    x = (
        F.when(F.col("event_type") == "view", F.lit(float("nan")))
        .when(F.col("event_type") == "click", F.lit(float("inf")))
        .when(F.col("event_type") == "purchase", F.lit(float("-inf")))
        .otherwise(F.col("value"))
    )
    cls = (
        F.when(F.isnan(F.col("x")), F.lit("nan"))
        .when(F.col("x") == F.lit(float("inf")), F.lit("posinf"))
        .when(F.col("x") == F.lit(float("-inf")), F.lit("neginf"))
        .otherwise(F.lit("finite"))
    )
    return (
        table(spark, sf_dir, "events")
        .select(x.alias("x"))
        .select(cls.alias("cls"), "x")
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("x").alias("n_distinct"),
            F.isnan(F.max("x")).alias("max_is_nan"),
        )
    )


_UNICODE_ORDER_ORACLE = """
WITH toks AS (
  SELECT DISTINCT
         CASE lang
           WHEN 'zh' THEN '中文'
           WHEN 'de' THEN 'straße'
           WHEN 'fr' THEN 'café'
           WHEN 'es' THEN 'niño'
           ELSE 'Ascii'
         END || '·' || source AS tok
  FROM documents
)
SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) AS rk FROM toks
"""


@query(
    "fn_unicode_order",
    oracle=_UNICODE_ORDER_ORACLE,
    tags=("function", "string", "sort"),
)
def fn_unicode_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary UTF-8 string ordering pinned across engines: uppercase
    ASCII < lowercase < Latin-1 accents (2-byte) < CJK (3-byte) — both
    Spark (UTF8String byte compare) and DuckDB order by raw UTF-8
    bytes, NOT locale collation, and any engine swap that introduced
    ICU collation would silently reorder every string sort and
    string-keyed range boundary.  Multi-byte tokens are derived
    deterministically from the lang column; row_number materializes
    the global order into values (bounded domain: |langs| x |sources|
    rows)."""
    tok = F.concat(
        F.when(F.col("lang") == "zh", F.lit("中文"))
        .when(F.col("lang") == "de", F.lit("straße"))
        .when(F.col("lang") == "fr", F.lit("café"))
        .when(F.col("lang") == "es", F.lit("niño"))
        .otherwise(F.lit("Ascii")),
        F.lit("·"),
        F.col("source"),
    )
    from pyspark.sql import Window as W

    toks = (
        table(spark, sf_dir, "documents").select(tok.alias("tok")).distinct()
    )
    return toks.select(
        "tok", F.row_number().over(W.orderBy("tok")).alias("rk")
    )


_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/' || doc_id
           || '?ref=' || lang || '&page=' || (doc_id % 7) AS url
  FROM documents
)
SELECT doc_id, url,
       'https' AS protocol,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
       regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param
FROM u
"""


@query("fn_url_parse", oracle=_URL_ORACLE, tags=("function", "string", "url"))
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — `parse_url` (PROTOCOL / HOST / PATH /
    QUERY with a key), the log-analytics workhorse the reference's
    string-function surface implies (string-functions.h scope; Impala
    ships parse_url with the same part names).  URLs are synthesized
    deterministically from document metadata so the inputs cover every
    (source, lang) shape; the oracle replays each component with an
    anchored regexp — pinning that Spark's java.net-based parser and a
    plain regex agree on well-formed http(s) URLs (host stops at the
    first '/', path stops at '?', query params split on '&').  Pure
    row-local JVM expressions: scan -> project, zero shuffles at any
    scale."""
    u = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="),
            F.col("lang"),
            F.lit("&page="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )


_B64HEX_ORACLE = """
SELECT p_partkey,
       to_base64(CAST(p_name AS BLOB)) AS b64,
       hex(p_name) AS hx,
       CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR) = p_name
         AS b64_roundtrip,
       unhex(hex(p_name)) = CAST(p_name AS BLOB) AS hex_roundtrip
FROM part WHERE p_partkey <= 400
"""


@query(
    "fn_base64_hex",
    oracle=_B64HEX_ORACLE,
    tags=("function", "string", "encoding"),
)
def fn_base64_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-to-text encodings — base64 (RFC 4648 with padding) and hex
    — plus both decode round-trips, pinned value-for-value across
    engines: the encodings every export/ingest boundary leans on
    (opaque payload columns, URL-safe keys, checksum surfacing).  Spark
    and DuckDB must agree on alphabet, padding, and casing for the
    emitted strings to hash-match; the round-trip booleans additionally
    certify decode(encode(x)) == x byte-for-byte in EACH engine.  Pure
    row-local JVM expressions, zero shuffles.  Reference parity: string
    function scope (string-functions.h; Impala ships base64encode/
    decode + hex)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.hex(F.col("p_name")).alias("hx"),
        (
            F.unbase64(F.base64(F.col("p_name").cast("binary"))).cast("string")
            == F.col("p_name")
        ).alias("b64_roundtrip"),
        (
            F.unhex(F.hex(F.col("p_name"))) == F.col("p_name").cast("binary")
        ).alias("hex_roundtrip"),
    )


_CHAR_SEMANTICS_ORACLE = """
SELECT p_brand,
       rpad(p_brand, 12, ' ') AS brand_char12,
       length(rpad(p_brand, 12, ' ')) AS char_len,
       rtrim(rpad(p_brand, 12, ' ')) = p_brand AS unpad_roundtrip,
       count(*) AS n_parts,
       CAST(SUM(CASE WHEN length(p_type) > 10 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_vc10_overflow,
       min(substring(p_type, 1, 10)) AS vc10_min_trunc,
       CAST(SUM(CASE WHEN rpad(p_type, 30, ' ') = rpad(p_type || '  ', 30, ' ')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_padded_eq
FROM part
GROUP BY p_brand
"""


@query(
    "fn_char_semantics",
    oracle=_CHAR_SEMANTICS_ORACLE,
    tags=("function", "string", "char"),
)
def fn_char_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAR(N)/VARCHAR(N) semantics, expressed conf-independently so the
    contract is pinned on ANY session (the driver's is vanilla):
    CHAR(N) space-pads on read (hdfs-parquet-scanner.cc:579-596;
    StringValue::PadWithSpaces, string-value.inline.h:105-118) —
    `rpad(x, N, ' ')` — and comparison is trailing-space-insensitive
    once both sides sit at the common width (`n_padded_eq` proves a
    value and its trailing-space variant compare equal after padding,
    per-row, in both engines).  `unpad_roundtrip` pins rtrim(pad(x)) ==
    x (the read-then-compare identity).  VARCHAR(N) overflow is the
    engine's DOCUMENTED DEVIATION: the reference truncates silently on
    scan; Spark under ANSI raises instead, so this engine surfaces
    truncation explicitly as substring(x, 1, N) — `vc10_min_trunc`
    value-pins that explicit form and `n_vc10_overflow` counts the rows
    where it applies (tests/test_type_edges.py::
    test_char_varchar_semantics holds the raise-vs-truncate pin)."""
    t = F.col("p_type")
    b = F.col("p_brand")
    return (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.length(t) > 10, 1).otherwise(0)
            ).alias("n_vc10_overflow"),
            F.min(F.substring(t, 1, 10)).alias("vc10_min_trunc"),
            F.sum(
                F.when(
                    F.rpad(t, 30, " ")
                    == F.rpad(F.concat(t, F.lit("  ")), 30, " "),
                    1,
                ).otherwise(0)
            ).alias("n_padded_eq"),
        )
        .select(
            "p_brand",
            F.rpad(b, 12, " ").alias("brand_char12"),
            F.length(F.rpad(b, 12, " ")).alias("char_len"),
            (F.rtrim(F.rpad(b, 12, " ")) == b).alias("unpad_roundtrip"),
            "n_parts",
            "n_vc10_overflow",
            "vc10_min_trunc",
            "n_padded_eq",
        )
    )
