"""Aggregation surface (SURVEY.md §2B 'Aggregation').

The reference's scanner feeds Impala's AggFnEvaluator (expr.h:241); here the
whole aggregation surface is Catalyst's native hash aggregate with partial
(map-side) combine — every aggregate below is associative, so a 1000-node
partial/final split produces the same exact values as a single thread
(decimal-exact arithmetic, see exprs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.cache import tie_unpersist
from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.exprs import dec_price, sum_dbl
from impala_avx2_parquet_scanner_spark.registry import query


@query(
    "agg_global",
    oracle="""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders
""",
    tags=("aggregate",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate with exact sum + distinct count."""
    return table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n"),
        sum_dbl(dec_price("o_totalprice"), "total"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@query(
    "agg_distinct",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS distinct_custs,
       COUNT(DISTINCT o_orderpriority) AS distinct_pris,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates per group (expand + two-phase agg in
    Catalyst — the skew-safe plan at scale)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_custs"),
            F.countDistinct("o_orderpriority").alias("distinct_pris"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() disambiguation."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            sum_dbl(F.col("l_quantity").cast("decimal(12,2)"), "sum_qty"),
        )
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("aggregate", "rollup"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL API — identical Catalyst plan to the
    DataFrame rollup/cube path)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
""",
    tags=("aggregate", "having"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_dbl(dec_price("o_totalprice"), "spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "agg_approx",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS approx_distinct_ok,
       TRUE AS approx_median_ok,
       TRUE AS approx_p99_ok
FROM lineitem GROUP BY l_returnflag
""",
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the sketches that replace exact
    distinct/quantile at 100 TB: HyperLogLog++ (approx_count_distinct,
    mergeable across partitions) and GK quantile sketches
    (percentile_approx).

    The sketch estimates themselves are engine-specific, so what the
    oracle pins is the *contract*: the exact distinct count (computed by
    both engines) plus booleans asserting each Spark sketch lands within
    tolerance of the exact value.  The oracle emits literal TRUE —
    Spark's sketches are deterministic for a fixed input, so a
    within-tolerance regression flips the hash.  Tolerances: HLL at
    rsd=0.01 checked to 5%; GK quantiles (default accuracy) checked to 5%
    relative against exact percentile_cont.

    Plan note (measured 20x on this exact query): putting the exact
    COUNT(DISTINCT) in the SAME .agg as the sketch functions makes
    Catalyst rewrite the mixed distinct/non-distinct aggregation through
    Expand, and the TypedImperative sketch buffers (HLL++, GK, exact
    percentile) then fall off ObjectHashAggregate onto SortAggregate over
    the expanded (duplicated) rows — 14 s where the pieces run in 0.4 s.
    The fix is structural and scale-relevant: compute the distinct count
    and the sketches as two independent single-pass aggregations over the
    same scan and join the 3-row results (the join side is grouped-key
    sized, always broadcastable)."""
    l = table(spark, sf_dir, "lineitem")
    exact = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_approx_median"),
        F.percentile_approx("l_extendedprice", 0.99).alias("_approx_p99"),
        F.percentile("l_extendedprice", 0.5).alias("_exact_median"),
        F.percentile("l_extendedprice", 0.99).alias("_exact_p99"),
    )
    agg = exact.join(F.broadcast(sketches), "l_returnflag")

    def within(approx: str, exact: str, tol: float):
        return (
            F.abs(F.col(approx) - F.col(exact)) <= F.abs(F.col(exact)) * tol
        )

    return agg.select(
        "l_returnflag",
        "exact_orders",
        within("_approx_orders", "exact_orders", 0.05).alias("approx_distinct_ok"),
        within("_approx_median", "_exact_median", 0.05).alias("approx_median_ok"),
        within("_approx_p99", "_exact_p99", 0.05).alias("approx_p99_ok"),
    )


@query(
    "agg_case_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
""",
    tags=("aggregate", "pivot"),
)
def agg_case_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (DataFrame .pivot() emits
    the same plan; spelled with when/otherwise for oracle parity)."""
    qty = F.col("l_quantity").cast("decimal(12,2)")
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            sum_dbl(F.when(F.col("l_linestatus") == "O", qty).otherwise(zero), "qty_open"),
            sum_dbl(F.when(F.col("l_linestatus") == "F", qty).otherwise(zero), "qty_filled"),
        )
    )


@query(
    "agg_percentile_stringagg",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("aggregate", "percentile"),
)
def agg_percentile_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + ordered distinct string aggregation.

    Both engines use linear interpolation for continuous quantiles, and
    the ordered-collect makes the string agg deterministic at any
    parallelism (collect_set order is not, so sort before joining).

    Scale note: exact percentile requires a full sort of each group's
    values — at 100 TB prefer `approx_percentile` (t-digest, map-side
    combinable; see `agg_approx`) unless exactness is contractual."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
    )


_STATS_ORACLE = """
SELECT l_returnflag, n,
       ROUND(sx / n, 9) AS mean_qty,
       ROUND((sxx - sx * sx / n) / (n - 1), 9) AS var_qty,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 9) AS std_qty,
       ROUND((sxy - sx * sy / n)
         / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 9) AS corr_qty_price
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
) m
"""


@query("agg_stats_exact", oracle=_STATS_ORACLE, tags=("aggregate", "statistics"))
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / variance / stddev / correlation from exact-decimal moment
    sums (n, Σx, Σy, Σx², Σy², Σxy), with all floating math deferred to
    one final double expression per statistic.

    Native stddev/corr aggregates accumulate doubles in scan order and so
    differ bit-wise between engines and between cluster sizes; moment
    sums in exact DECIMAL are associative — the same deterministic-
    parallelism discipline as exprs.py, extended to second moments.

    The derived statistics are rounded to 9 dp on both sides: second
    moments like Σy² exceed 2^53 in scaled-integer form, and DuckDB's
    decimal→double conversion double-rounds (int128→double, then ÷10^s)
    where Spark's BigDecimal cast rounds once — a 1-ulp input divergence
    that 9-dp rounding absorbs (same discipline as text_unigram_logprob)."""
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 9).alias("mean_qty"),
        F.round((sxx - sx * sx / n) / (n - F.lit(1)), 9).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))), 9).alias("std_qty"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            9,
        ).alias("corr_qty_price"),
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(l_extendedprice / 6000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY 1
"""


@query("agg_histogram", oracle=_HISTOGRAM_ORACLE, tags=("aggregate", "histogram"))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (6000-wide price buckets) — the profiling
    primitive behind optimizer statistics and data-quality dashboards.
    Bucketing is a pure column expression (FLOOR of a division — identical
    in both engines, unlike width_bucket whose edge semantics vary), so
    the whole histogram is one map-side-combinable keyed aggregation:
    at 100 TB the shuffle carries one row per (partition, bucket)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(
            F.floor(F.col("l_extendedprice") / F.lit(6000.0)).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_dbl(dec_price("l_extendedprice"), "sum_price"),
        )
    )


_EQUIDEPTH_ORACLE = """
WITH bs AS (
  SELECT [quantile_cont(l_extendedprice, 0.1), quantile_cont(l_extendedprice, 0.2),
          quantile_cont(l_extendedprice, 0.3), quantile_cont(l_extendedprice, 0.4),
          quantile_cont(l_extendedprice, 0.5), quantile_cont(l_extendedprice, 0.6),
          quantile_cont(l_extendedprice, 0.7), quantile_cont(l_extendedprice, 0.8),
          quantile_cont(l_extendedprice, 0.9)] AS b
  FROM lineitem
)
SELECT CAST(LEN(list_filter(b, x -> l_extendedprice > x)) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM lineitem CROSS JOIN bs
GROUP BY 1
"""


@query("agg_histogram_equidepth", oracle=_EQUIDEPTH_ORACLE, tags=("aggregate", "histogram"))
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram: exact interpolated percentile
    boundaries, then each row counts the boundaries strictly below it —
    the histogram shape CBOs actually store (equal mass per bucket
    resolves skew that equal-width buckets hide).

    Two passes over one column: the boundary aggregate collapses to a
    single broadcast row (9 doubles), and bucket assignment unrolls to 9
    codegen'd comparisons summed as integers (an `F.aggregate` lambda
    runs interpreted, outside whole-stage codegen) — no per-row join, no
    global sort.  Cost is dominated by the exact interpolated percentile
    (a full sort of the column, matching the oracle's quantile_cont
    bit-for-bit); at 100 TB swap it for percentile_approx and keep the
    identical downstream plan."""
    l = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    n_bounds = 9
    bounds = l.agg(
        F.percentile(price, [i / 10.0 for i in range(1, n_bounds + 1)]).alias("b")
    )
    terms = [
        F.when(price > F.col("b").getItem(i), 1).otherwise(0).cast("bigint")
        for i in range(n_bounds)
    ]
    bucket = sum(terms[1:], terms[0])
    return (
        l.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(price).alias("lo"),
            F.max(price).alias("hi"),
        )
    )


_PARTIAL_MERGE_ORACLE = """
WITH daily AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_partials,
       CAST(SUM(v) AS DOUBLE) AS sum_value
FROM daily
GROUP BY event_type
"""


@query("agg_partial_merge", oracle=_PARTIAL_MERGE_ORACLE, tags=("aggregate", "incremental"))
def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation of per-day partial aggregates into totals — the
    incremental-view-maintenance pattern: a day's backfill
    (overwrite_partitions) only recomputes that day's partial, and the
    rollup merges partials instead of rescanning history.

    Works because every aggregate here is decomposable (COUNT→SUM,
    exact-DECIMAL SUM→SUM), the same property Spark's own partial/final
    aggregation exploits — so the merged totals are bit-identical to a
    direct aggregation over raw events, which is exactly what the DuckDB
    oracle computes structurally here."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    return daily.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_partials"),
        F.sum("v").cast("double").alias("sum_value"),
    )


_KMV_ORACLE = """
WITH h AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
      AS h
  FROM orders
),
topk AS (SELECT h FROM h ORDER BY h LIMIT 64)
SELECT COUNT(*) AS k_used,
       MAX(h) AS kth_hash,
       CAST(ROUND(((COUNT(*) - 1) * 1152921504606846976.0) / MAX(h), 0)
            AS BIGINT) AS est_distinct
FROM topk
"""


@query("agg_kmv_distinct", oracle=_KMV_ORACLE, tags=("aggregate", "sketch"))
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch: keep the k=64 smallest
    values of a uniform 60-bit hash of the key; estimate NDV as
    (k-1) / (kth_min / 2^60).  Unlike `agg_approx`'s HLL (engine-specific
    registers), KMV is fully deterministic given the hash, so the DuckDB
    oracle replays the whole sketch including the estimate.

    At scale this is the mergeable-sketch pattern: the k smallest hashes
    of a union are a subset of the per-partition k smallest, so
    `orderBy(h).limit(k)` compiles to per-partition top-k + a k-row merge
    (TakeOrderedAndProject) — no full shuffle of the distinct hashes.
    Hashing reprises the reference's dict/bitmap-probe hashing role
    (hash-util.h:44-65) with an engine-portable MD5-derived h64."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import h64

    o = table(spark, sf_dir, "orders").select(
        h64(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    topk = o.orderBy("h").limit(64)
    return topk.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.round(
            ((F.col("k_used") - 1) * F.lit(1152921504606846976.0))
            / F.col("kth_hash"),
            0,
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


# --- Count-Min sketch -------------------------------------------------------
# Deterministic CMS (Cormode & Muthukrishnan): D hash rows × W buckets over
# the document token stream, probed for a fixed token set.  Like
# agg_kmv_distinct, the sketch uses the portable MD5-derived h64 so the
# oracle replays every hash, bucket, and MIN term-for-term.

_CMS_D = 4
_CMS_W = 1024
_CMS_PROBES = ("join", "hash", "scan", "filter", "merge")

_CMS_ORACLE = f"""
WITH tokens AS (
  SELECT unnest(list_filter(string_split(lower(regexp_replace(text,
           '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS token
  FROM documents
),
seeds AS (SELECT unnest(range({_CMS_D})) AS seed),
buckets AS (
  SELECT seed,
         CAST(('0x' || substr(md5(concat('cms', CAST(seed AS VARCHAR), ':', token)), 1, 15))
              AS BIGINT) % {_CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM tokens, seeds
  GROUP BY 1, 2
),
probes AS (SELECT unnest(['join','hash','scan','filter','merge']) AS token),
probe_buckets AS (
  SELECT p.token, s.seed,
         CAST(('0x' || substr(md5(concat('cms', CAST(s.seed AS VARCHAR), ':', p.token)), 1, 15))
              AS BIGINT) % {_CMS_W} AS bucket
  FROM probes p, seeds s
),
est AS (
  SELECT pb.token, MIN(b.cnt) AS cms_estimate
  FROM probe_buckets pb
  JOIN buckets b ON b.seed = pb.seed AND b.bucket = pb.bucket
  GROUP BY 1
),
exact AS (SELECT token, COUNT(*) AS exact_n FROM tokens GROUP BY 1)
SELECT e.token, e.cms_estimate, x.exact_n,
       e.cms_estimate >= x.exact_n AS admissible
FROM est e JOIN exact x ON x.token = e.token
"""


@query("agg_count_min", oracle=_CMS_ORACLE, tags=("aggregate", "sketch"))
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch, fully value-checked: build a D=4 × W=1024
    counter table over the corpus token stream, answer point queries for a
    fixed probe set as MIN over the D bucket counters, and emit the exact
    count + the CMS admissibility invariant (estimate >= truth) alongside.

    Scale: the sketch is ONE groupBy over (seed, bucket) — 4096 counters
    regardless of corpus size, the canonical mergeable-summary pattern for
    100 TB frequency estimation (map-side combine does almost all the
    work; the probe join touches D rows per queried token)."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import h64

    def bucket(tok, i: int):
        return F.pmod(h64(F.concat(F.lit(f"cms{i}:"), tok)), F.lit(_CMS_W))

    toks = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.regexp_replace("text", r"[^A-Za-z0-9]+", " ")), " "),
                    lambda x: x != F.lit(""),
                )
            ).alias("token")
        )
    )
    all_buckets = F.array(*[bucket(F.col("token"), i) for i in range(_CMS_D)])
    cms = (
        toks.select(F.posexplode(all_buckets).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _CMS_PROBES])).alias("token")
    )
    pb = probes.select("token", F.posexplode(all_buckets).alias("seed", "bucket"))
    est = (
        cms.join(F.broadcast(pb), ["seed", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    exact = (
        toks.filter(F.col("token").isin(*_CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return (
        est.join(exact, "token")
        .select(
            "token", "cms_estimate", "exact_n",
            (F.col("cms_estimate") >= F.col("exact_n")).alias("admissible"),
        )
    )


_KMV_MERGE_K = 32

_KMV_MERGE_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT source,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents
),
grp AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM h) t
  WHERE rn <= {_KMV_MERGE_K}
),
grp_est AS (
  SELECT source AS scope, COUNT(*) AS k_used, MAX(h) AS kth_hash
  FROM grp GROUP BY source
),
merged AS (
  SELECT h FROM (SELECT DISTINCT h FROM grp) u ORDER BY h LIMIT {_KMV_MERGE_K}
),
merged_est AS (
  SELECT '<all>' AS scope, COUNT(*) AS k_used, MAX(h) AS kth_hash FROM merged
),
unioned AS (SELECT * FROM grp_est UNION ALL SELECT * FROM merged_est)
SELECT scope, k_used, kth_hash,
       CAST(ROUND(((k_used - 1) * 1152921504606846976.0) / kth_hash, 0)
            AS BIGINT) AS est_distinct
FROM unioned
"""


@query("agg_kmv_merge", oracle=_KMV_MERGE_ORACLE, tags=("aggregate", "sketch"))
def agg_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch contract, demonstrated end-to-end: per-`source`
    KMV sketches over document ids, PLUS a corpus-wide estimate computed
    by MERGING the per-group sketches (union their hash sets, keep the k
    smallest) — never re-touching the raw data.  This is the property
    that makes sketches the scale path: 1000 executors each ship k
    hashes, and the merge is k×groups rows, bit-identical regardless of
    partitioning.  Fully replayed in the oracle including both estimate
    levels.

    Plan: one distinct over (source, h), a per-group top-k window (each
    group's rows stay in one partition — group count is small and
    bounded), then the merged row derives from the ≤ k×groups sketch
    rows only."""
    from pyspark.sql import Window as W

    from impala_avx2_parquet_scanner_spark.pipeline.dedup import h64

    d = (
        table(spark, sf_dir, "documents")
        .select("source", h64(F.col("doc_id").cast("string")).alias("h"))
        .distinct()
    )
    w = W.partitionBy("source").orderBy("h")
    grp = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_MERGE_K)
        .select("source", "h")
    )
    grp = grp.localCheckpoint(eager=True)  # sketch built once, used twice
    grp_est = grp.groupBy(F.col("source").alias("scope")).agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h").alias("kth_hash")
    )
    merged = (
        grp.select("h").distinct().orderBy("h").limit(_KMV_MERGE_K)
        .agg(F.count(F.lit(1)).alias("k_used"), F.max("h").alias("kth_hash"))
        .select(F.lit("<all>").alias("scope"), "k_used", "kth_hash")
    )
    est = F.round(
        ((F.col("k_used") - 1) * F.lit(1152921504606846976.0)) / F.col("kth_hash"),
        0,
    ).cast("bigint")
    return grp_est.unionByName(merged).select(
        "scope", "k_used", "kth_hash", est.alias("est_distinct")
    )


_OLS_ORACLE = """
SELECT p_brand, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9) AS intercept,
       ROUND(
         CASE WHEN syy - sy * sy / n = 0 THEN 1.0
              ELSE ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END,
         9) AS r2
FROM (
  SELECT p_brand,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(p_size AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(p_size AS DECIMAL(12,2)) * CAST(p_size AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(p_size AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM part GROUP BY p_brand
) m
"""


@query("agg_ols_regression", oracle=_OLS_ORACLE, tags=("aggregate", "statistics"))
def agg_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (price ~ size per brand): slope,
    intercept, and R² derived from the same exact-decimal moment sums as
    `agg_stats_exact` — the REGR_SLOPE/REGR_INTERCEPT/REGR_R2 family
    without order-dependent double accumulation.  One map-side-combinable
    shuffle; all floating math is a final per-group expression, 9-dp
    rounded on both sides (same double-rounding rationale as
    agg_stats_exact)."""
    x = F.col("p_size").cast("decimal(12,2)")
    y = F.col("p_retailprice").cast("decimal(12,2)")
    m = (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "p_brand",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round(
            F.when(syy - sy * sy / n == 0, F.lit(1.0)).otherwise(
                ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            ),
            9,
        ).alias("r2"),
    )


_GROUPING_ID_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query(
    "agg_grouping_id",
    oracle=_GROUPING_ID_ORACLE,
    tags=("aggregate", "rollup"),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / GROUPING_ID() disambiguation over a rollup — the
    classic super-aggregate trap: in rollup output a NULL grouping
    column means EITHER "this level grouped the column out" OR "the
    data value was NULL", and only the grouping flags tell them apart
    (a BI layer that renders subtotals off bare NULLs double-counts any
    genuinely-NULL key).  Emits both per-column flags and the packed
    grouping id for every rollup level; bit layout (left operand =
    high bit) is pinned engine-identical by the oracle."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_rf", "g_ls", "gid", "n"
        )
    )


@query(
    "agg_hll_native",
    oracle="""
WITH per AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, exact_orders,
       (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS corpus_exact,
       TRUE AS hll_group_ok,
       TRUE AS hll_merge_ok
FROM per
""",
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL through Spark's NATIVE sketch surface —
    `hll_sketch_agg` builds a per-group binary sketch, `hll_union_agg`
    merges the group sketches into a corpus sketch WITHOUT re-touching
    the raw rows, and `hll_sketch_estimate` reads both out.  This is the
    other half of the sketch story next to `agg_approx`
    (approx_count_distinct = HLL++ estimate only) and `agg_kmv_merge`
    (hand-rolled mergeable KMV): here the sketch itself is a first-class
    column you can persist to a rollup table and re-merge at any later
    grain — the 100 TB incremental-distinct contract.  Sketch bytes are
    engine-specific, so the oracle pins the CONTRACT: exact distinct
    counts at both grains (computed by both engines) plus booleans that
    each estimate lands within 5% — DataSketches HLL is deterministic
    for a fixed input, so a regression flips the hash.  Plan: one
    partial-aggregatable group-by, then a 3-row re-agg; the merge stage
    moves only sketch bytes (lgConfigK=12 -> 4 KB/sketch), never data."""
    l = table(spark, sf_dir, "lineitem")
    per = l.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("_sk"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_merge_est")
    )
    corpus = l.agg(F.count_distinct("l_orderkey").alias("corpus_exact"))
    return (
        per.select(
            "l_returnflag",
            "exact_orders",
            F.hll_sketch_estimate("_sk").alias("_group_est"),
        )
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(merged))
        .select(
            "l_returnflag",
            "exact_orders",
            "corpus_exact",
            (
                F.abs(F.col("_group_est") - F.col("exact_orders"))
                <= F.col("exact_orders") * 0.05
            ).alias("hll_group_ok"),
            (
                F.abs(F.col("_merge_est") - F.col("corpus_exact"))
                <= F.col("corpus_exact") * 0.05
            ).alias("hll_merge_ok"),
        )
    )


_KMV_INTERSECT_K = 256

_KMV_INTERSECT_ORACLE = f"""
WITH a AS (SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
           FROM orders WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT
        CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
             AS BIGINT) AS h
      FROM orders WHERE o_orderpriority = '2-HIGH'),
ka AS (SELECT h FROM a ORDER BY h LIMIT {_KMV_INTERSECT_K}),
kb AS (SELECT h FROM b ORDER BY h LIMIT {_KMV_INTERSECT_K}),
u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t
      ORDER BY h LIMIT {_KMV_INTERSECT_K}),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth_hash,
                 CAST(ROUND(((COUNT(*) - 1) * 1152921504606846976.0) / MAX(h),
                            0) AS BIGINT) AS est_union
          FROM u),
rho AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM u
        WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect
       FROM (SELECT h FROM a INTERSECT SELECT h FROM b) t)
SELECT k_used, kth_hash, est_union, n_both,
       CAST(ROUND(CAST(n_both AS DOUBLE) / k_used * est_union, 0) AS BIGINT)
         AS est_intersect,
       exact_intersect,
       ABS(CAST(ROUND(CAST(n_both AS DOUBLE) / k_used * est_union, 0)
                AS BIGINT) - exact_intersect)
         <= CAST(0.3 * exact_intersect AS BIGINT) AS within_tolerance
FROM stats, rho, ex
"""


@query(
    "agg_kmv_intersect",
    oracle=_KMV_INTERSECT_ORACLE,
    tags=("aggregate", "sketch"),
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-INTERSECTION estimate from two KMV sketches (Beyer et al.
    2007) — the audience-overlap question ("how many customers placed
    both URGENT and HIGH orders?") answered from two k-minimum-values
    sketches without re-scanning either input: the union sketch is the k
    smallest of the combined hash sets, the overlap fraction rho = (union
    -sketch hashes present in BOTH per-set sketches)/k, and
    |A∩B| ~= rho * est(|A∪B|).  Completes the sketch algebra next to
    `agg_kmv_distinct` (NDV) and `agg_kmv_merge` (union): with
    distinct/union/intersect, any set expression over pre-aggregated
    sketch columns is answerable at 100 TB from k-row state.  KMV is
    fully deterministic given the portable h64, so the DuckDB oracle
    replays every hash, the three top-k sets, rho, and both estimates;
    the exact intersection and a 30% accuracy boolean are computed by
    BOTH engines (k=256 -> rsd ~6% on the union, compounded through the
    ratio estimator).  Plan: per-set distinct + ordered LIMIT k compiles
    to per-partition top-k merges (TakeOrderedAndProject) — never a full
    shuffle of the distinct domain; everything after is k-row joins.
    Reference parity: hashing role hash-util.h:44-65; sketch surface is
    north-star scope (SURVEY §2B aggregation)."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import h64

    o = table(spark, sf_dir, "orders")

    def sketch_src(pri: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == pri)
            .select(h64(F.col("o_custkey").cast("string")).alias("h"))
            .distinct()
        )

    # each distinct hash set feeds three consumers (its own sketch, the
    # union sketch, the exact-intersection check) — persist so the
    # scan+distinct runs once per set, not once per consumer
    a, b = sketch_src("1-URGENT").persist(), sketch_src("2-HIGH").persist()
    k = _KMV_INTERSECT_K
    ka = a.orderBy("h").limit(k)
    kb = b.orderBy("h").limit(k)
    u = a.unionByName(b).distinct().orderBy("h").limit(k)
    stats = u.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.round(
            ((F.col("k_used") - 1) * F.lit(1152921504606846976.0))
            / F.col("kth_hash"),
            0,
        )
        .cast("bigint")
        .alias("est_union"),
    )
    n_both = (
        u.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    exact = (
        a.join(b, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    est_i = F.round(
        F.col("n_both").cast("double") / F.col("k_used") * F.col("est_union"), 0
    ).cast("bigint")
    out = (
        stats.crossJoin(F.broadcast(n_both))
        .crossJoin(F.broadcast(exact))
        .select(
            "k_used",
            "kth_hash",
            "est_union",
            "n_both",
            est_i.alias("est_intersect"),
            "exact_intersect",
            (
                F.abs(est_i - F.col("exact_intersect"))
                <= (F.lit(0.3) * F.col("exact_intersect")).cast("bigint")
            ).alias("within_tolerance"),
        )
    )
    return tie_unpersist(out, a, b)


_WEIGHTED_MEDIAN_ORACLE = """
WITH vw AS (
  SELECT l_returnflag AS flag, CAST(l_extendedprice AS DECIMAL(12,2)) AS val,
         CAST(FLOOR(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
grouped AS (SELECT flag, val, SUM(w) AS vw_sum FROM vw GROUP BY flag, val),
cum AS (
  SELECT flag, val,
         SUM(vw_sum) OVER (PARTITION BY flag ORDER BY val
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         SUM(vw_sum) OVER (PARTITION BY flag) AS totw
  FROM grouped
)
SELECT flag AS l_returnflag,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN val END) AS DOUBLE)
         AS weighted_median,
       CAST(MAX(totw) AS BIGINT) AS total_weight
FROM cum GROUP BY flag
"""


@query(
    "agg_weighted_median",
    oracle=_WEIGHTED_MEDIAN_ORACLE,
    tags=("aggregate", "percentile"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median per group — the lower weighted median (smallest
    value v whose cumulative weight reaches half the total), the
    robust center for weighted populations (price weighted by quantity,
    latency weighted by request count) that neither engine ships as a
    builtin.  Composition: pre-aggregate weight per (group, value) —
    map-side combinable, and it collapses the window input to DISTINCT
    values — then one cumulative-weight window per group and a
    min-satisfying-value argmin.  The selected value is deterministic
    WITHOUT a tiebreak column: the predicate 2*cumw >= totw is monotone
    along the value order and values are unique after the pre-agg.  All
    arithmetic is integer weights + exact DECIMAL values (the only
    double is the final surfacing cast), so the oracle replays
    bit-for-bat.  Scale: two keyed shuffles; per-group window state is
    one running sum over distinct values — at pathological distinct
    cardinality the equidepth-histogram route (`agg_histogram_equidepth`)
    is the approximation path.  Reference parity: AggregateFunctions
    percentile scope, SURVEY §2B aggregation."""
    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("val"),
        F.floor("l_quantity").cast("long").alias("w"),
    )
    grouped = l.groupBy("flag", "val").agg(F.sum("w").alias("vw_sum"))
    w_cum = (
        W.partitionBy("flag")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grouped.select(
        "flag",
        "val",
        F.sum("vw_sum").over(w_cum).alias("cumw"),
        F.sum("vw_sum").over(W.partitionBy("flag")).alias("totw"),
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("val")))
        .cast("double")
        .alias("weighted_median"),
        F.max("totw").cast("long").alias("total_weight"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_matrix_oracle() -> str:
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _CORR_COLS:
        moments.append(f"SUM(CAST({c} AS DECIMAL(12,2))) AS s_{c}")
    for a, b in _CORR_PAIRS + [(c, c) for c in _CORR_COLS]:
        moments.append(
            f"SUM(CAST({a} AS DECIMAL(12,2)) * CAST({b} AS DECIMAL(12,2)))"
            f" AS s_{a}_{b}"
        )
    rows = []
    for a, b in _CORR_PAIRS:
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b,\n"
            f"  ROUND((n * CAST(s_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))\n"
            f"  / sqrt((n * CAST(s_{a}_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))\n"
            f"       * (n * CAST(s_{b}_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 9)"
            f" AS corr9\nFROM m"
        )
    return (
        "WITH m AS (SELECT " + ",\n       ".join(moments) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
    )


@query(
    "agg_corr_matrix",
    oracle=_corr_matrix_oracle(),
    tags=("aggregate", "profiling", "stats"),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation MATRIX over the lineitem numeric
    columns in ONE pass — the profiling rollup a warehouse ANALYZE or a
    feature-selection pass wants (`agg_stats_exact` pins one pair; this
    is all 6 from a single scan).  Every moment (sums, squares, cross
    products) accumulates in exact DECIMAL — associative, so map-side
    partials at any parallelism reproduce the single-threaded oracle —
    and each correlation is then a fixed double expression over those
    exact moments (sqrt is IEEE correctly-rounded; ROUND(..,9) guards
    the last ulp by repo convention).  The moments row is ONE global
    aggregate (a few dozen numbers, no per-group state); the matrix
    unpivot is driver-free `stack`.  At 100 TB this is the pattern for
    any number of columns: one pass, O(k^2) accumulators, zero extra
    scans.  Reference parity: AggregateFunctions moment scope
    (SURVEY §2B aggregation)."""
    l = table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(12,2)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(dec[c]).alias(f"s_{c}") for c in _CORR_COLS]
    aggs += [
        F.sum(dec[a] * dec[b]).alias(f"s_{a}_{b}")
        for a, b in _CORR_PAIRS + [(c, c) for c in _CORR_COLS]
    ]
    m = l.agg(*aggs)

    def corr9(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        saa = F.col(f"s_{a}_{a}").cast("double")
        sbb = F.col(f"s_{b}_{b}").cast("double")
        return F.round(
            (n * sab - sa * sb)
            / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            9,
        )

    stack_args = []
    for a, b in _CORR_PAIRS:
        stack_args += [F.lit(a), F.lit(b), corr9(a, b)]
    return m.select(
        F.stack(F.lit(len(_CORR_PAIRS)), *stack_args).alias(
            "col_a", "col_b", "corr9"
        )
    )
