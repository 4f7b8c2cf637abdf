"""Window-function surface (SURVEY.md §2B — TopNNode reference
descriptors.h:371-373; full window functions absent from the slice but part
of the engine's north-star surface).

Every window below carries a total order (explicit tiebreakers) so results
are deterministic and oracle-comparable.  Running double sums are computed
in frame order on both engines, so even floating-point running totals
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query


@query(
    "window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 2 AND c_custkey <= 300
""",
    tags=("window", "topn"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the distributed Top-N pattern (one
    shuffle on the partition key; never a global sort)."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 2) & (F.col("o_custkey") <= 300))
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@query(
    "window_rank_dense",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS price_dense_rank
FROM part WHERE p_partkey <= 400
""",
    tags=("window", "rank"),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK with ties (ordering on the low-cardinality
    p_size makes ties real)."""
    w = W.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 400)
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
        )
    )


@query(
    "window_running_sum",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
FROM lineitem WHERE l_orderkey <= 1000
""",
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT) + whole-
    partition count."""
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.sum("l_quantity")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("running_qty"),
            F.count(F.lit(1))
            .over(W.partitionBy("l_orderkey"))
            .alias("n_lines"),
        )
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_order,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_order
FROM orders WHERE o_custkey <= 150
""",
    tags=("window", "offset"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offset functions over event order."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 150)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
    )


@query(
    "window_value_functions",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
QUALIFY o_custkey <= 100
""",
    tags=("window", "value"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE (full frame) / NTH_VALUE."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        table(spark, sf_dir, "orders")
        .withColumn("first_order", F.first("o_orderkey").over(w))
        .withColumn("last_order", F.last("o_orderkey").over(w_full))
        .withColumn("second_order", F.nth_value("o_orderkey", 2).over(w))
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey", "o_orderkey", "first_order", "last_order", "second_order"
        )
    )


@query(
    "window_range_interval",
    oracle="""
SELECT user_id, ts, event_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events QUALIFY user_id <= 20
""",
    tags=("window", "range"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: sliding count of each user's events in the
    trailing hour — the event-time analog of a RANGE window (computed on
    epoch seconds; Spark's RANGE frames are numeric)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    # integer µs ordering: exact boundary arithmetic, matching DuckDB's
    # µs-precision interval frame bit-for-bit
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(micros).rangeBetween(-3600 * 1_000_000, 0)
    return e.select(
        "user_id", "ts", "event_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@query(
    "window_ntile_share",
    oracle="""
SELECT o_orderkey, o_totalprice,
       NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
         / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER () AS DOUBLE) AS price_share
FROM orders WHERE o_custkey <= 50
""",
    tags=("window", "ntile"),
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing + share-of-total via an unpartitioned window (the
    global SUM() OVER () is exact-decimal, so the double division is
    reproducible).  Global windows don't scale past one partition — kept
    on a filtered subset by design; the scalable form is a broadcast
    scalar subquery."""
    w_all = W.partitionBy()
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.ntile(4)
            .over(W.orderBy(F.desc("o_totalprice"), "o_orderkey"))
            .alias("quartile"),
            (
                F.col("o_totalprice").cast("decimal(12,2)").cast("double")
                / F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .over(w_all)
                .cast("double")
            ).alias("price_share"),
        )
    )


@query(
    "window_dist_functions",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM orders WHERE o_custkey <= 150
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "distribution"),
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST distribution functions (SQL:2003 window
    surface the reference's Impala FE exposes).  Both are rank/count
    ratios — (rank-1)/(n-1) and rows_le/n — so the doubles are identical
    integer divisions in both engines.  Partitioned by customer: scales
    as ordinary keyed windows (no global sort); the o_orderkey tiebreak
    makes ranks deterministic."""
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 150)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
        )
    )


@query(
    "window_topk_twophase",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey,
                                     l_linenumber) AS rn
  FROM lineitem
) t WHERE rn <= 2
""",
    tags=("window", "topn", "skew"),
)
def window_topk_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase Top-K: lineitem has only 3 return-flag groups,
    so a single `row_number` window funnels a third of the table through
    one task — the canonical few-huge-groups skew trap.  Phase 1 ranks
    within (group, salt) sub-buckets (salt = l_orderkey % 16, data-derived
    and deterministic) and keeps K per bucket; phase 2 re-ranks only the
    ≤ 16·K survivors per group.  The global Top-K is always contained in
    the union of per-bucket Top-Ks, so the result is IDENTICAL to the
    direct window — the oracle states the direct form and the driver's
    value hash proves the equivalence.

    At 100 TB: phase 1's widest task handles group/16 rows (tune the salt
    fan-out to executor memory); phase 2's input is 16·K rows per group —
    constant.  (l_orderkey, l_linenumber) breaks ties, so both phases are
    total orders and bit-deterministic."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    salted = l.withColumn("salt", F.col("l_orderkey") % 16)
    w1 = W.partitionBy("l_returnflag", "salt").orderBy(*order)
    survivors = (
        salted.withColumn("brn", F.row_number().over(w1))
        .filter(F.col("brn") <= 2)
        .drop("brn", "salt")
    )
    w2 = W.partitionBy("l_returnflag").orderBy(*order)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 2)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


@query(
    "window_ignore_nulls",
    oracle="""
SELECT user_id, event_id,
  CASE WHEN event_type = 'purchase' THEN value END AS dval,
  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_p,
  NTH_VALUE(CASE WHEN event_type = 'purchase' THEN value END, 2 IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_p,
  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_p
FROM events WHERE user_id <= 50
""",
    tags=("window", "nulls"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS value-function semantics (first/nth/last over a sparse
    column): `dval` is non-NULL only on purchase events, and the three
    windows answer "first purchase so far", "second purchase so far", and
    "most recent strictly-earlier purchase" — the forward-fill/as-of family
    expressed entirely in frame clauses.  Values pass through unchanged
    (no arithmetic), so doubles compare bit-exact.  One shuffle on
    user_id; per-user frames are calendar-bounded, never data-sized."""
    dval = F.when(F.col("event_type") == "purchase", F.col("value"))
    cur = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 50)
        .select(
            "user_id",
            "event_id",
            dval.alias("dval"),
            F.first(dval, ignorenulls=True).over(cur).alias("first_p"),
            F.nth_value(dval, 2, ignoreNulls=True).over(cur).alias("second_p"),
            F.last(dval, ignorenulls=True).over(prev).alias("prev_p"),
        )
    )


_GAPS_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), numbered AS (
  SELECT user_id, day,
         CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len, MIN(day) AS start_day
  FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       MIN(start_day) AS first_day
FROM streaks GROUP BY user_id
"""


@query("window_gaps_islands", oracle=_GAPS_ISLANDS_ORACLE, tags=("window", "events"))
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via the
    classic day-number-minus-row-number grouping key (consecutive days
    share a constant difference), then streak stats per user.  All-integer
    arithmetic; window SUM-free, so the oracle only needs BIGINT pins on
    the counts.

    Scale: distinct (user, day) is one map-side-combinable shuffle; the
    row_number window re-uses the user_id partitioning (frames are
    per-user day lists, calendar-bounded); both follow-up aggregations
    stay on the user_id key — no data-sized window, no re-shuffle."""
    days = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    grp = (
        F.datediff(F.col("day"), F.lit("1998-01-01").cast("date")).cast("bigint")
        - rn
    )
    streaks = (
        days.select("user_id", "day", grp.alias("grp"))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("start_day"),
        )
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
        F.min("start_day").alias("first_day"),
    )


_TRAILING_FEATURES_ORACLE = """
SELECT user_id, event_id,
  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1d,
  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_value_7d,
  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
       OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_purchase_7d
FROM events QUALIFY user_id <= 30
"""


@query("window_trailing_features", oracle=_TRAILING_FEATURES_ORACLE,
       tags=("window", "range", "features"))
def window_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon trailing-window feature vector (the feature-store /
    online-ML shape): per event, the user's 1-day and 7-day activity
    counts, 7-day exact-decimal value sum, and 7-day purchase count — all
    horizons computed in ONE pass over one user_id partitioning (Spark
    plans the four RANGE frames over the same sort, no extra shuffle).
    Frames are integer-µs RANGE bounds, so boundary arithmetic matches
    DuckDB's interval frames bit-for-bit; equal timestamps are in-frame
    together, making the result order-independent."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    day = 86_400 * 1_000_000

    def w(days: int):
        return (
            W.partitionBy("user_id").orderBy(micros).rangeBetween(-days * day, 0)
        )

    dec_val = F.col("value").cast("decimal(18,6)")
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w(1)).alias("n_1d"),
        F.count(F.lit(1)).over(w(7)).alias("n_7d"),
        F.sum(dec_val).over(w(7)).cast("double").alias("sum_value_7d"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1)))
        .over(w(7))
        .alias("n_purchase_7d"),
    )


EWMA_DEPTH = 10  # trailing events per EWMA term (alpha = 1/2, truncated)

_EWMA_TERMS_SQL = " + ".join(
    f"COALESCE(lag_{k} * {1 << (EWMA_DEPTH - 1 - k)}, 0)"
    for k in range(EWMA_DEPTH)
)
_EWMA_DENOM_SQL = " + ".join(
    f"CASE WHEN lag_{k} IS NOT NULL THEN {1 << (EWMA_DEPTH - 1 - k)} ELSE 0 END"
    for k in range(EWMA_DEPTH)
)
_EWMA_LAGS_SQL = ",\n         ".join(
    f"lag(v_q, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_{k}"
    for k in range(EWMA_DEPTH)
)

_EWMA_ORACLE = f"""
WITH q AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS v_q
  FROM events
),
lagged AS (
  SELECT event_id, user_id,
         {_EWMA_LAGS_SQL}
  FROM q
)
SELECT event_id, user_id,
       CAST({_EWMA_TERMS_SQL} AS BIGINT) AS ewma_q,
       CAST({_EWMA_DENOM_SQL} AS BIGINT) AS denom_q,
       CAST({_EWMA_TERMS_SQL} AS DOUBLE)
         / CAST({_EWMA_DENOM_SQL} AS DOUBLE) AS ewma
FROM lagged
"""


@query("window_ewma", oracle=_EWMA_ORACLE, tags=("window", "timeseries"))
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2, truncated at
    the last {EWMA_DEPTH} events) per user — the trailing-smoothing
    feature every metric/anomaly pipeline wants next to plain rolling
    sums (`window_trailing_features`).

    Distance-dependent weights can't ride a plain window SUM, so the
    weighted sum is {EWMA_DEPTH} LAG taps over ONE (user_id)-keyed
    window — still a single shuffle and a single sort, weights applied
    map-side.  Exactness: values are floor-quantized to 1e-6 BIGINTs and
    the power-of-two weights make numerator/denominator exact integers
    (order-free), so the only binary64 op is the final division — Spark
    and DuckDB emit bit-identical doubles.  Ramp-up rows (fewer than
    {EWMA_DEPTH} predecessors) normalize by the weights actually
    present, the standard adjusted-EWMA convention (pandas ewm
    adjust=True, public API semantics).  Ordering is total via the
    (ts, event_id) tiebreak, so every LAG tap is deterministic.

    Streaming twin: `streaming/ewma_stream.py` computes the identical
    feature incrementally with applyInPandasWithState (state = the last
    {EWMA_DEPTH}-1 quantized values per user); stream==batch equality is
    pinned in tests/test_stateful_streaming.py."""
    return ewma_features(table(spark, sf_dir, "events"))


def ewma_features(e: DataFrame) -> DataFrame:
    """Batch EWMA core over any (event_id, user_id, ts, value) frame —
    factored out so the streaming twin's equality test can drive both
    paths with the same input."""
    e = e.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_q"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("v_q", k).over(w).alias(f"lag_{k}") for k in range(EWMA_DEPTH)]
    lagged = e.select("event_id", "user_id", *lags)
    num = sum(
        F.coalesce(
            F.col(f"lag_{k}") * F.lit(1 << (EWMA_DEPTH - 1 - k)), F.lit(0)
        )
        for k in range(EWMA_DEPTH)
    )
    denom = sum(
        F.when(
            F.col(f"lag_{k}").isNotNull(), F.lit(1 << (EWMA_DEPTH - 1 - k))
        ).otherwise(F.lit(0))
        for k in range(EWMA_DEPTH)
    )
    return lagged.select(
        "event_id",
        "user_id",
        num.cast("long").alias("ewma_q"),
        denom.cast("long").alias("denom_q"),
        (num.cast("double") / denom.cast("double")).alias("ewma"),
    )


_WCD_ORACLE = """
SELECT event_id, user_id,
       COUNT(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_distinct_types
FROM events
"""


@query(
    "window_count_distinct",
    oracle=_WCD_ORACLE,
    tags=("window", "distinct"),
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user — the window shape Spark does
    NOT support natively (`COUNT(DISTINCT) OVER` raises
    UNSUPPORTED_EXPR_FOR_WINDOW), expressed through the standard
    workaround: ``size(collect_set(...))`` over the same running frame.
    collect_set's element order is nondeterministic but its SIZE is not,
    so results are stable at any parallelism.

    Scale: one (user_id)-keyed shuffle; the running set lives per
    partition-frame and is bounded by the event-type cardinality (a few
    dozen), NOT by history length, so state per row is O(|types|).  For
    unbounded-cardinality columns the right tool is the KMV/HLL sketch
    aggregate (`agg_kmv_distinct`) — this query is the exact-small-
    domain form.  DuckDB supports the window natively, so the oracle is
    the literal COUNT(DISTINCT) OVER — the workaround is verified
    against the real semantics, not another workaround."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("n_distinct_types"),
    )


_NULLS_ORDER_ORACLE = """
WITH e AS (
  SELECT event_id, user_id,
         CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id, v,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY v DESC NULLS LAST, event_id) AS rn_nulls_last,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY v ASC NULLS FIRST, event_id) AS rn_nulls_first
FROM e
"""


@query("window_nulls_order", oracle=_NULLS_ORDER_ORACLE, tags=("window", "sort"))
def window_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ordering semantics pinned across engines — the classic
    cross-engine trap: Spark's default is NULLS FIRST for ascending
    sorts while DuckDB's is NULLS LAST, so any rank over a nullable key
    silently disagrees unless the null position is EXPLICIT.  Ranks each
    user's events by a deliberately-nulled value (view events -> NULL)
    under both explicit conventions (`desc_nulls_last`,
    `asc_nulls_first`) with an event_id tiebreak for a total order;
    row_number materializes the ordering into values so the
    order-insensitive hash still proves the sort semantics.  One keyed
    shuffle shared by both windows."""
    v = F.when(F.col("event_type") != "view", F.col("value"))
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", v.alias("v")
    )
    w_last = W.partitionBy("user_id").orderBy(
        F.col("v").desc_nulls_last(), "event_id"
    )
    w_first = W.partitionBy("user_id").orderBy(
        F.col("v").asc_nulls_first(), "event_id"
    )
    return e.select(
        "event_id",
        "user_id",
        "v",
        F.row_number().over(w_last).alias("rn_nulls_last"),
        F.row_number().over(w_first).alias("rn_nulls_first"),
    )


_SLIDING_MEDIAN_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(FLOOR(value) AS BIGINT) AS v FROM events
)
SELECT event_id, user_id, v,
       median(v) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
FROM e
"""


@query(
    "window_sliding_median",
    oracle=_SLIDING_MEDIAN_ORACLE,
    tags=("window", "percentile"),
)
def window_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median over a sliding 5-row frame per user — the robust
    rolling statistic every feature pipeline wants next to the rolling
    mean (`window_trailing_features`) and EWMA (`window_ewma`).  Spark
    refuses ordered-set aggregates over a window frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC on `median(...) OVER`), so
    the frame is materialized with `collect_list` over the same 5-row
    frame, sorted, and the midpoint picked positionally — sound ONLY
    because the frame is BOUNDED (5 elements per row, independent of
    history length; an unbounded-preceding variant would be the
    quadratic trap, and the right tool there is a sketch).  Values are
    floored to BIGINT first so the even-count midpoint is exactly
    representable ((a+b)/2 yields x.0/x.5) and the engines'
    interpolation conventions cannot diverge in ulps.  event_id is the
    frame order — a total order, so every frame's population is
    engine-independent.  One keyed shuffle.  Reference parity:
    AggregateFunctions percentile scope, SURVEY §2B aggregation."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("v")
    )
    return sliding_median_features(e)


#: Frame width of the rolling median (rows, current inclusive).
MEDIAN_WINDOW = 5


def sliding_median_features(e: DataFrame) -> DataFrame:
    """(event_id, user_id, v:long) -> + med5.  Shared by the batch query
    above and the stream==batch test of `streaming/median_stream.py`."""
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(MEDIAN_WINDOW - 1), W.currentRow)
    )
    arr = F.sort_array(F.collect_list("v").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        "v",
        ((lo + hi) / F.lit(2.0)).alias("med5"),
    )
