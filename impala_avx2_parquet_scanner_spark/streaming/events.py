"""Event-time windowing over the `events` table.

The reference has no streaming surface (SURVEY.md §2B 'Not present
anywhere'), but the north star mandates one.  Every operator here is a
*batch* DataFrame query using the same event-time primitives Structured
Streaming executes (`window()`, `session_window()` semantics) so the DuckDB
oracle can verify it; streaming/stream_demo.py runs the same plans through
``readStream`` with watermarks (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.cache import tie_unpersist
from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

_SQL_SUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"


@query(
    "events_tumbling",
    oracle=f"""
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, {_SQL_SUM_VALUE} AS sum_value
FROM events GROUP BY 1, 2
""",
    tags=("events", "window"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (epoch-aligned, identical to
    date_trunc) — the append-mode streaming aggregation run as a batch."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "events_sliding",
    oracle=f"""
SELECT MAKE_TIMESTAMP((CAST(FLOOR(EPOCH(ts) / 1800) AS BIGINT) - k.k) * 1800 * 1000000) AS window_start,
       COUNT(*) AS n, {_SQL_SUM_VALUE} AS sum_value
FROM events, (SELECT UNNEST([0, 1]) AS k) k
GROUP BY 1
""",
    tags=("events", "window"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h width, 30 min slide): every event lands in
    exactly two windows.  Oracle expands the window set arithmetically."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "sum_value",
        )
    )


_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         -- BIGINT cast: DuckDB window SUM yields HUGEINT, which lands in
         -- pandas as float64 ('0.0' vs Spark's '0') and breaks the hash
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


@query("events_sessionize", oracle=_SESSION_ORACLE, tags=("events", "session"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the batch
    gaps-and-islands form of `session_window(ts, '30 minutes')`.

    Scale: one shuffle on user_id; window functions stream within each
    user partition (no driver-side state)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    return (
        e.withColumn(
            "new_session",
            F.when(gap_us > 1800 * 1000 * 1000, 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_first_per_key",
    oracle="""
SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id, value AS first_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1
""",
    tags=("events", "dedup"),
)
def events_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup per (user, event_type) — the batch
    form of streaming `dropDuplicates` with a defined winner (row_number,
    not the nondeterministic first-seen)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
            F.col("value").alias("first_value"),
        )
    )


@query(
    "events_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS min_k,
       MAX(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON field extraction + aggregate
    (Spark side uses the native JSON path expression)."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@query(
    "events_attribution",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       COUNT(*) AS n_views,
       MAX(v.ts) AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
GROUP BY p.event_id, p.user_id
""",
    tags=("events", "join", "interval"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution: for each purchase, the views by the same
    user in the preceding hour — the batch twin of the stream-stream
    interval join in stream_demo.attribution_join_stream.

    Scale shape: equi-join on user_id (one shuffle) with the time bound as
    a residual; the interval bound is what lets the STREAMING version
    evict state, and in batch it keeps the join output linear in the
    match count rather than |views|×|purchases| per user."""
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    return (
        p.join(
            v,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.max("v_ts").alias("last_view_ts"),
        )
    )


_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


@query("events_funnel", oracle=_FUNNEL_ORACLE, tags=("events", "funnel"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: first qualifying timestamp per
    step, each step strictly after the previous one (NULL = dropped off).

    Single-pass shape: one scan (with the 3-step In-filter pushed to
    parquet) and ONE shuffle.  Three stacked whole-partition window
    aggregates over the same `user_id` partitioning compute the chained
    MINs — each step's window expression references the previous step's
    column (constant within the partition), so `t_click = MIN(click ts >
    t_view)` etc. evaluate without any self-join; Catalyst plans all
    three windows plus the final per-user collapse on a single exchange.
    Strict `>` bounds reproduce the oracle's chained-MIN semantics at
    timestamp ties, and everything stays inside codegen (no Python, no
    higher-order-function interpretation)."""
    from pyspark.sql import Window as W

    steps = ("view", "click", "purchase")
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin(*steps))
    )
    w = W.partitionBy("user_id")
    typ, ts = F.col("event_type"), F.col("ts")
    staged = (
        e.withColumn(
            "t_view", F.min(F.when(typ == "view", ts)).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when((typ == "click") & (ts > F.col("t_view")), ts)
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when((typ == "purchase") & (ts > F.col("t_click")), ts)
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("t_view").isNotNull())
        .select("user_id", "t_view", "t_click", "t_purchase")
        .distinct()
    )


_COHORT_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
  FROM events
), ret AS (
  SELECT cohort,
         CAST(DATE_DIFF('day', cohort, wk) / 7.0 AS BIGINT) AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN first_seen USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort, COUNT(*) AS cohort_size FROM first_seen GROUP BY cohort
)
SELECT cohort, week_offset, n_active, cohort_size,
       CAST(n_active AS DOUBLE) / cohort_size AS retention
FROM ret JOIN sizes USING (cohort)
"""


@query("events_cohort_retention", oracle=_COHORT_ORACLE, tags=("events", "cohort"))
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    tracked by distinct activity in each later week.

    A single per-user aggregation carries both the cohort label and the
    set of active weeks (weeks-per-user is calendar-bounded, so the set
    is small by construction); the cohort-size side is weeks-cardinality
    (broadcast).  Week arithmetic is day-difference ÷ 7 on truncated
    timestamps — exact integers, so Spark and the oracle agree without
    float comparisons."""
    e = table(spark, sf_dir, "events")
    # One per-user aggregation produces BOTH the cohort label (min ts)
    # and the distinct active weeks (collect_set) — one scan, one
    # shuffle, and no separate distinct/join stage.  Exploding the weeks
    # afterwards yields rows already unique per (user, week), so the
    # retention count is a plain COUNT(*), not a COUNT(DISTINCT) (which
    # would cost an expand + extra shuffle at 100 TB).
    per_user = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort"),
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("wks"),
    )
    ret = (
        per_user.select(
            "user_id", "cohort", F.explode("wks").alias("wk")
        )
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / F.lit(7.0))
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        ret.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
    )


@query(
    "events_session_window",
    oracle=f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM o
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events, {_SQL_SUM_VALUE} AS sum_value
FROM s GROUP BY user_id, sid
""",
    tags=("events", "session"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN session_window operator (vs events_sessionize's manual
    gaps-and-islands): Spark merges per-user sessions with a 30-minute
    inactivity gap inside the aggregation itself — the same operator that
    powers streaming session windows.  The oracle replays the semantics
    (a new session starts iff the gap to the previous event is >= 30 min;
    session end = last event + gap).

    Scale: one shuffle on (user_id); session merging is a sort within
    each hash partition, no global state — the streaming form adds a
    watermark and keeps only open sessions in the state store."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), t AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST((1000000 * n) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_ppm
FROM t
"""


@query("events_path_transitions", oracle=_TRANSITIONS_ORACLE, tags=("events", "path"))
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-path transition matrix (Markov mining over the
    clickstream): per user, pair each event with its successor via LEAD,
    then count (from, to) transitions and each row's share of its from-state
    in exact integer ppm (BIGINT DIV — no float division, so the oracle's
    HUGEINT window sum is pinned to BIGINT).

    Scale: one user_id-keyed shuffle for the LEAD window (per-user frames),
    then a map-side-combinable count whose output is |event_types|² rows —
    constant; the share window runs over that constant-size matrix."""
    seq_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(seq_w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        t.withColumn("n_from", F.sum("n").over(W.partitionBy("from_type")))
        .withColumn("share_ppm", F.expr("(1000000 * n) DIV n_from"))
        .select("from_type", "to_type", "n", "share_ppm")
    )


_AB_LIFT_ORACLE = """
WITH assign AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), v AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM assign GROUP BY variant
), w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
    MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
    MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
    MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
  FROM v
)
SELECT n0, c0, n1, c1,
       ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0, 9) AS abs_lift,
       ROUND(
         (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
         / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1.0 / n0 + 1.0 / n1)),
         9) AS z_stat
FROM w
"""


@query("events_ab_lift", oracle=_AB_LIFT_ORACLE, tags=("events", "experiment"))
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout (the A/B analytics shape):
    deterministic variant assignment (user_id parity — in production a
    salted hash, same plan), per-user conversion flag via MAX(CASE) on
    high-value purchases (value > 150; unconditional purchase is 100%
    in the fixture, which would zero the pooled variance), then
    pooled-variance z-statistic for the conversion-rate lift.  All counts
    are exact integers; the two floating expressions are final per-row
    math, 9-dp rounded on both sides.

    Scale: one user-keyed shuffle (map-side combinable MAX), one
    2-row variant rollup, then a 1-row pivot — the corpus is touched
    once, and nothing downstream of the first aggregation exceeds
    |variants| rows."""
    assign = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).cast("int").alias("variant"), "converted")
    )
    v = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    n0, c0 = F.col("n0"), F.col("c0")
    n1, c1 = F.col("n1"), F.col("c1")
    p0 = c0.cast("double") / n0
    p1 = c1.cast("double") / n1
    pool = (c0 + c1).cast("double") / (n0 + n1)
    return w.select(
        "n0", "c0", "n1", "c1",
        F.round(p1 - p0, 9).alias("abs_lift"),
        F.round(
            (p1 - p0)
            / F.sqrt(
                pool * (F.lit(1.0) - pool)
                * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
            ),
            9,
        ).alias("z_stat"),
    )


_RFM_ORACLE = """
WITH p AS (SELECT user_id, ts, CAST(value AS DECIMAL(12,2)) AS v
           FROM events WHERE event_type = 'purchase'),
agg AS (SELECT user_id, MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS frequency, SUM(v) AS mon
        FROM p GROUP BY user_id),
mx AS (SELECT MAX(ts) AS m FROM p),
s AS (SELECT user_id,
             CAST(date_diff('day', CAST(last_ts AS DATE), CAST(mx.m AS DATE))
                  AS BIGINT) AS recency_days,
             frequency, CAST(mon AS DOUBLE) AS monetary
      FROM agg, mx),
th AS (SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
              quantile_cont(frequency,    [0.25, 0.5, 0.75]) AS fq,
              quantile_cont(monetary,     [0.25, 0.5, 0.75]) AS mq
       FROM s)
SELECT s.user_id, s.recency_days, s.frequency, s.monetary,
       CAST(CASE WHEN recency_days <= rq[1] THEN 4
                 WHEN recency_days <= rq[2] THEN 3
                 WHEN recency_days <= rq[3] THEN 2 ELSE 1 END AS INT) AS r_score,
       CAST(CASE WHEN frequency >= fq[3] THEN 4 WHEN frequency >= fq[2] THEN 3
                 WHEN frequency >= fq[1] THEN 2 ELSE 1 END AS INT) AS f_score,
       CAST(CASE WHEN monetary >= mq[3] THEN 4 WHEN monetary >= mq[2] THEN 3
                 WHEN monetary >= mq[1] THEN 2 ELSE 1 END AS INT) AS m_score
FROM s, th
"""


@query("events_rfm", oracle=_RFM_ORACLE, tags=("events", "segmentation"))
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartile scores
    per purchasing user) — the classic customer-analytics rollup.  The
    textbook formulation is `NTILE(4)` over each metric, but NTILE is a
    GLOBAL window: one ordering over every user, a single-partition sort
    that grows with the user base — the exact shape this engine bans at
    100 TB.  Instead the quartile THRESHOLDS are computed (exact
    interpolated `percentile` over the per-user aggregate, 9 doubles)
    and broadcast; scoring is then a map-side CASE — no global sort at
    any scale, and user counts per bucket stay within one of NTILE's
    (ties land in one bucket rather than splitting).  Interpolated
    boundaries stay bit-identical across engines because the metrics
    are integers/exact decimals and the interp fractions are exact
    binary (.25/.5/.75).  Recency is whole days from each user's last
    purchase to the corpus' last purchase (a 1-row broadcast, not
    `now()` — deterministic).  Plan: one user-keyed aggregation, a
    3-row threshold agg, two broadcasts."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").cast("decimal(12,2)").alias("v")
    )
    agg = p.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("v").alias("mon"),
    )
    mx = p.agg(F.max("ts").alias("m"))
    s = (
        agg.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(F.to_date("m"), F.to_date("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            F.col("mon").cast("double").alias("monetary"),
        )
        # s feeds the threshold agg AND the scoring pass; without a
        # materialization point the purchase aggregation runs twice.
        .persist()
    )
    qs = [0.25, 0.5, 0.75]
    th = s.agg(
        F.percentile("recency_days", qs).alias("rq"),
        F.percentile("frequency", qs).alias("fq"),
        F.percentile("monetary", qs).alias("mq"),
    )

    def score_low_good(col, q):
        return (
            F.when(F.col(col) <= F.element_at(q, 1), 4)
            .when(F.col(col) <= F.element_at(q, 2), 3)
            .when(F.col(col) <= F.element_at(q, 3), 2)
            .otherwise(1)
            .cast("int")
        )

    def score_high_good(col, q):
        return (
            F.when(F.col(col) >= F.element_at(q, 3), 4)
            .when(F.col(col) >= F.element_at(q, 2), 3)
            .when(F.col(col) >= F.element_at(q, 1), 2)
            .otherwise(1)
            .cast("int")
        )

    out = s.crossJoin(F.broadcast(th)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        score_low_good("recency_days", F.col("rq")).alias("r_score"),
        score_high_good("frequency", F.col("fq")).alias("f_score"),
        score_high_good("monetary", F.col("mq")).alias("m_score"),
    )
    return tie_unpersist(out, s)


_FUNNEL_WINDOWED_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 6 HOUR
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 6 HOUR
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       (p.t_purchase IS NOT NULL) AS converted
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


@query(
    "events_funnel_windowed",
    oracle=_FUNNEL_WINDOWED_ORACLE,
    tags=("events", "funnel"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-WINDOW funnel: view→click→purchase where each next
    step must land within 6 hours of the previous one — the
    time-bounded form every product-analytics funnel actually uses (an
    unbounded funnel credits a purchase months after the view;
    `events_funnel` is that upper bound).  Same single-exchange plan as
    the unbounded funnel: three stacked whole-partition window MINs
    over one user_id shuffle, each step's window expression adding the
    per-step deadline as an integer-microsecond bound (exact on both
    engines; DuckDB's INTERVAL arithmetic at µs precision matches
    unix_micros + 6*3600e6).  Dropping the deadline from a step NULLs
    every later step — the chained `> t_prev` conditions propagate
    NULL, matching the oracle's join chain."""
    steps = ("view", "click", "purchase")
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin(*steps))
    )
    w = W.partitionBy("user_id")
    typ, ts = F.col("event_type"), F.col("ts")
    us = F.unix_micros(ts.cast("timestamp"))
    bound_us = 6 * 3600 * 1_000_000

    def prev_us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    staged = (
        e.withColumn("t_view", F.min(F.when(typ == "view", ts)).over(w))
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (typ == "click")
                    & (ts > F.col("t_view"))
                    & (us <= prev_us("t_view") + bound_us),
                    ts,
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (typ == "purchase")
                    & (ts > F.col("t_click"))
                    & (us <= prev_us("t_click") + bound_us),
                    ts,
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("t_view").isNotNull())
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("converted"),
        )
        .distinct()
    )


_MULTITOUCH_ORACLE = """
WITH pv AS (
  SELECT p.event_id AS purchase_id, v.event_id AS view_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.ts, v.event_id) AS touch_pos,
         CAST(COUNT(*) OVER (PARTITION BY p.event_id) AS BIGINT) AS n_touches
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON v.user_id = p.user_id
   AND v.ts BETWEEN p.ts - INTERVAL 6 HOUR AND p.ts
)
SELECT purchase_id, view_id, CAST(touch_pos AS INTEGER) AS touch_pos,
       n_touches,
       CASE WHEN n_touches = 1 THEN 1.0
            WHEN n_touches = 2 THEN 0.5
            WHEN touch_pos = 1 OR touch_pos = n_touches THEN 0.4
            ELSE 0.2 / (n_touches - 2) END AS credit
FROM pv
"""


@query(
    "events_attribution_multitouch",
    oracle=_MULTITOUCH_ORACLE,
    tags=("events", "attribution"),
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every view in
    the 6 h window before a purchase earns credit — 40% to the first
    touch, 40% to the last, 20% split across the middles (degenerating
    to 1.0 / 0.5+0.5 for 1- and 2-touch paths) — the credit model
    marketing analytics uses when last-touch (`events_attribution`)
    over-rewards the final click.  Credits are rational in integer
    counts, so the single int/int->double division is bit-identical
    across engines and each purchase's credits sum to exactly 1.0 in
    exact arithmetic.  Plan: one user-keyed interval join (time bound
    residual, linear output), then one purchase-keyed window for
    position/count — two keyed shuffles, no data-sized global state.
    Reference parity: interval-join scope (SURVEY §2B events); the
    streaming twin eviction argument is `events_attribution`'s."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    )
    pv = p.join(v, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 HOUR"))
    )
    w = W.partitionBy("purchase_id").orderBy("v_ts", "view_id")
    staged = pv.select(
        "purchase_id",
        "view_id",
        F.row_number().over(w).alias("touch_pos"),
        F.count(F.lit(1)).over(W.partitionBy("purchase_id")).alias("n_touches"),
    )
    n, pos = F.col("n_touches"), F.col("touch_pos")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    return staged.select(
        "purchase_id",
        "view_id",
        pos.cast("int").alias("touch_pos"),
        n.cast("long").alias("n_touches"),
        credit.alias("credit"),
    )


_ENTROPY_GINI_ORACLE = """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
tot AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt*cnt) AS BIGINT) AS sumc2,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM c GROUP BY user_id),
e AS (SELECT c.user_id,
             ROUND(-SUM((CAST(cnt AS DOUBLE) / t.n)
                        * log2(CAST(cnt AS DOUBLE) / t.n)), 9) AS entropy9
      FROM c JOIN tot t USING (user_id) GROUP BY c.user_id)
SELECT t.user_id, t.n, t.n_types,
       1.0 - CAST(t.sumc2 AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n) AS gini,
       e.entropy9
FROM tot t JOIN e USING (user_id)
"""


@query(
    "agg_entropy_gini",
    oracle=_ENTROPY_GINI_ORACLE,
    tags=("aggregate", "profiling", "events"),
)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profiling per user: Shannon entropy and Gini
    impurity of each user's event-type mix — the diversity statistics a
    data-quality/profiling pass reports next to NDV (`scan_profile`).
    Exactness split by construction: Gini = 1 - sum(c^2)/n^2 is computed
    ENTIRELY in integer counts with ONE final double division — bit-
    identical across engines with no rounding escape hatch; entropy
    needs log2 (transcendental, engine libm may differ in ulps), so it
    follows the repo's 9-dp rounding convention (`events_anomaly_mad`).
    Plan: one (user, type)-keyed partial-aggregatable count, then
    user-keyed rollups — the per-user state is the type histogram (a few
    entries), never the event list.  Reference parity: AggregateFunctions
    scope, SURVEY §2B aggregation/profiling."""
    # the (user, type) histogram feeds both the totals rollup and the
    # entropy pass — persist so the event scan+count runs once
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    tot = c.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sumc2"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p_frac = F.col("cnt").cast("double") / F.col("n")
    ent = (
        c.join(tot.select("user_id", "n"), "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p_frac * F.log2(p_frac)), 9).alias("entropy9"))
    )
    gini = F.lit(1.0) - F.col("sumc2").cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    out = tot.join(ent, "user_id").select(
        "user_id", "n", "n_types", gini.alias("gini"), "entropy9"
    )
    return tie_unpersist(out, c)
