"""Time-series / warehouse-maintenance operators over the `events` table.

The reference slice has no time-series surface (its analytics stop at the
scan — SURVEY.md §2B "Not present anywhere"), but a hypertable-style rollup
path is part of the north-star surface.  Everything here is built from
spine generation (`sequence` + `explode`), event-time windows, and
carry-forward `last(ignorenulls)` — all JVM-side Catalyst expressions, no
Python UDFs.

Scale notes (100 TB): the day spine is tiny (one row per day × event_type)
and is broadcast; the heavy side (`events`) is aggregated down to
per-(type, day) partials map-side before any shuffle.  The window
partitions are keyed by `event_type`/`user_id`, so carry-forward state
never concentrates on one executor.  `events_growth_accounting` windows
over days (bounded cardinality: one row per calendar day), so its single
ordered partition is a few-KB driver-sized frame, not a data-sized one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS dval
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT CAST(UNNEST(generate_series(
        (SELECT MIN(CAST(ts AS DATE)) FROM events),
        (SELECT MAX(CAST(ts AS DATE)) FROM events),
        INTERVAL 1 DAY)) AS DATE) AS day
  ) d
)
SELECT s.event_type, s.day,
       CAST(COALESCE(dv.dval, 0) AS DOUBLE) AS sum_value,
       CAST(LAST_VALUE(dv.dval IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS carry_value
FROM spine s LEFT JOIN daily dv
  ON s.event_type = dv.event_type AND s.day = dv.day
"""


@query("events_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("events", "timeseries"))
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event type: generate the full day spine
    between the observed min/max day, left-join the per-day aggregates,
    fill gaps with 0, and carry the last observed value forward
    (``last(..., ignorenulls=True)`` over an unbounded-preceding frame).

    The spine is `sequence(min_day, max_day)` exploded — computed from one
    scalar aggregate row, so it never touches the fact-table partitioning —
    and broadcast into the join against the (already tiny) daily rollup."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("dval"))
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    spine = e.select("event_type").distinct().crossJoin(F.broadcast(days))
    filled = spine.join(daily, ["event_type", "day"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "event_type",
        "day",
        F.coalesce(F.col("dval"), F.lit(0).cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
        F.last("dval", ignorenulls=True).over(w).cast("double").alias("carry_value"),
    )


_GROWTH_ORACLE = """
WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
first_seen AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY user_id),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS active_users FROM e GROUP BY day),
news AS (SELECT first_day AS day, COUNT(*) AS new_users
         FROM first_seen GROUP BY first_day)
SELECT d.day, d.active_users,
       COALESCE(n.new_users, 0) AS new_users,
       d.active_users - COALESCE(n.new_users, 0) AS returning_users,
       -- BIGINT cast: DuckDB window SUM yields HUGEINT → pandas float64
       -- ('134.0' vs Spark's '134'), which breaks the value hash
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM dau d LEFT JOIN news n ON d.day = n.day
"""


@query(
    "events_growth_accounting",
    oracle=_GROWTH_ORACLE,
    tags=("events", "timeseries"),
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, active users, first-seen (new) users,
    returning users, and the cumulative distinct-user count.

    The cumulative distinct count is NOT a running COUNT(DISTINCT) — it is
    a running SUM over per-day first-seen counts, which decomposes into
    map-side partials and shuffles only day-cardinality rows.  One
    per-user aggregation carries both the first-seen day and the distinct
    active-day set (calendar-bounded per user), so the raw stream is
    scanned once and the per-day distinct count is a plain COUNT(*) over
    the exploded (user, day) pairs — no COUNT(DISTINCT) expand.  The
    final ordered window runs over one row per calendar day (bounded,
    KB-sized), which is the one place a single-partition window is the
    *right* plan."""
    e = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    per_user = e.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.collect_set("day").alias("days"),
    )
    dau = (
        per_user.select(F.explode("days").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    news = (
        per_user.groupBy(F.col("first_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    joined = dau.join(news, "day", "left").select(
        "day",
        "active_users",
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(w).alias("cum_users"),
    )


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type AS attr, ts, event_id
  FROM ordered WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, attr, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS version,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM changes
"""


@query("scd2_build", oracle=_SCD2_ORACLE, tags=("events", "timeseries", "scd"))
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event stream:
    collapse consecutive duplicate attribute values per user (change
    detection via ``lag``), then assign ``valid_from``/``valid_to``
    intervals and a version number via ``lead``/``row_number``.

    Two window passes over the same (user_id → ts, event_id) ordering, so
    Catalyst reuses one shuffle + sort for both; ``event_id`` breaks ties
    deterministically.  Per-user state only — no global ordering — so the
    plan scales with the user-key partitioning."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("attr"), "ts", "event_id")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "attr",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


_MULTIRES_ORACLE = """
WITH minute AS (
  SELECT event_type,
         CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket_start,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS sval
  FROM events GROUP BY 1, 2
),
hour AS (
  SELECT event_type, CAST(date_trunc('hour', bucket_start) AS TIMESTAMP)
           AS bucket_start,
         SUM(n_events) AS n_events, SUM(sval) AS sval
  FROM minute GROUP BY 1, 2
),
day AS (
  SELECT event_type, CAST(date_trunc('day', bucket_start) AS TIMESTAMP)
           AS bucket_start,
         SUM(n_events) AS n_events, SUM(sval) AS sval
  FROM hour GROUP BY 1, 2
)
SELECT 'minute' AS resolution, event_type, bucket_start,
       CAST(n_events AS BIGINT) AS n_events, CAST(sval AS DOUBLE) AS sum_value
FROM minute
UNION ALL
SELECT 'hour', event_type, bucket_start,
       CAST(n_events AS BIGINT), CAST(sval AS DOUBLE) FROM hour
UNION ALL
SELECT 'day', event_type, bucket_start,
       CAST(n_events AS BIGINT), CAST(sval AS DOUBLE) FROM day
"""


@query(
    "events_multires_rollup",
    oracle=_MULTIRES_ORACLE,
    tags=("events", "timeseries", "rollup"),
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution continuous aggregate: one pass
    builds minute buckets, then hour and day resolutions are derived by
    re-aggregating the *previous* resolution's partials — never the raw
    events.  The union carries a `resolution` tag so a serving layer can
    pick the coarsest bucket that answers a dashboard query.

    Scale shape: raw data is touched exactly once (minute rollup, keyed
    aggregation with map-side combine).  A naive `minute UNION hour UNION
    day` plan re-scans the fact table per branch (Spark does not share
    subplans across a union); instead each minute partial explodes into
    its three (resolution, bucket) memberships — 3× a set already bounded
    by distinct-minutes × event-types, not by raw rows — and one second
    keyed aggregation finishes all resolutions at once: one scan, two
    shuffles total.  Exact DECIMAL partials keep every resolution's sums
    associative and bit-reproducible at any parallelism."""
    e = table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("mb"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sval"),
        )
    )
    memberships = F.array(
        F.struct(F.lit("minute").alias("resolution"), F.col("mb").alias("b")),
        F.struct(
            F.lit("hour").alias("resolution"),
            F.date_trunc("hour", F.col("mb")).alias("b"),
        ),
        F.struct(
            F.lit("day").alias("resolution"),
            F.date_trunc("day", F.col("mb")).alias("b"),
        ),
    )
    expanded = minute.select(
        "event_type", "n", "sval", F.explode(memberships).alias("rb")
    )
    return (
        expanded.groupBy(
            F.col("rb.resolution").alias("resolution"),
            "event_type",
            F.col("rb.b").alias("bucket_start"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("sval").cast("double").alias("sum_value"),
        )
    )


_OHLC_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_h,
         ts, event_id, value
  FROM events
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_h
                            ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_h
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM h
)
SELECT event_type, bucket_h,
       MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
       COUNT(*) AS n_events
FROM r GROUP BY event_type, bucket_h
"""


@query("events_ohlc", oracle=_OHLC_ORACLE, tags=("events", "timeseries"))
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) candle downsample per event_type
    — the financial-tick / metrics-rollup shape every time-series store
    ships (`first`/`last` by event time plus min/max/sum per bucket).

    Open and close are argmin/argmax by (ts, event_id) expressed as
    MIN/MAX over a struct whose leading fields are the ordering key —
    they collapse map-side like any other min/max, so the shuffle carries
    one partial candle per (type, hour, map task) instead of raw ticks,
    and no window sort over the event stream is needed (the oracle's
    ROW_NUMBER formulation is the semantic spec, not the plan).  Volume
    sums exact DECIMAL(18,2) (the tick values are 2 dp) so the candle is
    bit-reproducible at any parallelism.  At 100 TB this is one keyed
    shuffle of bounded partials: |event_types| x |hours| x |map tasks|.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_h"),
        "ts",
        "event_id",
        "value",
    )
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return e.groupBy("event_type", "bucket_h").agg(
        first_s.getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        last_s.getField("value").alias("close"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SCD2_PIT_ORACLE = """
WITH w AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, event_type AS attr, ts, event_id FROM w
  WHERE prev IS NULL OR prev <> event_type
), dim AS (
  SELECT user_id, attr, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS version
  FROM changes
)
SELECT f.event_id, f.user_id, f.ts, d.attr AS prior_attr, d.version
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') f
LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from < f.ts
 AND (d.valid_to IS NULL OR d.valid_to >= f.ts)
"""


@query("join_scd2_pit", oracle=_SCD2_PIT_ORACLE, tags=("join", "scd", "timeseries"))
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) dimension lookup against the SCD2 build — the
    leakage-safe enrichment a feature pipeline needs: each purchase gets
    the attribute regime in effect STRICTLY BEFORE its timestamp
    (`valid_from < ts ≤ COALESCE(valid_to, ∞)` — provably unique: an
    interval starting at ts itself never matches, so a fact can never see
    state written at or after its own event time).  Facts whose user has
    no earlier regime keep NULL via the left join.

    Scale: the join is EQUI on user_id with the validity range as a
    residual — fan-out per fact is the user's version count (bounded by
    per-user change frequency, never corpus-sized), and both sides
    shuffle once on the same key.  No broadcast of the corpus-sized
    dimension, no binning needed."""
    dim = scd2_build(spark, sf_dir).select(
        F.col("user_id").alias("d_user_id"),
        F.col("attr"),
        "valid_from",
        "valid_to",
        F.col("version").cast("int").alias("version"),
    )
    facts = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    cond = (
        (F.col("d_user_id") == F.col("user_id"))
        & (F.col("valid_from") < F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") >= F.col("ts")))
    )
    return facts.join(dim, cond, "left").select(
        "event_id", "user_id", "ts", F.col("attr").alias("prior_attr"), "version"
    )


_INTERP_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS dval
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT CAST(UNNEST(generate_series(
        (SELECT MIN(CAST(ts AS DATE)) FROM events),
        (SELECT MAX(CAST(ts AS DATE)) FROM events),
        INTERVAL 1 DAY)) AS DATE) AS day
  ) d
),
filled AS (
  SELECT s.event_type, s.day, dv.dval,
         LAST_VALUE(dv.dval IGNORE NULLS) OVER wb AS pv,
         LAST_VALUE(CASE WHEN dv.dval IS NOT NULL THEN s.day END IGNORE NULLS)
           OVER wb AS pd,
         FIRST_VALUE(dv.dval IGNORE NULLS) OVER wf AS nv,
         FIRST_VALUE(CASE WHEN dv.dval IS NOT NULL THEN s.day END IGNORE NULLS)
           OVER wf AS nd
  FROM spine s LEFT JOIN daily dv
    ON s.event_type = dv.event_type AND s.day = dv.day
  WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY s.event_type ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       CASE WHEN dval IS NOT NULL THEN CAST(dval AS DOUBLE)
            ELSE CAST(pv * (date_diff('day', pd, nd) - date_diff('day', pd, day))
                      + nv * date_diff('day', pd, day) AS DOUBLE)
                 / CAST(date_diff('day', pd, nd) AS DOUBLE)
       END AS value,
       CASE WHEN dval IS NOT NULL THEN 'observed' ELSE 'interp' END AS src
FROM filled
WHERE dval IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
"""


@query("events_interpolate", oracle=_INTERP_ORACLE, tags=("events", "timeseries"))
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gap days on the daily spine — the
    time-series densify that `events_gap_fill`'s carry-forward cannot
    express (sensor/metric series want the value *between* neighbors,
    not the stale last one).  Interior gap days get
    ``prev + (next - prev) * j / n``; leading/trailing gaps (no neighbor
    on one side) are dropped; observed days pass through tagged
    ``observed``.

    Exactness: the interpolation numerator ``pv*(n-j) + nv*j`` is
    computed in DECIMAL (exact integer/decimal arithmetic on both
    engines) and only the final division happens in binary64, so Spark
    and DuckDB produce bit-identical doubles and the value hash is
    stable — the same discipline as the decimal-exact aggregates
    (exprs.py).

    Scale: identical shape to `events_gap_fill` — the spine is
    calendar-bounded (broadcast), the fact table collapses to per-day
    partials map-side, and both window passes share the one
    (event_type)-keyed shuffle; per-partition frames are
    days-per-type-sized, never data-sized."""
    e = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return interpolate_daily(e)


def interpolate_daily(e: DataFrame) -> DataFrame:
    """Core of `events_interpolate` over any (event_type, day, value)
    frame — factored out so tests can drive it with sparse synthetic
    series (the parquet fixtures are gap-free at small SFs)."""
    daily = e.groupBy("event_type", "day").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("dval")
    )
    bounds = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    spine = e.select("event_type").distinct().crossJoin(F.broadcast(days))
    filled = spine.join(daily, ["event_type", "day"], "left")
    wb = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    observed_day = F.when(F.col("dval").isNotNull(), F.col("day"))
    annotated = filled.select(
        "event_type",
        "day",
        "dval",
        F.last("dval", ignorenulls=True).over(wb).alias("pv"),
        F.last(observed_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("dval", ignorenulls=True).over(wf).alias("nv"),
        F.first(observed_day, ignorenulls=True).over(wf).alias("nd"),
    )
    n = F.datediff(F.col("nd"), F.col("pd"))
    j = F.datediff(F.col("day"), F.col("pd"))
    interp = (
        (F.col("pv") * (n - j) + F.col("nv") * j).cast("double")
        / n.cast("double")
    )
    return annotated.filter(
        F.col("dval").isNotNull()
        | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
    ).select(
        "event_type",
        "day",
        F.when(F.col("dval").isNotNull(), F.col("dval").cast("double"))
        .otherwise(interp)
        .alias("value"),
        F.when(F.col("dval").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interp"))
        .alias("src"),
    )


_INTERVAL_UNION_ORACLE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + (60 + CAST(FLOOR(value) AS BIGINT) % 1800) * 1000000 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
), spans AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS span_us
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(span_us) AS BIGINT) AS covered_us,
       CAST(MAX(span_us) AS BIGINT) AS longest_us,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM spans GROUP BY user_id
"""


@query(
    "events_interval_union",
    oracle=_INTERVAL_UNION_ORACLE,
    tags=("events", "timeseries", "interval"),
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered time per user across OVERLAPPING activity intervals
    — the interval-union aggregate (union length of [start, end) spans:
    billable uptime, listening time, connected time).  Naive
    sessionization double-counts overlaps; the classic fix is the
    sweep-line: order each user's intervals by start, carry the running
    MAX of interval ends over all PRIOR rows, open a new island exactly
    when the next start clears every end seen so far, then one
    aggregation per island and one per user.

    Scale shape: a single (user_id)-keyed shuffle feeds both windows
    (same partition + order), then two keyed aggregations — no self
    join, no explode of the time axis (a per-second explode would be
    O(total duration); this is O(rows)).  All arithmetic is exact
    integer MICROSECONDS (`unix_micros`), and the interval length is a
    deterministic function of the row (60s + floor(value) mod 1800), so
    the DuckDB oracle (epoch_us, same windows) replays bit-for-bit.
    Reference parity: analytic-eval window scope, SURVEY §2B windows."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = table(spark, sf_dir, "events").select(
        "user_id",
        us.alias("s"),
        (us + (F.lit(60) + F.floor("value").cast("long") % 1800) * 1000000).alias(
            "e"
        ),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = e.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    spans = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("span_us")
    )
    return spans.groupBy("user_id").agg(
        F.sum("span_us").cast("long").alias("covered_us"),
        F.max("span_us").cast("long").alias("longest_us"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )
