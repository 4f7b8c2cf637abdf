"""As-of (time-travel) join — an operator Spark lacks natively
(pyspark guide 'Common OLAP patterns'), composed from built-in ops.

Semantics: for each left row, attach the single right row with the same
key and the greatest right_time <= left_time (classic backward as-of).

Implementation (scale-first): union the two sides tagged by origin, sort
within each key partition by (time, origin), and carry the most recent
right row forward with last(..., ignorenulls) over a running window.
Compared with the per-group `pd.merge_asof` alternative this stays fully
JVM-side, needs exactly ONE shuffle (by key), and never materializes a
group in memory — it streams, so a key with 10^9 rows is fine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Backward as-of join: left columns + the latest right_values at or
    before each left row's time (NULL when no right row precedes it).

    Tie-breaking: a right row with right_time == left_time qualifies
    (<=, matching DuckDB's ASOF JOIN ... ON r.t <= l.t)."""
    lhs = left.withColumn("__origin", F.lit(1)).withColumn("__t", F.col(left_time))
    rhs_cols = [F.col(key), F.col(right_time).alias("__t"), F.lit(0).alias("__origin")]
    rhs = right.select(*rhs_cols, *[F.col(c).alias(f"__r_{c}") for c in right_values])
    # align schemas for the union
    for c in left.columns:
        if c not in (key,):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_values:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))
    # right rows sort before left rows at equal time (__origin 0 < 1), so
    # an equal-time right row is visible to the left row — the <= contract
    w = (
        W.partitionBy(key)
        .orderBy("__t", "__origin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_values
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_values
    ]
    return carried.filter(F.col("__origin") == 1).select(*out_cols)


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       v.ts AS asof_ts, v.event_id AS asof_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@query("join_asof_events", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent prior view by the same user —
    the canonical as-of use (attribution).  DuckDB's native ASOF JOIN is
    the oracle; the Spark side uses the union+carry-forward composition."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "event_id"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "value",
        F.col("asof_ts"), F.col("asof_event_id"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of join: left columns + the EARLIEST right_values at or
    after each left row's time (NULL when nothing follows) — the
    "next event" direction (next reading after a request, next quote
    after an order).  Same single-shuffle union+carry composition as the
    backward form, mirrored: right rows sort after left rows at equal
    time (>= contract) and `first(ignorenulls)` looks forward over
    (currentRow, unboundedFollowing).  ``tiebreak`` (a right_values
    column name) makes the pick deterministic when several right rows
    share one timestamp."""
    lhs = left.withColumn("__origin", F.lit(0)).withColumn("__t", F.col(left_time))
    rhs_cols = [F.col(key), F.col(right_time).alias("__t"), F.lit(1).alias("__origin")]
    rhs = right.select(*rhs_cols, *[F.col(c).alias(f"__r_{c}") for c in right_values])
    for c in left.columns:
        if c not in (key,):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_values:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))
    order = ["__t", "__origin"] + ([f"__r_{tiebreak}"] if tiebreak else [])
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_values
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_values
    ]
    return carried.filter(F.col("__origin") == 0).select(*out_cols)


_ASOF_FWD_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
j AS (
  SELECT p.event_id, p.user_id, p.ts, p.value,
         v.ts AS asof_ts, v.event_id AS asof_event_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.ts, v.event_id) AS rn
  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts >= p.ts
)
SELECT event_id, user_id, ts, value, asof_ts, asof_event_id
FROM j WHERE rn = 1
"""


@query("join_asof_forward", oracle=_ASOF_FWD_ORACLE, tags=("join", "asof"))
def join_asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the next view by the same user at or after the
    purchase time — the forward as-of direction (e.g. "did the user come
    back?").  The oracle is the window formulation (earliest qualifying
    row per left row, event_id tiebreak)."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return asof_join_forward(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "event_id"],
        tiebreak="event_id",
    ).select(
        "event_id", "user_id", "ts", "value",
        F.col("asof_ts"), F.col("asof_event_id"),
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: Column,
) -> DataFrame:
    """Backward as-of join with a staleness bound (pandas merge_asof's
    ``tolerance``): the latest prior right row counts only if it is within
    `tolerance` (an INTERVAL expression for timestamps, a numeric Column
    for integer times) of the left time; older matches null out.
    Composition: the plain as-of carry, then a post-filter — correct
    because the carried row is THE latest prior row, so if it is too
    stale no in-window match exists.  Adds zero shuffles."""
    carried = asof_join(left, right, key, left_time, right_time, right_values)
    # the carried right timestamp must be among right_values for the bound
    fresh = F.col(f"asof_{right_time}") >= (F.col(left_time) - tolerance)
    out = carried
    for c in right_values:
        out = out.withColumn(
            f"asof_{c}", F.when(fresh, F.col(f"asof_{c}"))
        )
    return out


_ASOF_TOL_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR THEN v.ts END AS asof_ts,
       CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR THEN v.event_id END
         AS asof_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "asof"))
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution with a 1-hour staleness window: a purchase is credited
    to the most recent prior view only if that view happened within the
    hour (stale views null out) — the bounded-lookback form every
    time-series feature join needs to avoid leaking ancient context.
    Same single-shuffle plan as `join_asof_events`; the tolerance is a
    post-carry column expression."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return asof_join_tolerance(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "event_id"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).select(
        "event_id", "user_id", "ts", "value", "asof_ts", "asof_event_id"
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'): for
    each left row, the single right row with the same key whose time is
    CLOSEST in absolute distance; an exact backward/forward distance tie
    breaks backward (matching pandas).  The backward candidate uses the
    <= contract, the forward candidate the strict > contract, so an
    equal-time right row is credited to the backward side exactly once.

    Still ONE shuffle: both directional candidates come out of the same
    tagged union — right rows sort before left rows at equal time, so a
    backward `last(ignorenulls)` over (unboundedPreceding, currentRow)
    sees equal-time right rows while a forward `first(ignorenulls)` over
    (currentRow, unboundedFollowing) does not.  The nearest pick is then
    a row-local CASE on the two carried timestamps — no second shuffle,
    no join.  Callers that need deterministic results must ensure right
    rows are unique per (key, time) (dedupe first); the carry itself is
    then total-ordered."""
    lhs = left.withColumn("__origin", F.lit(1)).withColumn("__t", F.col(left_time))
    rhs_cols = [
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__origin"),
        # the right time rides along under its own name so the distance
        # CASE works even when callers don't list it in right_values
        F.col(right_time).alias("__rt"),
    ]
    rhs = right.select(*rhs_cols, *[F.col(c).alias(f"__r_{c}") for c in right_values])
    for c in left.columns:
        if c not in (key,):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    lhs = lhs.withColumn("__rt", F.lit(None).cast(dict(right.dtypes)[right_time]))
    for c in right_values:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))
    wb = (
        W.partitionBy(key)
        .orderBy("__t", "__origin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key)
        .orderBy("__t", "__origin")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.last("__rt", ignorenulls=True).over(wb).alias("__b_t"),
        F.first("__rt", ignorenulls=True).over(wf).alias("__f_t"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in right_values
        ],
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in right_values
        ],
    ).filter(F.col("__origin") == 1)
    # distances in exact integer microseconds; tie -> backward (<=)
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    take_b = F.col("__f_t").isNull() | (
        F.col("__b_t").isNotNull()
        & (_us(left_time) - _us("__b_t") <= _us("__f_t") - _us(left_time))
    )
    out_cols = [c for c in left.columns] + [
        F.when(take_b, F.col(f"__b_{c}"))
        .otherwise(F.col(f"__f_{c}"))
        .alias(f"nearest_{c}")
        for c in right_values
    ] + [
        F.when(F.col("__b_t").isNull() & F.col("__f_t").isNull(), F.lit(None))
        .when(take_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .cast("string")
        .alias("direction")
    ]
    return carried.select(*out_cols)


_ASOF_NEAREST_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, MIN(event_id) AS event_id FROM events
      WHERE event_type = 'view' GROUP BY user_id, ts),
b AS (
  SELECT p.event_id, v.ts AS bts, v.event_id AS bid,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.ts DESC) AS rn
  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
),
f AS (
  SELECT p.event_id, v.ts AS fts, v.event_id AS fid,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.ts ASC) AS rn
  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts > p.ts
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
            WHEN fts IS NULL THEN bts
            WHEN bts IS NULL THEN fts
            WHEN epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts)
            THEN bts ELSE fts END AS nearest_ts,
       CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
            WHEN fts IS NULL THEN bid
            WHEN bts IS NULL THEN fid
            WHEN epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts)
            THEN bid ELSE fid END AS nearest_event_id,
       CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
            WHEN fts IS NULL THEN 'backward'
            WHEN bts IS NULL THEN 'forward'
            WHEN epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts)
            THEN 'backward' ELSE 'forward' END AS direction
FROM p
JOIN (SELECT * FROM b WHERE rn = 1) b USING (event_id)
JOIN (SELECT * FROM f WHERE rn = 1) f USING (event_id)
"""


@query("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the view by the same user CLOSEST in time in
    either direction (merge_asof direction='nearest'), with the emitted
    `direction` column pinning the tie rule (equal distance -> backward,
    pandas semantics).  Completes the as-of family: backward
    (`join_asof_events`), forward (`join_asof_forward`), bounded
    (`join_asof_tolerance`), nearest.  Views are deduped to one per
    (user_id, ts) (min event_id) on BOTH engines so the nearest pick is
    a total order.  The oracle replays both directional candidates with
    explicit window formulations and the same integer-microsecond
    distance CASE."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("event_id"))
    )
    return asof_join_nearest(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "event_id"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("nearest_ts"),
        F.col("nearest_event_id"),
        "direction",
    )
