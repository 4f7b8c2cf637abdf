"""Change-data-capture materialization and robust (winsorized) aggregation.

`merge_cdc_snapshot` is the batch form of the warehouse MERGE/upsert the
reference's users run through Impala's front-end (SURVEY.md §3): a
changelog stream keyed by entity is collapsed latest-wins into the current
snapshot, with tombstone rows deleting the key.  The Spark formulation is
a single `max(struct(...))` argmax aggregation — ONE keyed shuffle with
map-side partial aggregation, deliberately NOT a window + filter (a window
sorts and shuffles every changelog row; the argmax combines within each
scan partition first, so at 100 TB only one candidate row per key per
partition reaches the exchange).

`agg_winsorize` clamps a measure to its per-group exact [p05, p95] ranks
before summing — the standard robust-sum guard against corrupt extreme
values in metric pipelines.  Exact rank boundaries require a per-group
sort (one window shuffle); at 100 TB you'd swap the boundary pass for the
`agg_approx` percentile sketch and keep the clamp+sum stage unchanged —
the two-pass shape (tiny bounds side broadcast back onto the fact scan)
is the part that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

#: event_type acting as the delete marker in the changelog reading of
#: `events` (user_id = key, ts/event_id = monotone version).
TOMBSTONE = "error"

_CDC_ORACLE = f"""
SELECT user_id,
       ts AS last_ts,
       event_id AS last_event_id,
       event_type AS last_type,
       value AS last_value
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) v
WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
"""


@query("merge_cdc_snapshot", oracle=_CDC_ORACLE, tags=("cdc", "events", "merge"))
def merge_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse the `events` changelog to the current per-user snapshot:
    latest row per user_id by (ts, event_id) wins; a '{TOMBSTONE}'-typed
    latest row is a tombstone and deletes the key from the snapshot.

    (ts, event_id) is a total order (event_id is unique), so the argmax is
    deterministic; the struct max is associative, so Spark's partial
    aggregation gives the same winner at any parallelism.  The oracle is
    the equivalent ROW_NUMBER latest-wins formulation."""
    e = table(spark, sf_dir, "events")
    last = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value")
                )
            ).alias("last")
        )
    )
    return (
        last.filter(F.col("last.event_type") != TOMBSTONE)
        .select(
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_type"),
            F.col("last.value").alias("last_value"),
        )
    )


_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         MAX(n) AS n,
         MAX(CASE WHEN rn = GREATEST(1, (n * 5) // 100) THEN value END) AS lo,
         MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_type, b.n, b.lo, b.hi,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi)
                     AS DECIMAL(12,2))) AS DOUBLE) AS sum_winsorized,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_raw
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type, b.n, b.lo, b.hi
"""


@query("agg_winsorize", oracle=_WINSOR_ORACLE, tags=("agg", "robust", "events"))
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group sum of `value`: clamp each row to the exact
    rank-based [p05, p95] of its event_type, then sum in exact decimal
    (the fixture stores 2-decimal values, so the cast is lossless and the
    sum is order-independent).

    Boundary ranks: lo = max(1, floor(0.05·n)), hi = ceil(0.95·n) over
    the total order (value, event_id) — integer arithmetic only, so both
    engines pick the identical boundary rows."""
    e = table(spark, sf_dir, "events")
    wp = W.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(wp.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == F.greatest(F.lit(1), F.expr("(n * 5) div 100")), F.col("value"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("value"))
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(clamped.cast("decimal(12,2)")).cast("double").alias("sum_winsorized"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_raw"),
        )
        .select("event_type", "n", "lo", "hi", "sum_winsorized", "sum_raw")
    )
