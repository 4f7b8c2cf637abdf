"""Co-occurrence / mode / outlier analytics (SURVEY.md §2B aggregation+join
surface, beyond the reference slice's scan operators).

The reference feeds Impala's aggregation and join nodes (expr.h:241,
descriptors.h:371-373); these queries exercise the same surface with the
shapes a warehouse workload actually runs: self-join market-basket pair
counts, exact per-group mode via a single argmax aggregate, and
population-statistics outlier flagging from exact decimal moments.

Scale notes (100 TB): the basket self-join shuffles once on the order key
(bounded fan-out per order — no skew explosion), the pair aggregation
map-side combines before its shuffle, and both the mode and z-score
queries are two-phase hash aggregates; the z-score stats table is tiny and
broadcast back, so the detail table is scanned exactly twice with no wide
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query


@query(
    "basket_pair_affinity",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM items a
JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 50
""",
    tags=("join", "aggregate", "affinity"),
)
def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 part pairs bought together in the same order (market-basket
    co-occurrence).

    One equi-join shuffle on the order key — the per-order item fan-out is
    bounded (≤7 lineitems), so the pair expansion cannot blow up a
    partition at any scale; pair counting then map-side combines before
    the final aggregate.  Deterministic total order (count desc, then both
    keys) makes the LIMIT stable.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "agg_mode_argmax",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, user_id, n,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rn
  FROM c
)
SELECT event_type, CAST(user_id AS BIGINT) AS mode_user, n AS n_events
FROM r WHERE rn = 1
""",
    tags=("aggregate", "mode"),
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent user per event type) with a
    deterministic smallest-id tiebreak.

    A single `max(struct(count, -user_id))` argmax aggregate replaces the
    row_number-window plan the oracle uses — one fewer shuffle and no
    per-group sort, the same pattern that paid off for the IVF argmax.
    """
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy("event_type")
        .agg(
            F.max(
                F.struct(F.col("n"), (-F.col("user_id")).alias("neg_uid"))
            ).alias("m")
        )
        .select(
            "event_type",
            (-F.col("m.neg_uid")).cast("bigint").alias("mode_user"),
            F.col("m.n").alias("n_events"),
        )
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DOUBLE) AS sxx
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - m.sx / m.n)
         / SQRT((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 9) AS zscore
FROM events e JOIN m ON e.event_type = m.event_type
WHERE ABS(ROUND((e.value - m.sx / m.n)
          / SQRT((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 9)) > 2.0
""",
    tags=("aggregate", "statistics", "outlier"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value is >2σ from their event-type mean.

    Moments (n, Σx, Σx²) accumulate in exact DECIMAL so the parallel
    partial aggregation is bit-reproducible (exprs.py discipline); the
    tiny per-type stats table is broadcast back onto the event stream, so
    the plan is scan → agg → broadcast-join → filter with no wide shuffle
    of the detail rows.  The z-score is rounded to 9 dp on both sides:
    the wide-decimal Σx² → double conversion differs by 1 ulp between
    engines, and rounding keeps the compare (and the 2σ membership test)
    deterministic.
    """
    v = F.col("value").cast("decimal(18,6)")
    m = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(v).cast("double").alias("sx"),
            F.sum(v * v).cast("double").alias("sxx"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = F.round(
        (F.col("value") - sx / n)
        / F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))),
        9,
    )
    return (
        table(spark, sf_dir, "events")
        .join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > F.lit(2.0))
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


MAD_K = 3.0
MAD_SCALE = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normals

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type,
         ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 9) AS med9
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         ROUND(quantile_cont(ABS(e.value - m.med9), 0.5), 9) AS mad9
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.med9
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - med.med9) / ({MAD_SCALE} * mad.mad9), 9) AS robust_z
FROM events e
JOIN med USING (event_type)
JOIN mad USING (event_type)
WHERE mad.mad9 > 0
  AND ABS(ROUND((e.value - med.med9) / ({MAD_SCALE} * mad.mad9), 9)) > {MAD_K}
"""


@query(
    "events_anomaly_mad",
    oracle=_MAD_ORACLE,
    tags=("aggregate", "statistics", "outlier"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flagging by median absolute deviation — the
    companion to `events_anomaly_zscore` for the case that matters at
    100 TB: z-scores are poisoned by the very outliers they hunt (one
    10^9 reading inflates sigma until nothing is anomalous), while the
    median/MAD breakdown point is 50%.  Flags |x - med| > {MAD_K} *
    {MAD_SCALE} * MAD (the normal-consistency scaling).

    Plan: two (event_type)-keyed percentile aggregations (median, then
    MAD of residuals against the broadcast median) and one broadcast
    join back onto the detail rows — the per-type stats tables are
    |types|-sized, so detail rows shuffle zero times.  Determinism:
    interpolated medians differ by ulps between engines' (a+b)/2
    association, so med and MAD are rounded to 9 dp BEFORE use and the
    score is rounded to 9 dp (the zscore discipline); zero-MAD types
    (constant-valued) are excluded on both sides rather than dividing
    by zero."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value").cast("double"), F.lit(0.5)), 9).alias(
            "med9"
        )
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med9")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med9")), F.lit(0.5)), 9
            ).alias("mad9")
        )
        .select("event_type", "mad9")
    )
    rz = F.round(
        (F.col("value") - F.col("med9")) / (F.lit(MAD_SCALE) * F.col("mad9")), 9
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter((F.col("mad9") > 0) & (F.abs(rz) > F.lit(MAD_K)))
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
    )
