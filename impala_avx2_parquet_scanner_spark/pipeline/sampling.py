"""Training-mix sampling, context-window packing, and deterministic
corpus shuffling — the last-mile operators between a curated corpus and
an actual training run.

All three are pure DataFrame→DataFrame plans built on the engine's
portable hash (`dedup.h64`, MD5-derived so the DuckDB oracle replays it
exactly; seeded by a per-operator string prefix, never `rand()`, so every
result is reproducible on any cluster size and any retry — the property a
100 TB pipeline needs when a stage is re-executed after executor loss).

Scale notes:
- `sample_stratified` is a scan-side filter (no shuffle at all): the
  keep/drop decision is a column expression on (doc_id, lang), so it
  fuses into the parquet scan stage and the downstream pipeline only ever
  sees the sampled subset.
- `pack_token_budget` shuffles once on `source` (the packing stream key);
  the running sum is a partitioned window, never a global one. Bin
  boundaries depend only on (source, doc_id) order, so packing is stable
  under re-partitioning.
- `shuffle_deterministic` derives a hash bucket (1024-way) and ranks
  inside each bucket — a partitioned window, NOT a global row_number
  (which would funnel 100 TB through one task). (bucket, pos) is a total
  order usable as a training read order.

Reference parity: sampling/packing are beyond the reference slice
(north-star pipeline surface); the hash discipline mirrors the
reference's deterministic CRC/Murmur usage (hash-util.h:44-65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.functions.text import token_count
from impala_avx2_parquet_scanner_spark.pipeline.dedup import _SQL_H64, h64
from impala_avx2_parquet_scanner_spark.registry import query

_SAMPLE_KEY = _SQL_H64.format(x="'samp:' || CAST(doc_id AS VARCHAR)")

_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE ({_SAMPLE_KEY} % 100) < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
"""


@query("sample_stratified", oracle=_STRATIFIED_ORACLE, tags=("pipeline", "sampling"))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum rate sampling (training-mix control).

    English is downsampled to 10%, every other language kept at 50% —
    the standard move when rebalancing a web corpus.  The keep decision
    is `hash(doc_id) % 100 < rate(lang)`: a pure column expression, so
    Catalyst fuses it into the scan stage (zero shuffle) and the sample
    is identical across retries, partitionings, and engines."""
    d = table(spark, sf_dir, "documents")
    key = h64(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(50))
    return d.filter((key % 100) < rate).select("doc_id", "lang")


_PACK_ORACLE = """
WITH toks AS (
  SELECT source, doc_id,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                    / 2048.0) AS BIGINT) AS chunk_id
  FROM toks
)
SELECT source, chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, chunk_id
"""


@query("pack_token_budget", oracle=_PACK_ORACLE, tags=("pipeline", "sampling", "window"))
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2048-token context-window chunks per source.

    A document lands in the chunk its *starting* token offset falls in
    (running-sum window ÷ budget) — the streaming-cumsum approximation of
    greedy bin packing: chunks can overflow by at most one document,
    which is the standard scalable formulation (exact greedy packing is
    inherently sequential).  One shuffle on `source`; the window and the
    final per-chunk rollup reuse the same partitioning."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", token_count(F.col("text")).alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = toks.withColumn(
        "chunk_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048.0)),
    )
    return packed.groupBy("source", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_SHUF_KEY = _SQL_H64.format(x="'shuf:' || CAST(doc_id AS VARCHAR)")

_SHUFFLE_ORACLE = f"""
SELECT doc_id, bucket,
       ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY skey, doc_id) AS pos
FROM (
  SELECT doc_id, {_SHUF_KEY} AS skey, ({_SHUF_KEY} % 1024) AS bucket
  FROM documents
)
"""


@query("shuffle_deterministic", oracle=_SHUFFLE_ORACLE, tags=("pipeline", "sampling"))
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: 1024 hash buckets + in-bucket rank.

    (bucket, pos) is a reproducible pseudo-random total read order for
    training.  The rank is a window PARTITIONED by bucket — each bucket
    sorts independently (≈ corpus/1024 rows per task), unlike a global
    row_number which would serialize the entire corpus through one
    partition.  Seeded by the 'shuf:' prefix; swap the prefix to get an
    independent epoch permutation."""
    d = table(spark, sf_dir, "documents")
    key = h64(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", key.alias("skey"), (key % 1024).alias("bucket"))
    pos = F.row_number().over(W.partitionBy("bucket").orderBy("skey", "doc_id"))
    return keyed.select("doc_id", "bucket", pos.alias("pos"))


_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, source,
         {_SQL_H64.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100
           AS bucket
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM assigned
"""


@query("sample_split_assign", oracle=_SPLIT_ORACLE, tags=("pipeline", "sampling"))
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split assignment: bucket =
    h64('split:' || doc_id) mod 100 — a pure projection over the scan,
    no shuffle, no RNG state.

    Hash-based assignment is the only split that survives a distributed
    re-run: it is stable under re-partitioning, incremental ingestion
    (new docs don't reshuffle old assignments), and retries — the
    properties `rand()`-based splits lack.  The salt prefix decorrelates
    this split from every other h64 use (minhash, sampling)."""
    d = table(spark, sf_dir, "documents")
    bucket = h64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return d.select(
        "doc_id",
        "source",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_WEIGHTED_KEY = _SQL_H64.format(x="'wsamp:' || CAST(doc_id AS VARCHAR)")

_WEIGHTED_ORACLE = f"""
SELECT doc_id, n_chars,
       CAST(LEAST(n_chars * 300, 1000000) AS DOUBLE) / 1000000.0 AS p_keep
FROM documents
WHERE ({_WEIGHTED_KEY} % 1000000) < LEAST(n_chars * 300, 1000000)
"""


@query("sample_weighted", oracle=_WEIGHTED_ORACLE, tags=("pipeline", "sampling"))
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted sampling: inclusion probability
    proportional to document size (capped at 1) — the standard move when
    long documents should dominate a token-budgeted mix without a
    separate pass to compute token counts.

    keep ⇔ hash(doc_id) mod 1e6 < min(n_chars·300, 1e6): pure integer
    arithmetic on scan columns, so the decision fuses into the scan
    (zero shuffle), replays identically on any cluster size/retry, and
    the DuckDB oracle reproduces it bit-for-bit.  The emitted `p_keep`
    documents each row's inclusion probability for downstream
    importance-weighting (1/p_keep loss scaling)."""
    d = table(spark, sf_dir, "documents")
    key = h64(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    cap = F.least(F.col("n_chars") * 300, F.lit(1000000))
    return (
        d.filter((key % 1000000) < cap)
        .select(
            "doc_id",
            "n_chars",
            (cap.cast("double") / 1000000.0).alias("p_keep"),
        )
    )


_MIX_ORACLE = """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS BIGINT)) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources
  FROM per_src
),
shares AS (
  SELECT source, n_docs, tokens,
         GREATEST((tokens * 1000000) // total_tokens, 1) AS share_ppm,
         1000000 // n_sources AS target_ppm
  FROM per_src CROSS JOIN tot
),
weights AS (
  SELECT *, LEAST(1000000, (target_ppm * 1000000) // share_ppm) AS weight_ppm
  FROM shares
)
SELECT source, n_docs, tokens, share_ppm, target_ppm, weight_ppm,
       (tokens * weight_ppm) // 1000000 AS expected_tokens
FROM weights
"""


@query("curate_source_mix", oracle=_MIX_ORACLE, tags=("pipeline", "sampling"))
def curate_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: per-source token shares vs a uniform
    target mix, and the downsampling weight that achieves it — the
    planning step before `sample_stratified` runs with these weights.

    All arithmetic is fixed-point parts-per-million integer division
    (`div`), so the plan and its DuckDB oracle agree bit-for-bit:
    share_ppm = source tokens / corpus tokens (floored, min 1 ppm to keep
    the weight division total at extreme skew), weight_ppm =
    min(1, target/share) — over-represented sources get weight < 1,
    under-represented ones stay at 1 (this operator never upsamples).

    Scale shape: one groupBy(source) over scan-side token counts, then a
    single-row totals aggregate broadcast back over the per-source table
    (sources number in the thousands at most) — no second pass over the
    corpus, no wide shuffle beyond the keyed rollup."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("tokens"),
    )
    tot = per_src.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.expr("greatest((tokens * 1000000) div total_tokens, 1)").alias("share_ppm"),
            F.expr("1000000 div n_sources").alias("target_ppm"),
        )
        .withColumn(
            "weight_ppm",
            F.expr("least(1000000, (target_ppm * 1000000) div share_ppm)"),
        )
        .withColumn("expected_tokens", F.expr("(tokens * weight_ppm) div 1000000"))
    )


_FIXED_K_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_SQL_H64.format(x="concat('fk:', CAST(doc_id AS VARCHAR))")}, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, lang, n_chars, rk FROM ranked WHERE rk <= 20
"""


@query("sample_fixed_k", oracle=_FIXED_K_ORACLE, tags=("pipeline", "sampling"))
def sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k-per-group sample (reservoir-sampling
    equivalent, without randomness): the k=20 docs per language with the
    smallest seeded hash are a uniform-without-replacement draw that is
    identical on every run, cluster size, and retry — unlike an actual
    reservoir, which is order-dependent.

    Scale: per-group top-k via window over the group key.  With few,
    huge groups (languages) the single window shuffle would funnel each
    language through one task at 100 TB; the skew-safe form is two-phase
    top-k — rank within (lang, salt) buckets, keep k per bucket, then
    re-rank the k*SALT survivors — same result because the global top-k
    is contained in the union of per-bucket top-ks.  The fixture's
    groups are small, so the plan keeps the direct single-window form
    with the two-phase rewrite documented here."""
    d = table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            h64(F.concat(F.lit("fk:"), F.col("doc_id").cast("string"))), "doc_id"
        )
    )
    return (
        d.select("doc_id", "lang", "n_chars", rk.alias("rk"))
        .filter(F.col("rk") <= 20)
    )
