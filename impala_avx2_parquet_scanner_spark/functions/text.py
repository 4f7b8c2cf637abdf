"""Text-analysis operators over the `documents` table — the training-data
pipeline surface (BASELINE.json north star; beyond the reference slice).

All operators are pure column expressions (JVM-side, codegen'd — no Python
in the hot path) so they stream through a 100 TB scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.cache import tie_unpersist
from impala_avx2_parquet_scanner_spark.catalog import (
    pin_above_spread,
    spread_table,
    table,
)
from impala_avx2_parquet_scanner_spark.registry import query

#: Tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language ID.  Deliberately simple + deterministic (SQL-expressible).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


def token_count(col: F.Column) -> F.Column:
    """Whitespace-token count: number of [A-Za-z0-9]+ runs."""
    return F.size(
        F.filter(F.split(col, r"[^A-Za-z0-9]+"), lambda t: t != F.lit(""))
    ).cast("bigint")


def marker_hits(col: F.Column, word: str) -> F.Column:
    """Occurrences of a whole word (case-insensitive)."""
    return F.regexp_count(F.lower(col), F.lit(rf"\b{word}\b")).cast("bigint")


def lang_score(col: F.Column, lang: str) -> F.Column:
    words = LANG_MARKERS[lang]
    score = marker_hits(col, words[0])
    for w in words[1:]:
        score = score + marker_hits(col, w)
    return score


def lang_id(col: F.Column) -> F.Column:
    """argmax over marker scores, ties broken by language order; 'und' if
    no marker fires."""
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("bigint")
    # forward order + strict > : the incumbent (earlier language) wins ties
    for lang in LANG_MARKERS:
        s = lang_score(col, lang)
        new_best = s > best_score
        best_lang = F.when(new_best, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(new_best, s).otherwise(best_score)
    return best_lang


@query(
    "text_stats",
    oracle=r"""
SELECT doc_id,
       LENGTH(text) AS n_chars_actual,
       n_chars,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(LEN(regexp_extract_all(text, '[.!?,;]')) AS BIGINT) AS n_punct,
       CAST(LEN(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces,
       UPPER(source) AS source_uc
FROM documents
""",
    tags=("text", "pipeline"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics: char/token/punctuation counts —
    the quality-scoring raw features."""
    t = F.col("text")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(t).alias("n_chars_actual"),
        "n_chars",
        token_count(t).alias("n_tokens"),
        F.regexp_count(t, F.lit(r"[.!?,;]")).cast("bigint").alias("n_punct"),
        F.regexp_count(t, F.lit(" ")).cast("bigint").alias("n_spaces"),
        F.upper("source").alias("source_uc"),
    )


@query(
    "text_quality",
    oracle=r"""
SELECT doc_id,
       CASE WHEN LENGTH(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END AS len_ok,
       CASE WHEN LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 20 THEN 1 ELSE 0 END AS tokens_ok,
       CAST(LEN(regexp_extract_all(lower(text), '\bthe\b|\band\b|\bof\b|\bto\b|\ba\b')) AS BIGINT) AS stopword_hits,
       CASE WHEN LENGTH(text) > 0
            THEN CAST(LEN(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / LENGTH(text)
            ELSE 0.0 END AS alpha_ratio
FROM documents
""",
    tags=("text", "pipeline"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gates (length window, token floor, stopword
    presence, alpha ratio) — the standard pre-training corpus filters."""
    t = F.col("text")
    n_alpha = F.regexp_count(t, F.lit("[A-Za-z]")).cast("double")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.length(t).between(100, 20000), 1).otherwise(0).alias("len_ok"),
        F.when(token_count(t) >= 20, 1).otherwise(0).alias("tokens_ok"),
        F.regexp_count(F.lower(t), F.lit(r"\bthe\b|\band\b|\bof\b|\bto\b|\ba\b"))
        .cast("bigint")
        .alias("stopword_hits"),
        F.when(F.length(t) > 0, n_alpha / F.length(t)).otherwise(F.lit(0.0)).alias(
            "alpha_ratio"
        ),
    )


def _lang_sql_score(lang: str) -> str:
    words = "|".join(rf"\b{w}\b" for w in LANG_MARKERS[lang])
    return f"CAST(LEN(regexp_extract_all(lower(text), '{words}')) AS BIGINT)"


_LANG_ORACLE = f"""
SELECT doc_id, lang AS lang_labeled, lang_pred, COUNT(*) OVER (PARTITION BY lang_pred) AS n_pred
FROM (
  SELECT doc_id, lang,
         CASE
           WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
           WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
           WHEN fr >= de AND fr > 0 THEN 'fr'
           WHEN de > 0 THEN 'de'
           ELSE 'und' END AS lang_pred
  FROM (
    SELECT doc_id, lang,
           {_lang_sql_score('en')} AS en,
           {_lang_sql_score('es')} AS es,
           {_lang_sql_score('fr')} AS fr,
           {_lang_sql_score('de')} AS de
    FROM documents
  ) scores
) preds
"""


@query("text_lang_id", oracle=_LANG_ORACLE, tags=("text", "pipeline"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (argmax with first-wins ties) + per-language
    prediction counts via window."""
    docs = table(spark, sf_dir, "documents")
    preds = docs.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
    from pyspark.sql import Window as W

    return preds.withColumn(
        "n_pred", F.count(F.lit(1)).over(W.partitionBy("lang_pred"))
    )


@query(
    "text_vocab",
    oracle="""
SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
FROM (
  SELECT doc_id, unnest(list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS token
  FROM documents
) t
GROUP BY token
""",
    tags=("text", "pipeline"),
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term + document frequency (the word-count
    shape: explode → two-level aggregate; map-side combine keeps the
    shuffle at one row per (partition, token))."""
    t = F.col("text")
    tokens = F.filter(
        F.split(F.lower(F.regexp_replace(t, r"[^A-Za-z0-9]+", " ")), " "),
        lambda x: x != F.lit(""),
    )
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


@query(
    "text_rolling_hash",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(7 AS BIGINT),
                      [CAST(ascii(c) AS BIGINT) for c in string_split(substr(text, 1, 64), '')]),
         (a, b) -> (a * 31 + b) % 2147483647
       ) AS rhash64
FROM documents
""",
    tags=("text", "fingerprint"),
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the first 64 chars
    (base 31, mod 2^31-1, seed 7) — pure integer arithmetic, so Spark's
    `aggregate` and DuckDB's `list_reduce` agree exactly.  The streaming
    form of content hashing when MD5 of the whole document is too heavy."""
    chars = F.filter(
        F.split(F.substring(F.col("text"), 1, 64), ""), lambda c: c != F.lit("")
    )
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    rhash = F.aggregate(
        codes,
        F.lit(7).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % F.lit(2147483647),
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id", rhash.alias("rhash64")
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       MD5(LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS norm_hash,
       SUBSTRING(MD5(text), 1, 8) AS raw_hash8
FROM documents
""",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized document fingerprint: normalize (lowercase, collapse
    non-alnum) then MD5 — the exact-dedup key at corpus scale."""
    t = F.col("text")
    norm = F.lower(F.regexp_replace(t, r"[^A-Za-z0-9]+", " "))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.substring(F.md5(t), 1, 8).alias("raw_hash8"),
    )


#: GPT-2-style pre-tokenizer regex, restricted to the alternation subset
#: that Java regex (Spark) and RE2 (DuckDB) interpret identically:
#: contractions, space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


@query(
    "text_bpe_tokens",
    oracle=r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+')) AS BIGINT) AS n_bpe_tokens,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_ws_tokens
FROM documents
""",
    tags=("text", "pipeline"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (the GPT-2 split
    pattern's engine-portable subset) next to the plain whitespace count —
    the cost-estimation primitive for training-data budgeting.  Pure
    regexp_count, JVM-side, zero shuffles."""
    t = F.col("text")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(t, F.lit(BPE_PATTERN)).cast("bigint").alias("n_bpe_tokens"),
        token_count(t).alias("n_ws_tokens"),
    )


@query(
    "text_tfidf_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, df,
       (CAST(tf AS DOUBLE) * n_docs) / df AS score
FROM tf JOIN dfreq USING (token) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) <= 3
""",
    tags=("text", "pipeline", "window"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (raw inverse
    frequency, no log — `tf * N / df` stays bit-identical across engines,
    where ln() would drift in the last ulp).

    The canonical keyword-extraction shape at corpus scale: explode →
    per-(doc,token) TF → per-token DF → rescore → windowed top-k.  The
    document frequency is a COUNT window over the TF frame partitioned by
    token (not a self-join — one exchange fewer, and no re-shuffle of the
    TF rows back to token partitioning twice); the corpus size N is one
    broadcast row; the top-k window partitions by doc_id so no task ever
    sees more than one document's vocabulary."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    tokens = F.filter(
        F.split(F.lower(F.regexp_replace(t, r"[^A-Za-z0-9]+", " ")), " "),
        lambda x: x != F.lit(""),
    )
    # spread_table (guide §2.5): tokenize+explode+partial-agg fuse into
    # the scan stage; a one-file table runs that CPU in one task.  The
    # corpus count keeps the plain scan (no exchange for a count).
    tf = (
        spread_table(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.explode(tokens).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("token")))
        .crossJoin(F.broadcast(n))
        .withColumn("score", (F.col("tf").cast("double") * F.col("n_docs")) / F.col("df"))
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(lower(regexp_replace(
             text, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks,
         UNNEST(generate_series(1, len(toks), {CHUNK_STRIDE})) AS st
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       (st - 1) // {CHUNK_STRIDE} + 1 AS chunk_id,
       len(list_slice(toks, st, st + {CHUNK_TOKENS} - 1)) AS n_tokens,
       array_to_string(list_slice(toks, st, st + {CHUNK_TOKENS} - 1), ' ')
         AS chunk_text
FROM s
"""


@query("text_chunk_overlap", oracle=_CHUNK_ORACLE, tags=("text", "pipeline"))
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    {CHUNK_TOKENS}-token chunks every {CHUNK_STRIDE} tokens (10-token
    overlap) — the context-window chunking step of a training/RAG
    pipeline, as pure column expressions.

    The chunk starts come from `sequence(1, n_tokens, stride)` exploded
    per document, so chunking is embarrassingly parallel over the scan
    partitioning: no shuffle, no Python, and a document's chunks never
    leave its partition.  Cf. `pack_token_budget` for the inverse
    (packing many short docs into one window)."""
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " "))),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    d = table(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    d = d.filter(F.size("toks") > 0)
    ex = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))).alias("st"),
    )
    chunk = F.slice("toks", F.col("st"), F.lit(CHUNK_TOKENS))
    return ex.select(
        "doc_id",
        (((F.col("st") - 1) / F.lit(CHUNK_STRIDE)).cast("bigint") + 1).alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


_BIGRAM_TOP = 50

_BIGRAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(lower(regexp_replace(
             text, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
uni AS (
  SELECT UNNEST(toks) AS w FROM t
),
uni_counts AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
bi AS (
  SELECT UNNEST(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t WHERE len(toks) >= 2
),
bi_counts AS (SELECT bg, COUNT(*) AS n_ab FROM bi GROUP BY bg),
tot AS (
  SELECT (SELECT COUNT(*) FROM uni) AS n_uni,
         (SELECT COUNT(*) FROM bi) AS n_bi
),
scored AS (
  SELECT b.bg AS bigram, b.n_ab, a.c AS n_a, c2.c AS n_b,
         CAST(b.n_ab * tot.n_uni * tot.n_uni AS DOUBLE)
           / CAST(a.c * c2.c * tot.n_bi AS DOUBLE) AS lift
  FROM bi_counts b
  JOIN uni_counts a ON a.w = string_split(b.bg, ' ')[1]
  JOIN uni_counts c2 ON c2.w = string_split(b.bg, ' ')[2]
  CROSS JOIN tot
)
SELECT bigram, n_ab, n_a, n_b, lift
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_ab DESC, bigram) AS rk
      FROM scored)
WHERE rk <= {_BIGRAM_TOP}
"""


@query("text_bigram_pmi", oracle=_BIGRAM_ORACLE, tags=("text", "pipeline"))
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BIGRAM_TOP} bigram collocations with a PMI-style lift score
    (p(ab) / p(a)p(b)) — the n-gram statistics step of a language-model
    data pipeline.

    The score is a single division of exact integer products
    (c_ab·N_uni² / c_a·c_b·N_bi), so it hash-matches across engines —
    no logs of partial floating sums.  Unigram counts are broadcast into
    the bigram join; the only wide shuffles are the two word-key counts,
    both map-side combined.  At 100 TB the top-k is
    TakeOrderedAndProject, never a global sort."""
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " "))),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    # spread_table (guide §2.5): both explodes' tokenize CPU fuses into
    # the scan stage — spread it; no-op once splits ≥ cores.
    # pin_above_spread: without it Catalyst pushes this projection below
    # the spread exchange and the tokenize runs single-task again.
    d = spread_table(spark, sf_dir, "documents", "doc_id").select(
        pin_above_spread(toks).alias("toks")
    )
    uni = d.select(F.explode("toks").alias("w"))
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bi = d.filter(F.size("toks") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        ).alias("bg")
    )
    bi_counts = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("n_ab"))
    # Totals derive from the count tables (SUM over partials), not from
    # re-aggregating the raw explodes — otherwise Spark re-scans and
    # re-tokenizes the whole corpus once per total.
    tot = uni_counts.agg(F.sum("c").alias("n_uni")).crossJoin(
        bi_counts.agg(F.sum("n_ab").alias("n_bi"))
    )
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    scored = (
        bi_counts.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(F.broadcast(uni_counts.withColumnRenamed("w", "w1")
                          .withColumnRenamed("c", "n_a")), "w1")
        .join(F.broadcast(uni_counts.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c", "n_b")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bg").alias("bigram"),
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n_uni") * F.col("n_uni")).cast("double")
                / (F.col("n_a") * F.col("n_b") * F.col("n_bi")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("n_ab"), "bigram").limit(_BIGRAM_TOP)


_REPETITION_ORACLE = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
counts AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_word_count,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_ratio,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_word_frac
FROM counts GROUP BY doc_id
"""


@query(
    "text_repetition",
    oracle=_REPETITION_ORACLE,
    tags=("text", "pipeline", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: word count, distinct
    words, most-frequent-word count, and the two derived ratios
    (distinct/total, top/total) used to drop degenerately repetitive
    documents from a pre-training corpus.

    Distributed shape: explode → two keyed aggregations, both partitioned
    by `doc_id`, so partials combine map-side and no key ever exceeds one
    document's vocabulary — safe at any corpus size.  Ratios divide two
    exactly-represented integers, so the doubles are bit-identical to the
    oracle's."""
    words = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    )
    counts = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_word_count"),
        (F.count(F.lit(1)).cast("double") / F.sum("c").cast("double")).alias(
            "distinct_ratio"
        ),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top_word_frac"
        ),
    )


_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(lower(regexp_replace(
             text, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
uni AS (SELECT doc_id, UNNEST(toks) AS w FROM t),
uni_counts AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni_counts),
tok_lp AS (
  SELECT u.doc_id,
         CAST(ROUND(LN(CAST(uc.c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS lp
  FROM uni u JOIN uni_counts uc ON u.w = uc.w CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
FROM tok_lp GROUP BY doc_id
"""


@query("text_unigram_logprob", oracle=_LOGPROB_ORACLE, tags=("text", "pipeline"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the KenLM-style perplexity proxy used for quality
    filtering in LLM data pipelines (low mean log-prob ⇒ rare/degenerate
    vocabulary).

    The unigram count table is built once (map-side combined) and
    broadcast back onto the token stream, so the detail explode never
    shuffles; the scalar token total derives from the count table (no
    second corpus scan).  Each token's log-prob is a deterministic double
    rounded to 9 dp and summed in exact DECIMAL, so the per-doc mean is
    bit-reproducible at any parallelism (same discipline as exprs.py)."""
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " "))),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    # spread_table (guide §2.5): scan-fused tokenize CPU; no-op at scale.
    # pin_above_spread: without it Catalyst pushes the tokenize
    # projection below the spread exchange — single-task again.
    u = (
        spread_table(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", pin_above_spread(toks).alias("toks"))
        .select("doc_id", F.explode("toks").alias("w"))
    )
    uc = u.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uc.agg(F.sum("c").cast("bigint").alias("n"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 9
    ).cast("decimal(18,9)")
    return (
        u.join(F.broadcast(uc), "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
        )
    )


_PII_ORACLE = """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           text || ' contact: user' || CAST(doc_id AS VARCHAR)
                || '@example.com tel 5551234' || CAST(doc_id AS VARCHAR),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         '[0-9]{7,}', '<NUM>', 'g') AS scrubbed,
       CAST(LENGTH(regexp_replace(
           text || ' contact: user' || CAST(doc_id AS VARCHAR)
                || '@example.com tel 5551234' || CAST(doc_id AS VARCHAR),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'))
         - LENGTH(text) AS INT) AS delta_after_email
FROM documents WHERE doc_id <= 100
"""


@query("text_pii_scrub", oracle=_PII_ORACLE, tags=("text", "pipeline", "quality"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email addresses and long digit runs replaced with
    placeholder tokens — a standard pre-training redaction pass.  The
    fixture corpus is synthetic (no real PII), so both engines first
    append a deterministic doc-keyed email + phone suffix, then scrub it;
    the oracle replays construction AND redaction, proving the regex
    semantics match (Java regex vs RE2 — patterns restricted to the
    common subset).

    Scale: pure projection (two regexp_replace over the scan), no
    shuffle; regex cost is per-byte and embarrassingly parallel."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 5551234"),
        F.col("doc_id").cast("string"),
    )
    after_email = F.regexp_replace(
        seeded, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"
    )
    return d.select(
        "doc_id",
        F.regexp_replace(after_email, r"[0-9]{7,}", "<NUM>").alias("scrubbed"),
        (F.length(after_email) - F.length("text")).cast("int").alias("delta_after_email"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("scan", "filter", "merge")
BM25_TOP = 10

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(regexp_replace(
             text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS w
  FROM documents
),
per_doc AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl
          FROM per_doc),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok
  WHERE w IN ('scan', 'filter', 'merge')
  GROUP BY doc_id, w
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
contrib AS (
  SELECT t.doc_id,
         CAST(ROUND(
             ROUND(LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 9)
             * ((t.tf * 2.2)
                / (t.tf + 1.2 * (0.25 + (0.75 * p.dl)
                                 / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))),
             9) AS DECIMAL(18,9)) AS c
  FROM tf t JOIN dfreq d USING (w) JOIN per_doc p USING (doc_id)
  CROSS JOIN stats s
),
ranked AS (
  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS bm25,
         ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, doc_id) AS rank
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, bm25, rank FROM ranked WHERE rank <= {BM25_TOP}
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE, tags=("text", "pipeline", "search"))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones, public): top-10
    documents for the fixed query {scan, filter, merge}, k1=1.2, b=0.75.
    The corpus-scale search primitive the TF-IDF query leads into.

    Determinism discipline (same as `text_unigram_logprob`): the only
    transcendental (LN in the IDF) is rounded to 9 dp before use, each
    term's contribution is rounded to 9 dp and cast to DECIMAL(18,9), and
    the per-doc score is an exact decimal SUM — bit-reproducible at any
    parallelism and replayed term-for-term by the oracle.  All remaining
    arithmetic is IEEE double with identical association in both engines.

    Plan shape for 100 TB: ONE explode pass, ONE doc-keyed shuffle — the
    query terms are fixed, so per-doc length AND the per-term TFs fold
    into a single conditional aggregation (count(when w=term)) and the
    token stream is never shuffled or revisited; the tiny doc-level
    result (persisted: one row per doc) is unpivoted to (doc, term, tf)
    and feeds document frequency (|query| rows, broadcast), corpus stats
    (1 row, broadcast), and the scoring join, which needs NO join back
    to a separate length table because dl rides along.  (The round-4
    rewrite: the previous two-aggregation form re-ran the tokenize+
    explode lineage once per consumer — SCALING.md measured 2.12s at
    sf0.1 and a 9.1x wall ratio on the 10x-docs tail corpus before,
    0.53s and 1.0x after.)  The final top-k is
    orderBy+limit -> TakeOrderedAndProject (per-partition heaps, no
    global window); rank is then a window over the collected 10 rows
    only."""
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " ")), " "
        ),
        lambda t: t != F.lit(""),
    )
    # spread_table (guide §2.5): scan-fused tokenize CPU; no-op at scale.
    u = (
        spread_table(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode("toks").alias("w"))
    )
    per_doc = u.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("w") == t, F.lit(1))).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    ).persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    stack_args = ", ".join(f"'{t}', tf_{t}" for t in BM25_TERMS)
    tf = per_doc.selectExpr(
        "doc_id",
        "dl",
        f"stack({len(BM25_TERMS)}, {stack_args}) AS (w, tf)",
    ).filter(F.col("tf") > 0)
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf9 = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    tfn = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / avgdl)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(idf9 * tfn, 9).cast("decimal(18,9)").alias("c"))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("c").alias("c_sum")
    )
    top = (
        scored.orderBy(F.desc("c_sum"), "doc_id")
        .limit(BM25_TOP)
        .select("doc_id", F.col("c_sum").cast("double").alias("bm25"), "c_sum")
    )
    rank = F.row_number().over(W.orderBy(F.desc("c_sum"), "doc_id"))
    out = top.withColumn("rank", rank).select("doc_id", "bm25", "rank")
    return tie_unpersist(out, per_doc)


_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(regexp_replace(
             text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS w
  FROM documents
),
tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY doc_id),
terms AS (
  SELECT tf.doc_id,
         CAST(ROUND((tf.c / CAST(pd.n AS DOUBLE))
                    * ROUND(LN(tf.c / CAST(pd.n AS DOUBLE)), 9), 9)
              AS DECIMAL(18,9)) AS term
  FROM tf JOIN pd USING (doc_id)
)
SELECT doc_id, CAST(-SUM(term) AS DOUBLE) AS word_entropy
FROM terms GROUP BY doc_id
"""


@query("text_entropy", oracle=_ENTROPY_ORACLE, tags=("text", "pipeline", "quality"))
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-level Shannon entropy — the complementary
    degenerate-text signal to `text_repetition` (low entropy ⇒ the doc is
    dominated by few repeated words; used alongside Gopher-style filters).

    Determinism: the LN is rounded to 9 dp before the multiply, each term
    is rounded to 9 dp into DECIMAL(18,9), and the per-doc entropy is an
    exact decimal sum (same discipline as `text_unigram_logprob` /
    `text_bm25_topk`).  Plan: one explode → (doc, word) count, doc totals
    via a doc-keyed re-aggregation of the count table (never the raw
    token stream twice), one doc-keyed final sum."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " ")), " "
        ),
        lambda t: t != F.lit(""),
    )
    # spread_table (guide §2.5): scan-fused tokenize CPU; no-op at scale.
    # pin_above_spread: without it Catalyst pushes the tokenize
    # projection below the spread exchange — single-task again.
    u = (
        spread_table(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", pin_above_spread(toks).alias("toks"))
        .select("doc_id", F.explode("toks").alias("w"))
    )
    tf = u.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    pd_ = tf.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    term = F.round(p * F.round(F.log(p), 9), 9).cast("decimal(18,9)")
    return (
        tf.join(pd_, "doc_id")
        .select("doc_id", term.alias("term"))
        .groupBy("doc_id")
        .agg((-F.sum("term")).cast("double").alias("word_entropy"))
    )


#: BPE merge-training rounds (unrolled; each is one map-side-combinable
#: pair-count shuffle + a 1-row broadcast back onto the vocabulary).
BPE_TRAIN_ROUNDS = 3
BPE_TRAIN_MAX_WORD = 16

_BPE_PAIR_COUNT_SQL = """
  SELECT p[1] AS x, p[2] AS y, CAST(SUM(wcount) AS BIGINT) AS pair_count FROM (
    SELECT wcount, unnest([[syms[i], syms[i+1]] for i in range(1, len(syms))]) AS p FROM (
      SELECT wcount, list_filter(string_split(seq, '||'), s -> s <> '') AS syms FROM {src}
    ) s WHERE len(syms) >= 2
  ) e GROUP BY 1, 2
"""

#: Shared CTE prefix: word-frequency table → 3 unrolled merge rounds
#: (m1/m2/m3).  Used by both the training oracle and the encode oracle.
_BPE_TRAIN_CTES = f"""
words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM (
    SELECT unnest(list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS word
    FROM documents
  ) t WHERE length(word) <= {BPE_TRAIN_MAX_WORD}
  GROUP BY word
),
w0 AS (
  SELECT wcount,
         '||' || array_to_string(list_filter(string_split(word, ''), c -> c <> ''), '||') || '||' AS seq
  FROM words
),
pc1 AS ({_BPE_PAIR_COUNT_SQL.format(src='w0')}),
m1 AS (SELECT x, y, pair_count FROM pc1 ORDER BY pair_count DESC, x, y LIMIT 1),
w1 AS (SELECT wcount, replace(seq, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|') AS seq FROM w0, m1 m),
pc2 AS ({_BPE_PAIR_COUNT_SQL.format(src='w1')}),
m2 AS (SELECT x, y, pair_count FROM pc2 ORDER BY pair_count DESC, x, y LIMIT 1),
w2 AS (SELECT wcount, replace(seq, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|') AS seq FROM w1, m2 m),
pc3 AS ({_BPE_PAIR_COUNT_SQL.format(src='w2')}),
m3 AS (SELECT x, y, pair_count FROM pc3 ORDER BY pair_count DESC, x, y LIMIT 1)
"""

_BPE_TRAIN_ORACLE = f"""
WITH {_BPE_TRAIN_CTES}
SELECT 1 AS step, x, y, x || y AS merged, pair_count FROM m1
UNION ALL SELECT 2, x, y, x || y, pair_count FROM m2
UNION ALL SELECT 3, x, y, x || y, pair_count FROM m3
"""


def _bpe_pair_argmax(vocab: DataFrame) -> DataFrame:
    """Most frequent adjacent symbol pair in a `(wcount, seq)` vocabulary
    (ties broken lexicographically) — one shuffle + TakeOrdered(1)."""
    # Adjacent pairs via zip_with over two slices of a MATERIALIZED syms
    # column: the previous transform(sequence, element_at(syms, i)) form
    # re-evaluated the split+filter subtree per element, interpreted —
    # O(len²) per word (the repo-wide array-HOF trap; cf.
    # exploded_shingles).  zip_with's lambda runs once per element over
    # bound attributes, so the pair build is O(len).
    syms = F.filter(F.split(F.col("seq"), r"\|\|"), lambda s: s != F.lit(""))
    sdf = vocab.select("wcount", syms.alias("syms")).filter(F.size("syms") >= 2)
    pairs = F.zip_with(
        F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1),
        F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    return (
        sdf.select("wcount", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("wcount").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "x", "y")
        .limit(1)
    )


@query("text_bpe_train", oracle=_BPE_TRAIN_ORACLE, tags=("text", "pipeline", "tokenizer"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING at corpus scale (Sennrich et al. 2016): learn the
    top-3 byte-pair merges from the word-frequency table — the tokenizer-
    construction counterpart of `text_bpe_tokens` (which *applies* a fixed
    pre-tokenizer).  Words become `||`-separated symbol sequences; each
    round counts adjacent symbol pairs weighted by word frequency, merges
    the argmax pair (deterministic lexicographic tiebreak), and rewrites
    the vocabulary with a literal left-to-right non-overlapping string
    replace — both engines' `replace` implements exactly BPE's merge-scan
    order, replayed round-for-round by the oracle.

    Scale: training runs on the DISTINCT-word table (vocabulary-sized,
    not corpus-sized — the one corpus pass is the word count); each round
    is one map-side-combinable pair-count shuffle plus a 1-row broadcast
    joined back onto the vocabulary.  Rounds are unrolled like
    `ann_ivf_kmeans` / `graph_pagerank` — the fixed-iteration distributed-
    training loop pattern."""
    merges, words = _bpe_learn_merges(spark, sf_dir)
    out = None
    for step, best in enumerate(merges, start=1):
        m = best.select(
            F.lit(step).alias("step"),
            "x",
            "y",
            F.concat("x", "y").alias("merged"),
            "pair_count",
        )
        out = m if out is None else out.unionAll(m)
    return tie_unpersist(out, words)


def _bpe_tokenize_expr(col):
    """Word → `||`-separated initial symbol sequence (the convention the
    merge-replace scans operate on)."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.concat(F.lit("||"), F.array_join(chars, "||"), F.lit("||"))


def _bpe_apply_merge(seq_df: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite every `seq` with one learned merge (1-row broadcast +
    literal left-to-right non-overlapping replace — BPE's merge-scan
    order in both engines)."""
    return seq_df.crossJoin(F.broadcast(best.select("x", "y"))).select(
        *[c for c in seq_df.columns if c != "seq"],
        F.replace(
            F.col("seq"),
            F.concat(F.lit("|"), "x", F.lit("||"), "y", F.lit("|")),
            F.concat(F.lit("|"), "x", "y", F.lit("|")),
        ).alias("seq"),
    )


def _bpe_learn_merges(
    spark: SparkSession, sf_dir: str, words: DataFrame | None = None
) -> tuple[list[DataFrame], DataFrame]:
    """The BPE training loop: returns (per-round argmax-pair DataFrames
    — each 1 row: x, y, pair_count —, the persisted word table), shared
    by the train and encode queries.  The caller ties the persisted word
    table to its result's lifetime (`tie_unpersist`) so the cache is
    released at the query boundary.

    The word-frequency table (vocabulary-sized, NOT corpus-sized) is
    persisted so the unrolled rounds re-read the cache instead of
    re-running the corpus scan+explode per round — the canonical Spark
    pattern for iterative algorithms over an invariant input.  Callers
    that already hold a word table (encode derives one from its per-doc
    counts) pass it in, collapsing the corpus scans further."""
    if words is None:
        toks = F.filter(
            F.split(
                F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " ")), " "
            ),
            lambda t: t != F.lit(""),
        )
        words = (
            spread_table(spark, sf_dir, "documents", "doc_id")
            .select(F.explode(toks).alias("word"))
            .filter(F.length("word") <= BPE_TRAIN_MAX_WORD)
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("wcount"))
        )
    words = words.persist()
    vocab = words.select("wcount", _bpe_tokenize_expr(F.col("word")).alias("seq"))
    merges = []
    for _step in range(1, BPE_TRAIN_ROUNDS + 1):
        best = _bpe_pair_argmax(vocab)
        merges.append(best)
        vocab = _bpe_apply_merge(vocab, best)
    return merges, words


_BPE_ENCODE_ORACLE = f"""
WITH {_BPE_TRAIN_CTES},
docwords AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS word
  FROM documents
),
dw AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c FROM docwords GROUP BY 1, 2),
s0 AS (
  SELECT word,
         '||' || array_to_string(list_filter(string_split(word, ''), ch -> ch <> ''), '||') || '||' AS seq
  FROM (SELECT DISTINCT word FROM dw)
),
s1 AS (SELECT word, replace(seq, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|') AS seq FROM s0, m1 m),
s2 AS (SELECT word, replace(seq, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|') AS seq FROM s1, m2 m),
s3 AS (SELECT word, replace(seq, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|') AS seq FROM s2, m3 m),
tokmap AS (
  SELECT word, CAST(len(list_filter(string_split(seq, '||'), s -> s <> '')) AS BIGINT) AS ntok
  FROM s3
)
SELECT dw.doc_id,
       CAST(SUM(dw.c) AS BIGINT) AS n_words,
       CAST(SUM(dw.c * t.ntok) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN tokmap t ON t.word = dw.word
GROUP BY dw.doc_id
"""


@query("text_bpe_encode", oracle=_BPE_ENCODE_ORACLE, tags=("text", "pipeline", "tokenizer"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE at corpus scale — the apply half of `text_bpe_train`:
    learn the top-3 merges, then tokenize every document with them and
    emit per-doc word and BPE-token counts (what a training pipeline
    runs to budget context windows with the *real* tokenizer, not the
    regex approximation in `text_bpe_tokens`).  The oracle replays
    training AND application round-for-round in DuckDB.

    Scale: the corpus is scanned ONCE into per-doc word counts (dw,
    persisted); the training word-frequency table is derived from dw by
    re-aggregation (never a second corpus pass) and itself persisted for
    the unrolled rounds; merges are applied on the DISTINCT-word table
    only (vocabulary-sized), each round a 1-row broadcast + literal
    replace; documents join the word→token-count map on the word key
    (AQE broadcasts the vocabulary side when it fits), so symbol
    sequences never ride a corpus-sized shuffle."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " ")), " "
        ),
        lambda t: t != F.lit(""),
    )
    # spread_table (guide §2.5): scan-fused tokenize CPU; no-op at scale.
    dw = (
        spread_table(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.explode(toks).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ).persist()
    train_words = (
        dw.filter(F.length("word") <= BPE_TRAIN_MAX_WORD)
        .groupBy("word")
        .agg(F.sum("c").cast("bigint").alias("wcount"))
    )
    merges, train_cached = _bpe_learn_merges(spark, sf_dir, words=train_words)
    seqs = dw.select("word").distinct().select(
        "word", _bpe_tokenize_expr(F.col("word")).alias("seq")
    )
    for best in merges:
        seqs = _bpe_apply_merge(seqs, best)
    syms = F.filter(F.split(F.col("seq"), r"\|\|"), lambda s: s != F.lit(""))
    tokmap = seqs.select("word", F.size(syms).cast("bigint").alias("ntok"))
    out = (
        dw.join(tokmap, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("ntok")).cast("bigint").alias("n_bpe_tokens"),
        )
    )
    return tie_unpersist(out, dw, train_cached)
