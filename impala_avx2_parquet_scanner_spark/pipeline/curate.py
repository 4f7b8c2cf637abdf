"""End-to-end corpus curation: the north-star training-data pipeline as
ONE composable query — quality gates → language filter → exact dedup.

Each stage reuses the already-oracle-checked building blocks
(functions/text.py quality + lang-ID expressions, pipeline/dedup.py
normalization), demonstrating that the pipeline operators compose without
materialization: the whole thing is a single Catalyst plan with one
shuffle (the dedup window on the 32-char fingerprint).

At 100 TB: the gates are scan-side column expressions (pushed into the
same stage as the parquet read), so the shuffle only carries documents
that survived filtering; the window-min dedup shuffles a hash key, never
the document text beyond this stage's projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.functions.text import (
    _lang_sql_score,
    lang_id,
    token_count,
)
from impala_avx2_parquet_scanner_spark.pipeline.dedup import normalize_text
from impala_avx2_parquet_scanner_spark.registry import query

_CURATE_ORACLE = f"""
SELECT doc_id, text_key, n_tokens
FROM (
  SELECT doc_id,
         MD5(LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS text_key,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
  FROM (
    SELECT doc_id, text,
           {_lang_sql_score('en')} AS en,
           {_lang_sql_score('es')} AS es,
           {_lang_sql_score('fr')} AS fr,
           {_lang_sql_score('de')} AS de
    FROM documents
    WHERE LENGTH(text) BETWEEN 100 AND 20000
      AND LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 20
  ) scored
  WHERE en >= es AND en >= fr AND en >= de AND en > 0
) gated
QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text_key)
"""


@query("pipeline_curate", oracle=_CURATE_ORACLE, tags=("pipeline", "dedup", "text"))
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate → English-only → exact-dedup curation pipeline.

    Stage fusion is the point: filters and scoring are narrow column
    expressions fused into the scan stage; the only shuffle is the
    window-min over the normalized-text fingerprint (dedup keep-first)."""
    t = F.col("text")
    gated = (
        table(spark, sf_dir, "documents")
        .filter(F.length(t).between(100, 20000) & (token_count(t) >= 20))
        .filter(lang_id(t) == "en")
        .select(
            "doc_id",
            F.md5(normalize_text(t)).alias("text_key"),
            token_count(t).alias("n_tokens"),
        )
    )
    keep = F.min("doc_id").over(W.partitionBy("text_key"))
    return (
        gated.withColumn("keep_id", keep)
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text_key", "n_tokens")
    )
