"""Delimited-text (CSV) source — reference operator #20 (SURVEY.md §2A).

The reference's SSE4.2 DelimitedTextParser (delimited-text-parser.cc:23-294)
handles configurable field/tuple delimiters, escape characters, \r\n and
lone-\r line endings, and fills missing trailing columns with NULL.
Spark's CSV reader covers the same contract declaratively; this module
pins the option mapping:

    field delimiter   → sep
    escape char       → escape
    tuple delimiter   → lineSep (None = accept \n, \r\n, \r)
    missing trailing  → mode=PERMISSIVE (NULL-fills)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    escape: str = "\\",
    header: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Read delimited text with the reference parser's semantics.

    PERMISSIVE mode NULL-fills missing trailing columns exactly like the
    reference (delimited-text-parser.cc — "missing trailing columns →
    NULL"); malformed extra columns are dropped rather than erroring."""
    ensure_runtime_confs(spark)
    reader = (
        spark.read.option("sep", sep)
        .option("escape", escape)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def read_delimited_audited(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Delimited read with the reference's bad-row policy surfaced.

    The reference parser counts and logs unparseable rows, then skips
    them (delimited-text-parser.cc error path).  Spark's analogs, pinned
    here and in tests/test_sources.py:

    * ``PERMISSIVE`` + a ``_corrupt_record`` column — the audit shape:
      malformed rows land NULL-typed with the raw line preserved, so a
      pipeline can route them to a quarantine sink (strictly more useful
      than the reference's log-only).
    * ``DROPMALFORMED`` — the reference's observable behavior: bad rows
      silently vanish from the scan.
    * ``FAILFAST`` — strict ingestion: first bad row aborts the query.

    ``schema`` is required (a string DDL): corrupt-record capture is
    only defined for an explicit schema read."""
    ensure_runtime_confs(spark)
    full = schema + (", _corrupt_record string" if mode == "PERMISSIVE" else "")
    return (
        spark.read.option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .csv(path)
    )


def write_delimited(
    df: DataFrame,
    path: str,
    sep: str = ",",
    escape: str = "\\",
    header: bool = False,
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).option("sep", sep).option("escape", escape).option(
        "header", str(header).lower()
    ).csv(path)
