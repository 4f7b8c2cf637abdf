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
