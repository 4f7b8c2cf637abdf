"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H Q6-style scan (the reference's
headline benchmark query, README.md:10) at sf0.001.  ``queries()`` /
``oracle_sql()`` expose the full operator registry from
`impala_avx2_parquet_scanner_spark` — every implemented operator from
SURVEY.md §2 ships as a (Spark builder, DuckDB oracle) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import impala_avx2_parquet_scanner_spark as engine
from impala_avx2_parquet_scanner_spark import registry

engine.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from impala_avx2_parquet_scanner_spark.operators.tpch import tpch_q6

    return tpch_q6(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.all_oracles()
