"""PySpark-native analytics engine with the query surface of the reference
`zuowang/Impala-avx2-parquet-scanner` (an AVX2-optimized Impala Parquet
scanner fork).

The reference implements a Parquet scan operator with predicate evaluation
on encoded data (see SURVEY.md §2A).  This package re-expresses that whole
surface — scan, projection pruning, pushed-down predicates, residual
filters, the relational operator set the scanner plugs into, a Parquet/CSV
source+sink layer, and the large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) — as an
idiomatic Spark SQL / DataFrame library.  Catalyst + the vectorized Parquet
reader play the role of the reference's hand-written AVX2 kernels.

Layout:
    session     tuned SparkSession builder (local test + cluster-ready confs)
    catalog     loaders for the test tables (handles ns-timestamp quirks)
    registry    named query registry: every operator ships as a (Spark
                builder, DuckDB oracle SQL) pair consumed by __spark_entry__
    operators/  scan, predicate, aggregate, join, window, setop, TPC-H
    functions/  scalar function surface + text analysis
    sources/    parquet + delimited-text readers/writers
    streaming/  event-time windowing (batch-checkable) + structured streaming
    pipeline/   dedup, similarity search, multimodal column plumbing
"""

from impala_avx2_parquet_scanner_spark.registry import REGISTRY, QuerySpec  # noqa: F401

__version__ = "0.1.0"


def load_all() -> None:
    """Import every operator module so its queries land in REGISTRY."""
    from impala_avx2_parquet_scanner_spark.operators import (  # noqa: F401
        affinity,
        aggregates,
        asof,
        cdc,
        joins,
        predicates,
        scan,
        setops,
        skew,
        subqueries,
        timeseries,
        tpch,
        tpch_extra,
        tpch_partsupp,
        windows,
    )
    from impala_avx2_parquet_scanner_spark.functions import (  # noqa: F401
        nested,
        scalar,
        text,
        udfs,
    )
    from impala_avx2_parquet_scanner_spark import sql  # noqa: F401
    from impala_avx2_parquet_scanner_spark.sources import (  # noqa: F401
        avro_io,
        format_roundtrip,
        ppm_datasource,
    )
    from impala_avx2_parquet_scanner_spark.streaming import events  # noqa: F401
    from impala_avx2_parquet_scanner_spark.pipeline import (  # noqa: F401
        cluster,
        curate,
        dedup,
        multimodal,
        sampling,
        similarity,
    )
