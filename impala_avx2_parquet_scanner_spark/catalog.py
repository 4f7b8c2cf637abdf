"""Table catalog: loads the test-fixture parquet tables as DataFrames.

Mirrors the reference's descriptor/catalog layer (descriptors.h:149-262 —
table + partition descriptors resolved against file schemas).  In Spark the
descriptor table collapses to `spark.read.parquet` + schema resolution; the
one real piece of work here is guarding the `events.ts` column's physical
type.  The shipped fixtures carry TIMESTAMP(µs), which Spark reads
natively; if a fixture instead shipped int64 nanoseconds (which Spark's
vectorized reader surfaces as bigint under
`spark.sql.legacy.parquet.nanosAsLong`), `_load_events` floor-converts it
to microsecond `timestamp_ntz`, matching DuckDB's ns→µs truncation so
oracle comparisons agree either way.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Per-session memo of base-table DataFrames.  A DataFrame is an immutable
#: logical plan, so reusing one across queries is exactly what a catalog
#: table does — but `spark.read.parquet` re-lists the directory and
#: re-reads footers for schema on EVERY call, and the engine's queries
#: reference up to 6 tables each, re-built on every execution.  Memoizing
#: removes that per-query planning tax (guide §1.2 step 2 / §6 file
#: listing).  No data is cached or persisted: every action still scans
#: the parquet files.  Weak keys so a stopped session's plans are
#: releasable; keyed by (realpath, name, V1/V2 source list) within a
#: session — the source-list conf is resolved when the relation is
#: CREATED, so a memo hit across a mid-session V1↔V2 flip (the metadata
#: count(*) pushdown tests do this) would replay the stale source
#: version.  Escape hatch for callers that overwrite a table path
#: mid-session (none in-tree do — fixture writers write once, then
#: read): SPARK_GRAFT_NO_TABLE_CACHE=1.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-required confs applied."""
    ensure_runtime_confs(spark)
    if os.environ.get("SPARK_GRAFT_NO_TABLE_CACHE"):
        return _load(spark, sf_dir, name)
    memo = _TABLE_MEMO.setdefault(spark, {})
    try:
        v1_list = spark.conf.get("spark.sql.sources.useV1SourceList")
    except Exception:
        v1_list = None
    key = (os.path.realpath(sf_dir), name, v1_list)
    df = memo.get(key)
    if df is None:
        df = memo[key] = _load(spark, sf_dir, name)
    return df


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Dtype guard for events.ts.  The shipped fixtures are TIMESTAMP(µs)
    and pass through untouched; a nanos-int64 fixture (read as bigint under
    nanosAsLong) is floor-converted ns → µs → timestamp_ntz (session TZ is
    UTC so the LTZ→NTZ hop is the identity).  DuckDB performs the same
    floor when it reads such a file, so both engines see identical
    microsecond values either way."""
    df = spark.read.parquet(path)
    ts_field = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    if ts_field.get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def pin_above_spread(col):
    """Identity on every row, but nondeterministic to the optimizer:
    ``when(spark_partition_id() >= 0, col)`` — partition ids are always
    non-negative, so the branch always takes ``col``.

    Why: Catalyst pushes deterministic filters AND pruning projections
    straight through ``spread_table``'s repartition back into the
    single-split scan task, re-serializing exactly the CPU the spread
    exists to parallelize (round-10 stage profiles: pipeline_curate's
    whole 12-regex lang-ID gate and the text family's tokenize
    projections all ran below the exchange).  Wrapping the expensive
    expression in this tautology makes its parent operator
    nondeterministic, which blocks the push, so the work lands after the
    exchange on every core.  A standalone nondeterministic conjunct does
    NOT suffice (the push splits conjunctions and takes the
    deterministic parts), and ``rand(seed) > -1`` specifically is
    constant-folded away by Spark 4.1's Rand range analysis.  When
    spread is a no-op (splits ≥ cores — any real scale) there is no
    exchange and the pin is inert stage-wise; under SPARK_GRAFT_NO_SPREAD
    the pin returns ``col`` unchanged so the A/B opt-out path reproduces
    the exact pre-pin plan (ADVICE r10: the wrapper would otherwise still
    block scan-level pushdown of the wrapped predicate, making opt-out
    runs an impure baseline).

    Schema note (ADVICE r10): ``when()`` without ``otherwise()`` makes
    the wrapped column nullable in the output schema.  Values are
    unchanged (the condition is always true), and the driver's
    canonicalizer compares column NAMES + values, never nullability —
    but a downstream consumer adding a not-null assumption on a pinned
    column should read this first."""
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):
        return col
    return F.when(F.spark_partition_id() >= F.lit(0), col)


def spread_table(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """`table`, hash-repartitioned to the session's parallelism when the
    scan would otherwise under-parallelize — guide §2.5 input skew: the
    text/curate family fuses tokenize/regex/hash CPU into the scan stage,
    so a table that arrives as one small file (every local fixture) runs
    that CPU in ONE task.  The probe is the scan's own split count: on a
    real-scale table (splits ≥ cores) this returns the base plan
    unchanged — no added exchange at 100 TB — while locally one small
    hash shuffle of the raw rows buys every-core parallelism for the
    expensive projections downstream.  Hash (not round-robin) keyed so no
    sort-before-repartition cost and a deterministic row→partition map.
    Memoized beside the base table so the split probe runs once per
    session."""
    base = table(spark, sf_dir, name)
    if os.environ.get("SPARK_GRAFT_NO_TABLE_CACHE"):
        return _spread(spark, base, key)
    memo = _TABLE_MEMO.setdefault(spark, {})
    mkey = ("__spread__", os.path.realpath(sf_dir), name, key)
    df = memo.get(mkey)
    if df is None:
        df = memo[mkey] = _spread(spark, base, key)
    return df


def _spread(spark: SparkSession, df: DataFrame, key: str) -> DataFrame:
    # SPARK_GRAFT_NO_SPREAD disables the local-parallelism repartition
    # outright (A/B harness + production opt-out; at real scale the
    # split-count probe below already makes it a no-op).
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):
        return df
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, key)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL-API entry point)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
