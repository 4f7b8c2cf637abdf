"""Generate SCALING.md — measured sf0.01 → sf0.1 scaling evidence.

PLANS.md argues each query's plan survives a scale-up *structurally*
(keyed shuffles, broadcasts, pushdown); this tool measures it: every
audited query runs end-to-end at both SFs (results discarded through the
noop sink, so the time is plan execution, not driver transfer) and the
table reports wall-clock and the time ratio against the data ratio
(10x rows for lineitem/orders/events/documents between these two SFs;
4x for embeddings).  A query whose time grows no faster than its input
is shuffle-linear — the local[32] proxy for "holds at 100 TB".  Run:

    python tools/scale_check.py > SCALING.md
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import impala_avx2_parquet_scanner_spark as engine  # noqa: E402
from impala_avx2_parquet_scanner_spark.registry import REGISTRY  # noqa: E402
from impala_avx2_parquet_scanner_spark.session import get_spark  # noqa: E402

SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"

#: (query, dominant input tables) — the table drives the expected data ratio.
CHECKED: list[tuple[str, str]] = [
    ("tpch_q1", "lineitem"),
    ("tpch_q9", "lineitem+orders"),
    ("tpch_q18", "lineitem+orders"),
    ("events_sessionize", "events"),
    ("events_path_transitions", "events"),
    ("merge_cdc_snapshot", "events"),
    ("dedup_exact", "documents"),
    ("dedup_minhash_lsh", "documents"),
    ("dedup_simhash", "documents"),
    ("dedup_winnowing", "documents"),
    ("dedup_repeated_spans", "documents"),
    ("dedup_clusters", "documents"),
    ("text_bpe_train", "documents"),
    ("text_tfidf_topk", "documents"),
    ("text_bm25_topk", "documents"),
    ("pipeline_curate", "documents"),
    ("pack_token_budget", "documents"),
    ("sample_weighted", "documents"),
    ("window_trailing_features", "events"),
    ("window_gaps_islands", "events"),
    ("join_scd2_pit", "events"),
    ("ann_bruteforce_topk", "embeddings"),
    ("embedding_pq_codes", "embeddings"),
    ("ann_pq_adc_topk", "embeddings"),
    ("ann_ivf_topk", "embeddings"),
    ("ann_knn_graph", "embeddings"),
    ("graph_pagerank", "embeddings"),
    ("embedding_centroids", "embeddings"),
    ("dedup_semantic", "embeddings"),
]


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    engine.load_all()
    spark = get_spark("scale-check", cpus=int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "16")))

    print("# SCALING — measured sf0.01 → sf0.1 wall-clock (tools/scale_check.py)")
    print()
    print("Execution time through the noop sink at both SFs.  `data x` is the")
    print("dominant input's row-count growth between the SFs; a `time x` at or")
    print("below `data x` means the plan scaled no worse than its input")
    print("(fixed JVM/planning overhead makes small queries sub-linear).")
    print()
    print("| query | input (data x) | sf0.01 s | sf0.1 s | time x |")
    print("|---|---|---|---|---|")
    ratios = {"lineitem": 10, "lineitem+orders": 10, "events": 10,
              "documents": 10, "embeddings": 4}
    # warm the JVM so the first measured query isn't paying startup
    _run(spark, "dedup_exact", "/root/testdata/sf0.001")
    flagged: list[str] = []
    for name, tableset in CHECKED:
        ta = _run(spark, name, SF_A)
        tb = _run(spark, name, SF_B)
        r = tb / ta if ta > 0 else float("inf")
        dr = ratios[tableset]
        mark = ""
        if r > dr:
            mark = " ⚠"
            flagged.append(name)
        print(f"| {name} | {tableset} ({dr}x) | {ta:.2f} | {tb:.2f} | {r:.1f}x{mark} |")
    print()
    if flagged:
        print(f"Super-linear (investigate): {', '.join(flagged)}")
    else:
        print("All checked queries scale at or below their input growth.")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
