"""Duplicate-cluster resolution: connected components over near-duplicate
pairs — the step between candidate-pair generation (MinHash-LSH) and
"keep one representative per cluster" in a corpus dedup pipeline.

Algorithm: iterative label propagation with pointer jumping.  Each round
every node adopts the minimum label among (a) itself, (b) its neighbors,
and (c) its current label's own label — step (c) is the pointer-jumping
hop (component ids ARE node ids, so one extra join chases the chain one
level), which turns O(cluster diameter) convergence into O(log diameter):
a 50-node path graph converges in ~7 rounds instead of 49.  Each round is
two joins + one aggregate — all DataFrame ops, executor-side only;
`localCheckpoint` truncates the growing lineage so round N doesn't replay
rounds 1..N-1.  If the fixpoint is not reached within ``max_iter`` rounds
the function raises rather than returning silently-wrong labels.

The registry entry carries a full DuckDB oracle (recursive-CTE transitive
closure); tests additionally verify against a Python union-find on the
same pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.registry import query

MAX_ITERATIONS = 10


def connected_components(
    edges: DataFrame, max_iter: int = MAX_ITERATIONS, strict: bool = True
) -> DataFrame:
    """(node, component) for the undirected graph given by edges
    (src, dst).  component = min node id reachable.

    With pointer jumping, ``max_iter`` rounds resolve components of
    diameter up to ~2^max_iter — the default 10 covers diameter ~1000,
    far past any near-dup cluster.  ``strict=True`` raises RuntimeError
    if labels still changed in the final round (non-convergence), so a
    pathological graph surfaces loudly instead of returning partial
    labels."""
    # materialize the (possibly expensive) edge pipeline ONCE — without
    # this, every derived frame and every iteration replays the full
    # upstream plan (e.g. the MinHash-LSH candidate generation)
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("n_min"))
        )
        cand = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jump: a component id is itself a node id — chase one
        # extra level (label-of-label) so long chains halve every round
        lookup = cand.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            cand.join(lookup, cand.component == lookup.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if strict and not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds; "
            "raise max_iter (each extra round doubles the resolvable diameter)"
        )
    return labels


def _clusters_oracle() -> str:
    """DuckDB replay: MinHash-LSH pairs (same CTEs as dedup_minhash_lsh)
    + WITH RECURSIVE transitive closure → min reachable id = component.
    The recursive UNION's dedup is the fixpoint check, mirroring the
    label-propagation loop's 'no label changed' exit."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import _minhash_parts

    ctes, pairs_select = _minhash_parts()
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({pairs_select}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS r FROM sym
  UNION
  SELECT reach.node, sym.dst AS r FROM reach JOIN sym ON reach.r = sym.src
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT MIN(node) AS keep_id, COUNT(*) AS cluster_size,
       array_to_string(list_sort(list(node)), ',') AS members
FROM comp GROUP BY component
"""


@query(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    tags=("dedup", "cluster", "pipeline"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering over documents: MinHash-LSH
    candidate pairs → connected components → one keeper (min doc_id) per
    cluster with cluster size.

    The oracle replays the full pipeline in DuckDB, closing the
    components with a recursive CTE (min reachable id per node) — so the
    iterative Spark fixpoint is value-verified, not just row-counted;
    a Python union-find cross-check also runs in tests."""
    from impala_avx2_parquet_scanner_spark.pipeline.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.min("node").alias("keep_id"),
            F.count(F.lit(1)).alias("cluster_size"),
            # CSV string, not array: same information, but flat scalars
            # survive the driver's pandas canonicalization (ndarray cells
            # are unhashable in pandas sort_values)
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .select("keep_id", "cluster_size", "members")
    )
