"""Duplicate-cluster resolution: connected components over near-duplicate
pairs — the step between candidate-pair generation (MinHash-LSH) and
"keep one representative per cluster" in a corpus dedup pipeline.

Algorithm: iterative label propagation (each node adopts the minimum
label among itself and its neighbors until fixpoint).  Converges in
O(cluster diameter) rounds; near-dup clusters are shallow (diameter ≤ ~6
even at web scale), so the loop is short.  Each round is one join + one
aggregate — all DataFrame ops, executor-side only; `localCheckpoint`
truncates the growing lineage so round N doesn't replay rounds 1..N-1.

This is genuinely iterative (not SQL-expressible as one query), so the
registry entry has no DuckDB oracle; tests verify against a Python
union-find on the same pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.registry import query

MAX_ITERATIONS = 10


def connected_components(edges: DataFrame, max_iter: int = MAX_ITERATIONS) -> DataFrame:
    """(node, component) for the undirected graph given by edges
    (src, dst).  component = min node id reachable."""
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

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
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
            break
    return labels


@query(
    "dedup_clusters",
    oracle=None,  # iterative fixpoint — verified against Python union-find in tests
    tags=("dedup", "cluster", "pipeline"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering over documents: MinHash-LSH
    candidate pairs → connected components → one keeper (min doc_id) per
    cluster with cluster size."""
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
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .select("keep_id", "cluster_size", "members")
    )
