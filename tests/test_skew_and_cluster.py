"""Skew-salting equivalence + connected-components correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import impala_avx2_parquet_scanner_spark as engine
from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.exprs import dec_price
from impala_avx2_parquet_scanner_spark.operators.skew import (
    replicate_broadcast_join,
    salted_count,
    salted_sum,
)
from impala_avx2_parquet_scanner_spark.pipeline.cluster import connected_components
from impala_avx2_parquet_scanner_spark.registry import REGISTRY

engine.load_all()


def test_salted_sum_equals_plain_sum(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: r.s
        for r in l.groupBy("l_returnflag")
        .agg(F.sum(dec_price("l_extendedprice")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: r.s
        for r in salted_sum(
            l, "l_returnflag", dec_price("l_extendedprice"), "s", n_salts=16
        )
        .select("l_returnflag", F.col("s").cast("double").alias("s"))
        .collect()
    }
    assert salted == plain  # exact decimal ⇒ bit-identical across phases


def test_salted_count_equals_plain_count(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    plain = {r.o_orderstatus: r.n for r in o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.o_orderstatus: r.n for r in salted_count(o, "o_orderstatus", "n").collect()}
    assert salted == plain


def test_replicated_salted_join_equals_plain_join(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    dim = (
        table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    plain = l.join(dim, "l_partkey").count()
    salted = replicate_broadcast_join(l, dim, "l_partkey", n_salts=8).count()
    assert salted == plain


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    # two chains, one triangle, one isolated edge
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21), (30, 31), (31, 32)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _union_find(edges)
    # union-find parents may not be fully path-compressed to the min —
    # normalize both to min-of-component
    from collections import defaultdict

    def normalize(labels):
        groups = defaultdict(set)
        for node, comp in labels.items():
            groups[comp].add(node)
        merged = {}
        for comp, members in groups.items():
            m = min(members | {comp})
            for node in members:
                merged[node] = m
        return merged

    assert normalize(got) == normalize(want)


def test_connected_components_50_node_chain_converges(spark):
    # Pathological diameter: a 50-node path graph.  Plain min-label
    # propagation needs 49 rounds; the pointer-jumping step must converge
    # it within the default MAX_ITERATIONS=10 (each round doubles the
    # resolvable diameter), with every node labeled 0.
    edges = [(i, i + 1) for i in range(49)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(50)}


def test_connected_components_nonconvergence_raises(spark):
    # With max_iter too small for the diameter, strict mode must raise
    # rather than return partial labels.
    edges = [(i, i + 1) for i in range(49)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dedup_clusters_query_runs(spark, sf_dir):
    rows = REGISTRY["dedup_clusters"].fn(spark, sf_dir).collect()
    # every cluster keeps its minimum member and reports consistent size
    # (members is a CSV string so it survives the driver's canonicalizer)
    for r in rows:
        members = [int(m) for m in r.members.split(",")]
        assert r.keep_id == min(members)
        assert r.cluster_size == len(members)
