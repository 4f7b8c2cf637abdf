"""Join-produced runtime filter for the fledir container (§2A #11):
bounded build-side key collection, IN-set pushdown into the scan, and
the adaptive-disable fallback past the key budget."""
from __future__ import annotations

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.operators.joins import (
    runtime_filter_keys,
)


def test_keys_bounded_and_sorted(spark, sf_dir):
    dim = table(spark, sf_dir, "supplier")
    keys = runtime_filter_keys(dim, "s_suppkey", max_keys=4096)
    assert keys
    assert keys == sorted(set(keys))
    assert len(keys) == dim.select("s_suppkey").distinct().count()


def test_adaptive_disable_past_budget(spark, sf_dir):
    dim = table(spark, sf_dir, "supplier")
    n_dim = dim.select("s_suppkey").distinct().count()
    assert runtime_filter_keys(dim, "s_suppkey", max_keys=n_dim - 1) is None
    # at the exact budget the filter still builds
    assert (
        runtime_filter_keys(dim, "s_suppkey", max_keys=n_dim) is not None
    )


def test_null_keys_excluded(spark):
    dim = spark.createDataFrame(
        [(1,), (None,), (3,)], "k int"
    )
    assert runtime_filter_keys(dim, "k", max_keys=10) == [1, 3]


def test_filtered_and_fallback_joins_agree(spark, sf_dir):
    """The runtime filter only REDUCES the scan — enabled and disabled
    paths must produce identical join results."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        materialize_fle_fact_dir,
        register_fledir,
    )

    path = materialize_fle_fact_dir(spark, sf_dir)
    register_fledir(spark)
    # key-modulus dim filter: non-empty and selective at every SF
    dim = table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 3 == 0
    )
    keys = runtime_filter_keys(dim, "s_suppkey", max_keys=4096)
    assert keys

    def run(with_filter: bool):
        fact = (
            spark.read.format("fledir").option("path", path).load()
        )
        if with_filter:
            fact = fact.filter(F.col("l_suppkey").isin(keys))
        j = fact.join(
            F.broadcast(dim.select("s_suppkey", "s_nationkey")),
            fact["l_suppkey"] == F.col("s_suppkey"),
        )
        out = (
            j.groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("sq"),
            )
            .orderBy("s_nationkey")
        )
        return [tuple(r) for r in out.collect()]

    with_f, without_f = run(True), run(False)
    assert with_f == without_f
    assert with_f  # non-vacuous: the filtered join keeps rows


def test_in_set_pushes_into_container_plan(spark, sf_dir):
    """Plan-level proof: the runtime filter's IN conjunct is consumed
    by FleDirReader.pushFilters (no residual In above the scan)."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        materialize_fle_fact_dir,
        register_fledir,
    )

    path = materialize_fle_fact_dir(spark, sf_dir)
    register_fledir(spark)
    # whole supplier table as the build side: non-empty at every SF
    # (a zero-key build folds the scan to an empty LocalRelation)
    dim = table(spark, sf_dir, "supplier")
    keys = runtime_filter_keys(dim, "s_suppkey", max_keys=100_000)
    assert keys
    df = (
        spark.read.format("fledir")
        .option("path", path)
        .load()
        .filter(F.col("l_suppkey").isin(keys))
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RelationV2" in optimized
    above_scan = optimized.split("RelationV2")[0]
    assert "l_suppkey" not in above_scan


def test_runtime_filter_on_partition_key_prunes_directories(spark, sf_dir):
    """DPP composition: a runtime filter built from a dimension and
    pushed on the PARTITION key prunes whole leaf directories on the
    driver — the container analog of dynamic partition pruning."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        materialize_fle_partitioned_dir,
    )

    path = materialize_fle_partitioned_dir(spark, sf_dir)

    def leaf_files(pushed):
        r = FleDirReader({"path": path})
        r.pushed = pushed
        return sum(len(p.paths) for p in r.partitions())

    total = leaf_files([])
    # a dim-derived key set {A, R} (runtime_filter_keys output shape)
    pruned = leaf_files([("l_returnflag", "in", ("A", "R"))])
    assert 0 < pruned < total  # the N directory never contributes
