"""Skew-mitigation utilities: salting for hot keys (pyspark guide
'Partitioning & shuffle'; complements AQE's skewJoin for cases AQE can't
split, e.g. a single hot group in an aggregation).

Pattern: two-phase aggregate — spread each key over N salt buckets,
partially aggregate (key, salt), then finish on key.  Works for any
commutative-associative aggregate; the exact-decimal discipline keeps
results bit-identical to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Add a uniform salt column (monotonic id % n — deterministic given a
    fixed partitioning; for pure reproducibility salt on a hash of the
    full row key instead)."""
    return df.withColumn(salt_col, (F.monotonically_increasing_id() % n_salts))


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof sum: (key, salt) partial → key final.

    At 100 TB a hot key (e.g. one user with 1% of all events) makes one
    reducer the straggler; salting caps any reducer's share at
    ~hot_share/n_salts."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__part"))
    return partial.groupBy(key).agg(F.sum("__part").alias(alias))


def salted_count(df: DataFrame, key: str, alias: str, n_salts: int = 16) -> DataFrame:
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__part"))
    return partial.groupBy(key).agg(F.sum("__part").cast("bigint").alias(alias))


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Salted join for a skewed fact side against a small dimension:
    replicate the small side n_salts× with an explicit salt, salt the fact
    side, equi-join on (key, salt).  Each hot key's rows spread over
    n_salts reducers.  (With a truly small dimension prefer broadcast();
    this is the pattern when the 'small' side is too big to broadcast but
    the fact side is skewed.)"""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    fact = skewed.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    return fact.join(small_rep, [key, "__salt"]).drop("__salt")


_SALTED_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_price
FROM lineitem GROUP BY l_returnflag
"""


def _register_salted_query() -> None:
    from pyspark.sql import SparkSession

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.exprs import dec_price
    from impala_avx2_parquet_scanner_spark.registry import query

    @query(
        "agg_sum_salted",
        oracle=_SALTED_ORACLE,
        tags=("aggregate", "skew"),
    )
    def agg_sum_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Skew-proof two-phase aggregation: `l_returnflag` has only a
        handful of values, so a naive groupBy concentrates each flag on
        one reducer; salting spreads every key over 16 buckets, partially
        aggregates (key, salt), then finishes on key.  Exact DECIMAL
        partials make the result bit-identical to the unsalted plan (and
        to the oracle's single-threaded sum) — the associativity argument
        that lets salting be a pure physical rewrite.  Complements AQE's
        skew-join handling for single-hot-group aggregations AQE cannot
        split."""
        l = table(spark, sf_dir, "lineitem")
        out = salted_sum(
            l, "l_returnflag", dec_price("l_extendedprice"), "sum_price"
        )
        return out.select(
            "l_returnflag", F.col("sum_price").cast("double").alias("sum_price")
        )


_register_salted_query()


_SALTED_JOIN_ORACLE = """
SELECT s_nationkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def _register_salted_join_query() -> None:
    from pyspark.sql import SparkSession

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.exprs import dec_price
    from impala_avx2_parquet_scanner_spark.registry import query

    @query(
        "join_skew_salted",
        oracle=_SALTED_JOIN_ORACLE,
        tags=("join", "skew"),
    )
    def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Skew-proof replicated join: the dimension side is replicated
        n_salts× with an explicit salt column, the fact side salts each
        row, and the equi-join runs on (key, salt) — so a hot join key's
        rows land on n_salts reducers instead of one straggler.  The
        `shuffle_hash` hint forces the shuffled path (otherwise AQE
        broadcasts this small dimension and the salt never exercises a
        reducer) — at 100 TB this is the pattern for a dimension too big
        to broadcast joined to a fact with hot keys AQE's skew-join
        splitting can't fix (e.g. partitioned producers).  Salting is a
        pure physical rewrite: the join's LOGICAL result is salt-
        independent, so the unsalted single-threaded oracle replays the
        revenue-per-nation rollup bit-for-bit (exact DECIMAL partials).
        Complements `agg_sum_salted` (same trick for aggregation).
        Reference parity: runtime filter + partitioned-hash-join scope,
        SURVEY §2B joins."""
        l = table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_suppkey", "suppkey"
        )
        s = table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("suppkey"), "s_nationkey"
        )
        joined = replicate_broadcast_join(
            l.hint("shuffle_hash"), s, "suppkey", n_salts=8
        )
        return (
            joined.groupBy("s_nationkey")
            .agg(
                F.sum(dec_price("l_extendedprice")).alias("__rev"),
                F.count(F.lit(1)).cast("long").alias("n_items"),
            )
            .select(
                "s_nationkey",
                F.col("__rev").cast("double").alias("revenue"),
                "n_items",
            )
        )


_register_salted_join_query()
