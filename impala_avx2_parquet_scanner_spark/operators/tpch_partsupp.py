"""TPC-H Q2/Q9/Q11/Q20 — the partsupp-dependent quartet, adapted.

The fixture has no partsupp table (TESTDATA.md), so these four queries
were previously out of scope (COVERAGE.md).  Like the accepted Q16/Q21
adaptations, they run on a *derived* part↔supplier relation built from
lineitem — the relation a TPC-H generator would have seeded partsupp with:

    ps_partkey, ps_suppkey  := DISTINCT (l_partkey, l_suppkey)
    ps_supplycost           := MIN(line extendedprice)  [exact DECIMAL(12,2)]
    ps_availqty             := SUM(line quantity)       [exact BIGINT]

Both stand-ins are deterministic functions of the data (no synthesis), and
the oracle derives them with the identical SQL, so every value is fully
hash-checked.  Each docstring states exactly which TPC-H column was
replaced; the join/agg *shape* of the original query — the thing the
reference's scanner feeds (hdfs-parquet-scanner.cc ProcessSplit →
exec-node tree) — is preserved.

Scale notes (100 TB): the derived-partsupp aggregation is one
(partkey, suppkey)-keyed shuffle with map-side combine — the same cost
class as scanning a real partsupp table.  All dimension sides (part,
supplier, nation, region, and the per-nation/per-region supplier key
lists) carry explicit broadcast hints.  Q9 adds the inherent
lineitem↔orders shuffle; nothing else exceeds one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.exprs import dec_price, disc_price, sum_dbl
from impala_avx2_parquet_scanner_spark.registry import query

_PARTSUPP_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost,
         SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
"""


def _partsupp(spark: SparkSession, sf_dir: str, lineitem: DataFrame | None = None) -> DataFrame:
    """Derived partsupp (see module docstring).  Pass a pre-filtered
    lineitem to push part/supplier pruning below the pair shuffle."""
    li = lineitem if lineitem is not None else table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(dec_price("l_extendedprice")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
    )


_Q2_ORACLE = f"""
WITH {_PARTSUPP_CTE},
rs AS (
  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
mn AS (SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM rs GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM rs
JOIN mn ON rs.ps_partkey = mn.ps_partkey AND rs.ps_supplycost = mn.min_cost
JOIN part ON p_partkey = rs.ps_partkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("tpch_q2", oracle=_Q2_ORACLE, tags=("tpch", "join", "subquery"), bench=True)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, adapted: derived partsupp (module
    docstring); '%BRASS' p_type filter → p_type = 'LARGE' AND p_size
    BETWEEN 10 AND 20 (fixture p_type vocabulary differs); output keeps
    the available supplier/part columns.  Shape preserved: region-scoped
    part↔supplier join + correlated per-part MIN + ordered LIMIT.

    Plan: the correlated scalar subquery is decorrelated into a
    per-part window MIN + equality filter — ONE pass over the regional
    slice, no self-join-back, no reliance on AQE exchange reuse (the
    window repartitions on ps_partkey, whose groups are per-part supplier
    lists — tiny at any scale); supplier×nation×region AND the part
    predicate's key set both prune lineitem BEFORE the pair aggregation
    (round-11, guide §3.2 semi-join reduction: the per-part MIN groups
    are whole partkey groups, so dropping non-qualifying partkeys below
    the window cannot change any surviving min — measured 3.7 % part
    selectivity cuts the pair shuffle ~27x).  The pruned supplier and
    part-key sets scale with SF, so they are not pinned broadcast — AQE
    broadcasts them while small (same plan at fixture scale) and
    degrades to shuffle joins at cluster scale; only the fixed-size
    nation/region keep hints.  Final TakeOrderedAndProject, never a
    global sort."""
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .join(sup.select("s_suppkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .drop("s_suppkey")
        .join(p.select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    rs = _partsupp(spark, sf_dir, li).join(
        sup, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    return (
        rs.withColumn("min_cost", min_cost)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q9_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))
         - ps_supplycost * CAST(l_quantity AS DECIMAL(4,0))
       ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""


@query("tpch_q9", oracle=_Q9_ORACLE, tags=("tpch", "join", "aggregate"), bench=True)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit, adapted: derived ps_supplycost
    (module docstring) and p_name LIKE '%green%' → LIKE 'red%' (fixture
    color vocabulary).  Shape preserved: 6-way join, profit expression
    `disc_price - supplycost*qty` in exact decimal, nation×year rollup.

    Plan: the 'red' part-key semi-reduction feeds BOTH the fact scan and
    the partsupp derivation, so the pair shuffle and the orders join
    carry only ~1/8 of lineitem; the SF-scaled part-key and
    supplier×nation sides carry no pinned hint (AQE broadcasts them
    while small, shuffles at cluster scale — only the 25-row nation is
    pinned); the two big exchanges (pair-key agg, orderkey join) are
    inherent to Q9."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    pk = p.select("p_partkey")
    li = table(spark, sf_dir, "lineitem").join(
        pk, F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey")
    ps = _partsupp(spark, sf_dir, li).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        disc_price()
        - F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(4,0)")
    )
    return (
        li.join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(sum_dbl(profit, "sum_profit"))
    )


_Q11_ORACLE = f"""
WITH {_PARTSUPP_CTE},
natps AS (
  SELECT ps_partkey, ps_supplycost, ps_availqty
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_19'
),
vals AS (
  SELECT ps_partkey,
         SUM(ps_supplycost * CAST(ps_availqty AS DECIMAL(18,0))) AS value_dec
  FROM natps GROUP BY 1
),
tot AS (SELECT SUM(value_dec) AS total_dec FROM vals)
SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
FROM vals, tot
WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.0005
ORDER BY value DESC, ps_partkey
"""


@query("tpch_q11", oracle=_Q11_ORACLE, tags=("tpch", "aggregate", "subquery"), bench=True)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock, adapted: derived ps_supplycost /
    ps_availqty (module docstring), nation GERMANY → NATION_19, fraction
    0.0001/SF → 0.0005.  Shape preserved: per-part value rollup filtered
    by a scalar share-of-total subquery.

    Plan: the nation's supplier keys (SF-scaled, so unpinned — AQE
    broadcasts while small) prune the lineitem scan
    before the pair shuffle (25× data cut); the per-part rollup is a
    second, already-small shuffle; the grand total aggregates the same
    subtree and AQE's stage reuse collapses it (post-execution plan shows
    ReusedExchange — lineitem is scanned once), broadcasting one row back —
    the value column is compared through identical double casts on both
    sides, so the threshold cut is reproducible."""
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_19")
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        sup, F.col("l_suppkey") == F.col("s_suppkey")
    )
    vals = (
        _partsupp(spark, sf_dir, li)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost") * F.col("ps_availqty").cast("decimal(18,0)")
            ).alias("value_dec")
        )
    )
    tot = vals.agg(F.sum("value_dec").alias("total_dec"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * F.lit(0.0005)
        )
        .select("ps_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


_Q20_ORACLE = """
WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND 2 * (
        SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      ) > ps_availqty
  )
ORDER BY s_name
"""


@query("tpch_q20", oracle=_Q20_ORACLE, tags=("tpch", "semi", "subquery"), bench=True)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, adapted: derived ps_availqty
    is all-time shipped quantity (module docstring), so the original
    `ps_availqty > 0.5 * qty_shipped(1994)` — vacuous against an
    all-time total — flips to `2 * qty_shipped(2000) > ps_availqty`:
    suppliers that moved more than half their all-time volume of a
    'small%' part during 2000.  p_name LIKE 'forest%' → 'small%'.
    Shape preserved: nation filter + IN-chain with a correlated
    per-(part,supplier) quantity aggregate; the oracle keeps the
    literal nested-subquery formulation.

    Plan: decorrelated — ONE pair-keyed aggregation computes the
    all-time sum and the 2000 sum together (conditional agg), replacing
    the oracle's per-pair correlated rescan; the 'small%' part keys
    (SF-scaled, unpinned — AQE broadcasts while small) prune lineitem;
    one shuffle total."""
    pk = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        pk, F.col("l_partkey") == F.col("p_partkey")
    )
    in_2000 = (
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp_ntz"))
    qty = F.col("l_quantity").cast("bigint")
    hot = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).alias("ps_availqty"),
            F.sum(F.when(in_2000, qty).otherwise(F.lit(0))).alias("qty_2000"),
        )
        .filter(F.lit(2) * F.col("qty_2000") > F.col("ps_availqty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .join(hot, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
