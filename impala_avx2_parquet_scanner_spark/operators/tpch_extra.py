"""Second wave of TPC-H-adapted queries: Q7, Q8, Q15-Q19, Q21, Q22.

The reference's own benchmark set is Q6/Q12/Q13/Q14 (README.md:9-13); these
extend the engine's end-to-end surface to the remaining TPC-H shapes
expressible on the fixture schema (Q2/Q9/Q11/Q20 — the partsupp-dependent
quartet — live in tpch_partsupp.py on a derived part↔supplier relation):

- Q7  volume shipping: 6-way join + nation-pair disjunction + year rollup
- Q8  market share: conditional aggregation over an 8-way join
- Q16 parts/supplier counts (adapted: DISTINCT (l_partkey, l_suppkey)
  from lineitem stands in for the absent partsupp relation)
- Q17 small-quantity revenue: per-key average joined back to the fact
- Q18 large-volume customers: having-filtered semi-reduction then re-join
- Q15 top supplier: derived revenue view + scalar-max self-comparison
- Q19 disjunctive multi-column predicate (OR of conjunct groups)
- Q21 waiting suppliers (adapted: shipdate-vs-orderdate lateness replaces
  the absent l_receiptdate/l_commitdate pair): EXISTS + NOT EXISTS
- Q22 anti-join + scalar subquery (adapted: "no recent orders" replaces
  the missing c_phone country-code machinery)

Scale notes: every dimension side (nation 25, region 5, supplier 100,
customer 1/40 of lineitem, part 1/30) carries an explicit broadcast hint;
the only shuffles left are lineitem↔orders on the join key and the final
aggregations, which are all map-side combinable exact-decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.exprs import (
    SQL_DISC_PRICE,
    dec_price,
    disc_price,
    sum_dbl,
)
from impala_avx2_parquet_scanner_spark.registry import query

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         {SQL_DISC_PRICE} AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1996-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7", oracle=_Q7_ORACLE, tags=("tpch", "join"), bench=True)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: nation-pair trade volume per year.

    nation (25 rows) broadcasts; supplier/customer scale with SF, so no
    pinned hint — AQE broadcasts them while small, shuffles at cluster
    scale.  lineitem↔orders is the one required shuffle join.  The
    nation-pair disjunction is a residual filter over two joined
    dimension columns (operator #6 analog at the plan level; the date
    BETWEEN is pushed to the scan, #5)."""
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1996-12-31").cast("timestamp_ntz"),
        )
    )
    return (
        l.join(table(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(table(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(table(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum_dbl(F.col("volume"), "revenue"))
    )


_Q8_ORACLE = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         n2.n_name AS nation
  FROM part JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
) all_nations
GROUP BY o_year
"""


@query("tpch_q8", oracle=_Q8_ORACLE, tags=("tpch", "join"), bench=True)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 market share of NATION_5 suppliers in EUROPE orders.

    Conditional aggregation: both numerator and denominator are exact
    decimal sums surfaced as doubles, so the division is deterministic
    at any parallelism.  nation/region (fixed-size) broadcast; the
    SF-scaled part/supplier/customer sides carry no pinned hint — AQE
    decides per actual build size."""
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1996-12-31").cast("timestamp_ntz"),
        )
    )
    l = table(spark, sf_dir, "lineitem")
    volume = disc_price()
    joined = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(table(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "nation")
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0))).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN (
    SELECT l_partkey AS a_partkey,
           0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
  ) a ON a_partkey = p_partkey
WHERE p_brand = 'Brand#23' AND p_size < 10
  AND l_quantity < qty_threshold
"""


@query("tpch_q17", oracle=_Q17_ORACLE, tags=("tpch", "join", "subquery"), bench=True)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (container → p_size adapt).

    The correlated per-part average decorrelates to a groupBy on the fact
    table joined back by key — the aggregate side reduces lineitem to one
    row per part BEFORE the join, so the shuffle carries |part| rows, not
    |lineitem|.  Both join sides scale with SF (filtered part, per-part
    aggregate), so neither is pinned broadcast — AQE decides from the
    runtime build size.  The threshold is computed as an exact-decimal
    sum ÷ count so Spark and the oracle agree bit-for-bit."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10)
    )
    per_part = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("a_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(dec_price("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("tpch_q18", oracle=_Q18_ORACLE, tags=("tpch", "join", "topn"), bench=True)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers (threshold 250 fits fixture scale).

    The HAVING subquery and the outer aggregate both group lineitem by
    l_orderkey, so we aggregate ONCE and filter — one shuffle instead of
    the literal plan's two.  The filtered result is the top ~1% of orders
    — still linear in SF — so it is NOT pinned broadcast; AQE broadcasts
    it while small and shuffle-joins at cluster scale."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        table(spark, sf_dir, "orders")
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19", oracle=_Q19_ORACLE, tags=("tpch", "join", "pushdown"), bench=True)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 disjunctive revenue (container/shipmode → p_size adapt).

    An OR of conjunct groups across BOTH join sides: Catalyst derives the
    per-side implied filters (p_brand IN (...), l_quantity ranges) and
    pushes them below the join — the reference's all-or-nothing extractor
    (hdfs-parquet-scanner.cc:1825-1834) would give up on this shape."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    b, s = F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(sum_dbl(disc_price(), "revenue"))
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({SQL_DISC_PRICE}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, s_acctbal,
       CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


@query("tpch_q15", oracle=_Q15_ORACLE, tags=("tpch", "join", "subquery"), bench=True)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue view, pick the max.

    The revenue "view" reduces lineitem to one row per supplier before
    anything else touches it, so the expensive side of the plan is a
    single map-side-combinable aggregation over the date-pruned scan.
    The scalar max is a 1-row broadcast; supplier scales with SF so it
    carries no pinned hint (AQE decides — and the max-filtered left side
    is a handful of rows, so AQE broadcasts *that* instead at scale).
    The max-revenue comparison runs on the exact DECIMAL sum (not
    double), so ties and equality are deterministic at any parallelism.
    Reference parity: derived-table + scalar subquery shapes route
    through the expression framework (expr.h:118-383)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q22_ORACLE = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


@query("tpch_q22", oracle=_Q22_ORACLE, tags=("tpch", "anti", "subquery"), bench=True)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity, adapted: c_nationkey plays the
    phone country code (fixture has no c_phone) and "never ordered"
    becomes "no order since 2001-01-01" (every fixture customer has
    orders).  Shape preserved: scalar subquery + anti join + aggregate.

    The average-balance scalar is one broadcast row (crossJoin), the anti
    join's right side is the date-filtered orders projection — at 100 TB
    both stay broadcast-small relative to customer."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec_price("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_dbl(dec_price("c_acctbal"), "totacctbal"),
        )
    )


_Q16_ORACLE = """
WITH partsupp AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("tpch_q16", oracle=_Q16_ORACLE, tags=("tpch", "join", "distinct"))
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, adapted: the fixture has no
    partsupp table, so the part↔supplier relation is derived as
    DISTINCT (l_partkey, l_suppkey) from lineitem — the same relation a
    TPC-H generator would have seeded it with — and the supplier
    complaint-comment exclusion becomes a negative-balance exclusion (no
    s_comment column).  Shape preserved: filtered dimension join +
    NOT IN exclusion + COUNT(DISTINCT) rollup.

    Scale: the DISTINCT pair projection is the only lineitem-sized
    shuffle; part and the exclusion list both scale with SF so neither
    is pinned broadcast (AQE decides); the final aggregate carries one
    row per (brand, type, size)."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").startswith("ECONOMY")
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    )
    excluded = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .join(
            excluded,
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND n_name IN ('NATION_3', 'NATION_7')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


@query("tpch_q21", oracle=_Q21_ORACLE, tags=("tpch", "semi", "anti"))
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting, adapted: the fixture
    lacks l_commitdate/l_receiptdate, so "late" becomes l_shipdate more
    than 60 days after o_orderdate (per-line, since shipdate varies within
    an order).  The oracle keeps Q21's literal EXISTS / NOT EXISTS
    formulation; the Spark plan uses the standard decorrelated rewrite —
    an order qualifies iff it has >=2 distinct suppliers and exactly ONE
    distinct late supplier, and every late line of a qualifying order
    belongs to that supplier by construction.

    Scale: one lineitem->orders equi-join (orders projected to two
    columns), two map-side-combinable per-order aggregates reusing the
    same orderkey partitioning, then supplier/nation joins on the few
    qualifying rows (nation pinned broadcast at 25 rows; supplier
    unpinned — AQE broadcasts the small qualifying side at scale)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # Single pass over l: one groupBy(orderkey) computes every per-order
    # quantity the EXISTS/NOT EXISTS pair needs.  The join on l_orderkey
    # already partitioned l by the key, so this aggregation adds no
    # exchange — one lineitem scan, one shuffle, instead of the naive
    # three-frame self-join (which re-scans lineitem per frame).
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(is_late, F.col("l_suppkey"))).alias("n_late_supp"),
        F.sum(F.when(is_late, 1).otherwise(0)).alias("n_late_lines"),
        F.min(F.when(is_late, F.col("l_suppkey"))).alias("late_suppkey"),
    )
    # EXISTS(other supplier) ∧ NOT EXISTS(other late supplier) ⇔ the order
    # has ≥2 suppliers and exactly one DISTINCT late supplier — and every
    # late line of such an order belongs to that supplier by construction.
    qualifying = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return (
        qualifying.join(s, F.col("late_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )
