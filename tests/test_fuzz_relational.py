"""Seeded relational fuzz — random join / aggregation / window specs
compared row-for-row against DuckDB on the same parquet.

Complements test_property_predicates.py (which fuzzes the §2A pushdown
predicate contract): here the fuzz targets the §2B relational surface the
engine layers on top of the scan — join types, grouped aggregates, and
window functions.  Every spec is generated from a fixed seed (same cases
every run) and compared as an exact sorted row-set, not a count.

Float discipline: any SUM over a double column goes through exact DECIMAL
on both sides (see exprs.py) so the doubles are bit-identical regardless
of parallelism.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from impala_avx2_parquet_scanner_spark.catalog import table

# ---------------------------------------------------------------- joins

# (left, right, left_key, right_key, left_filter_col/hi, right_filter_col/hi)
_JOIN_SHAPES = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey",
     ("l_quantity", 0.0, 55.0), ("o_totalprice", 1000.0, 400000.0)),
    ("orders", "customer", "o_custkey", "c_custkey",
     ("o_totalprice", 1000.0, 400000.0), ("c_acctbal", -900.0, 9900.0)),
    ("supplier", "nation", "s_nationkey", "n_nationkey",
     ("s_acctbal", -900.0, 9900.0), ("n_regionkey", 0.0, 4.0)),
]
_JOIN_TYPES = ["inner", "left", "semi", "anti"]


def test_fuzz_join_rowsets_match_duckdb(spark, duck, sf_dir):
    """24 seeded random (shape × type × filters) joins: the surviving
    left-key multiset must match DuckDB exactly."""
    for seed in range(24):
        rng = random.Random(2000 + seed)
        lt, rt, lk, rk, (lf, llo, lhi), (rf, rlo, rhi) = rng.choice(_JOIN_SHAPES)
        how = rng.choice(_JOIN_TYPES)
        lv = round(rng.uniform(llo, lhi), 2)
        rv = round(rng.uniform(rlo, rhi), 2)

        left = table(spark, sf_dir, lt).filter(F.col(lf) < lv)
        right = table(spark, sf_dir, rt).filter(F.col(rf) < rv)
        joined = left.join(right, left[lk] == right[rk], how)
        got = sorted(r[0] for r in joined.select(left[lk]).collect())

        if how == "inner":
            sql = (f"SELECT l.{lk} FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk} "
                   f"AND r.{rf} < {rv!r} WHERE l.{lf} < {lv!r}")
        elif how == "left":
            sql = (f"SELECT l.{lk} FROM {lt} l LEFT JOIN "
                   f"(SELECT * FROM {rt} WHERE {rf} < {rv!r}) r ON l.{lk} = r.{rk} "
                   f"WHERE l.{lf} < {lv!r}")
        elif how == "semi":
            sql = (f"SELECT l.{lk} FROM {lt} l WHERE l.{lf} < {lv!r} AND EXISTS "
                   f"(SELECT 1 FROM {rt} r WHERE r.{rk} = l.{lk} AND r.{rf} < {rv!r})")
        else:  # anti
            sql = (f"SELECT l.{lk} FROM {lt} l WHERE l.{lf} < {lv!r} AND NOT EXISTS "
                   f"(SELECT 1 FROM {rt} r WHERE r.{rk} = l.{lk} AND r.{rf} < {rv!r})")
        want = sorted(r[0] for r in duck.execute(sql).fetchall())
        assert got == want, f"seed={seed} how={how} {lt}⋈{rt} ({sql})"


# ----------------------------------------------------------- aggregates

_GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def test_fuzz_grouped_aggregates_match_duckdb(spark, duck, sf_dir):
    """20 seeded random GROUP BY specs over lineitem — grouping subsets ×
    aggregate subsets (COUNT/SUM/MIN/MAX/COUNT DISTINCT), exact-decimal
    sums, optional HAVING."""
    li = table(spark, sf_dir, "lineitem")
    for seed in range(20):
        rng = random.Random(3000 + seed)
        keys = rng.sample(_GROUP_COLS, rng.randint(0, 2))

        aggs, sql_aggs = [], []
        picks = rng.sample(["n", "sq", "mn", "mx", "nd"], rng.randint(2, 4))
        for p in picks:
            if p == "n":
                aggs.append(F.count(F.lit(1)).alias("n"))
                sql_aggs.append("COUNT(*) AS n")
            elif p == "sq":
                aggs.append(
                    F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                    .cast("double").alias("sq"))
                sql_aggs.append(
                    "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq")
            elif p == "mn":
                aggs.append(F.min("l_extendedprice").alias("mn"))
                sql_aggs.append("MIN(l_extendedprice) AS mn")
            elif p == "mx":
                aggs.append(F.max("l_extendedprice").alias("mx"))
                sql_aggs.append("MAX(l_extendedprice) AS mx")
            else:
                aggs.append(F.countDistinct("l_partkey").alias("nd"))
                sql_aggs.append("COUNT(DISTINCT l_partkey) AS nd")

        having = rng.random() < 0.4 and "n" in picks
        thresh = rng.randint(1, 2000)

        grouped = li.groupBy(*keys).agg(*aggs) if keys else li.agg(*aggs)
        if having:
            grouped = grouped.filter(F.col("n") > thresh)
        out_cols = keys + picks
        got = sorted(tuple(r[c] for c in out_cols) for r in grouped.collect())

        sql = "SELECT " + ", ".join(keys + sql_aggs) + " FROM lineitem"
        if keys:
            sql += " GROUP BY " + ", ".join(keys)
        if having:
            sql += f" HAVING COUNT(*) > {thresh}"
        want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        assert got == want, f"seed={seed} keys={keys} aggs={picks} having={having}"


# -------------------------------------------------------------- windows

def test_fuzz_window_functions_match_duckdb(spark, duck, sf_dir):
    """15 seeded random window specs (partition col × ranking/offset/frame
    function) over a deterministic total order (the sort key ends in the
    unique (l_orderkey, l_linenumber) pair, so every function — including
    LAG and running SUM — has exactly one correct answer)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    order_sql = "l_extendedprice, l_orderkey, l_linenumber"
    order_cols = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]

    fns = {
        "row_number": (lambda w: F.row_number().over(w), "ROW_NUMBER()"),
        "rank": (lambda w: F.rank().over(w), "RANK()"),
        "dense_rank": (lambda w: F.dense_rank().over(w), "DENSE_RANK()"),
        "ntile": (lambda w: F.ntile(4).over(w), "NTILE(4)"),
        "lag": (lambda w: F.lag("l_linenumber", 1).over(w),
                "LAG(l_linenumber, 1)"),
        "run_sum": (
            lambda w: F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"),
            "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER "
            "(PARTITION BY {p} ORDER BY {o} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"),
    }
    for seed in range(15):
        rng = random.Random(4000 + seed)
        part = rng.choice(_GROUP_COLS)
        fname = rng.choice(sorted(fns))
        fcol, fsql = fns[fname]

        w = Window.partitionBy(part).orderBy(*order_cols)
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture
        # (the triple with l_extendedprice is — which is why the ORDER BY
        # above is a total order); compare full tuples, None-safe for LAG's
        # first-in-partition rows
        key = lambda t: (t[0], t[1], t[2] is not None, t[2] or 0)  # noqa: E731
        got = sorted(
            ((r.l_orderkey, r.l_linenumber, r.v)
             for r in li.select(
                 "l_orderkey", "l_linenumber", fcol(w).alias("v")
             ).collect()),
            key=key,
        )
        if fname == "run_sum":
            expr = fsql.format(p=part, o=order_sql)
        else:
            expr = f"{fsql} OVER (PARTITION BY {part} ORDER BY {order_sql})"
        want = sorted(
            (tuple(r)
             for r in duck.execute(
                 f"SELECT l_orderkey, l_linenumber, {expr} AS v "
                 f"FROM lineitem WHERE l_orderkey <= 2000"
             ).fetchall()),
            key=key,
        )
        assert got == want, f"seed={seed} part={part} fn={fname}"


# ------------------------------------------------------------- set ops

_SETOP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def test_fuzz_set_operations_match_duckdb(spark, duck, sf_dir):
    """18 seeded random set-op cases: two differently-filtered projections
    of lineitem combined with UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]
    — multiset semantics (the ALL forms) compared as exact sorted
    row-lists, so bag-duplicate counting must match DuckDB's."""
    li = table(spark, sf_dir, "lineitem")
    ops = ["union", "union_all", "intersect", "intersect_all",
           "except", "except_all"]
    for seed in range(18):
        rng = random.Random(7000 + seed)
        cols = rng.sample(_SETOP_COLS, rng.randint(1, 3))
        lo_a = round(rng.uniform(0, 30), 2)
        lo_b = round(rng.uniform(0, 30), 2)
        op = rng.choice(ops)

        a = li.filter(F.col("l_quantity") > lo_a).select(*cols)
        b = li.filter(F.col("l_quantity") > lo_b).select(*cols)
        if op == "union":
            out = a.union(b).distinct()
        elif op == "union_all":
            out = a.union(b)
        elif op == "intersect":
            out = a.intersect(b)
        elif op == "intersect_all":
            out = a.intersectAll(b)
        elif op == "except":
            out = a.subtract(b)
        else:
            out = a.exceptAll(b)
        got = sorted(tuple(r) for r in out.collect())

        kw = {"union": "UNION", "union_all": "UNION ALL",
              "intersect": "INTERSECT", "intersect_all": "INTERSECT ALL",
              "except": "EXCEPT", "except_all": "EXCEPT ALL"}[op]
        csel = ", ".join(cols)
        sql = (f"SELECT {csel} FROM lineitem WHERE l_quantity > {lo_a!r} "
               f"{kw} "
               f"SELECT {csel} FROM lineitem WHERE l_quantity > {lo_b!r}")
        want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        assert got == want, f"seed={seed} op={op} cols={cols} ({sql})"
