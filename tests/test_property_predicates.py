"""Property-style predicate parity (seeded, mirroring the reference's
randomized round-trip tests — fle-test.cc:264-275 but deterministic):
for arbitrary thresholds/flags, Spark's pushed-down filter must select
exactly the rows DuckDB selects."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,  # seeded: same examples every run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    qty=st.floats(min_value=0.0, max_value=55.0, allow_nan=False),
    flag=st.sampled_from(["A", "N", "R"]),
    line_lo=st.integers(min_value=1, max_value=7),
)
def test_conjunctive_filter_count_matches_duckdb(spark, duck, sf_dir, qty, flag, line_lo):
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") <= qty)
            & (F.col("l_returnflag") == flag)
            & (F.col("l_linenumber") >= line_lo)
        )
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_quantity <= ? AND l_returnflag = ?"
        " AND l_linenumber >= ?",
        [qty, flag, line_lo],
    ).fetchone()[0]
    assert got == want


@settings(**_SETTINGS)
@given(
    lo=st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
    width=st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
)
def test_between_on_discount_matches_duckdb(spark, duck, sf_dir, lo, width):
    hi = lo + width
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount").between(lo, hi))
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_discount BETWEEN ? AND ?", [lo, hi]
    ).fetchone()[0]
    assert got == want


def _random_leaf(rng):
    """One (spark Column, duckdb SQL) predicate leaf over lineitem.

    Leaf shapes follow the reference's extraction contract
    (scalar-fn-call.cc:733-965): ``slotref OP literal`` with OP in
    {=,<,<=,>,>=,IN} plus BETWEEN (which arrives as ge AND le,
    README.md:7).  One leaf kind compares a NULLIF-derived nullable
    column so Kleene 3-valued AND/OR/NOT (compound-predicates.cc:23-57)
    is exercised inside every tree shape, not just hand-picked ones.
    """
    kind = rng.choice(["num", "num", "int", "str", "in_int", "in_str", "between", "null_cmp"])
    ops = [("=", "=="), ("<", "<"), ("<=", "<="), (">", ">"), (">=", ">=")]
    if kind == "num":
        col = rng.choice(["l_quantity", "l_discount", "l_extendedprice"])
        hi = {"l_quantity": 55.0, "l_discount": 0.12, "l_extendedprice": 105000.0}[col]
        v = round(rng.uniform(0.0, hi), 4)
        sql_op, _ = rng.choice(ops)
        return _cmp(F.col(col), sql_op, v), f"{col} {sql_op} {v!r}"
    if kind == "int":
        v = rng.randint(1, 7)
        sql_op, _ = rng.choice(ops)
        return _cmp(F.col("l_linenumber"), sql_op, v), f"l_linenumber {sql_op} {v}"
    if kind == "str":
        col, dom = rng.choice([("l_returnflag", "ANR"), ("l_linestatus", "FO")])
        v = rng.choice(dom)
        sql_op, _ = rng.choice(ops)
        return _cmp(F.col(col), sql_op, v), f"{col} {sql_op} '{v}'"
    if kind == "in_int":
        vals = sorted(rng.sample(range(1, 8), rng.randint(1, 3)))
        return F.col("l_linenumber").isin(vals), (
            "l_linenumber IN (" + ", ".join(map(str, vals)) + ")"
        )
    if kind == "in_str":
        vals = sorted(rng.sample(["A", "N", "R"], rng.randint(1, 2)))
        return F.col("l_returnflag").isin(vals), (
            "l_returnflag IN (" + ", ".join(f"'{v}'" for v in vals) + ")"
        )
    if kind == "between":
        lo = round(rng.uniform(0.0, 50.0), 2)
        hi = round(lo + rng.uniform(0.0, 10.0), 2)
        return F.col("l_quantity").between(lo, hi), (
            f"l_quantity BETWEEN {lo!r} AND {hi!r}"
        )
    # null_cmp: NULLIF-manufactured NULLs feed the Kleene combinators above
    v = round(rng.uniform(0.0, 0.12), 3)
    sql_op, _ = rng.choice(ops)
    return (
        _cmp(F.nullif(F.col("l_discount"), F.lit(0.0)), sql_op, v),
        f"NULLIF(l_discount, 0.0) {sql_op} {v!r}",
    )


def _cmp(col, sql_op, v):
    return {
        "=": col == v,
        "<": col < v,
        "<=": col <= v,
        ">": col > v,
        ">=": col >= v,
    }[sql_op]


def _random_tree(rng, depth):
    """Random AND/OR/NOT tree (compound-predicates.cc bitset combine)."""
    if depth == 0 or rng.random() < 0.35:
        return _random_leaf(rng)
    op = rng.choice(["and", "and", "or", "or", "not"])
    left_c, left_s = _random_tree(rng, depth - 1)
    if op == "not":
        return ~left_c, f"(NOT ({left_s}))"
    right_c, right_s = _random_tree(rng, depth - 1)
    if op == "and":
        return left_c & right_c, f"(({left_s}) AND ({right_s}))"
    return left_c | right_c, f"(({left_s}) OR ({right_s}))"


def test_fuzz_predicate_trees_rowsets_match_duckdb(spark, duck, sf_dir):
    """40 seeded random predicate trees (depth ≤ 3): the exact surviving
    row-set — not just the count — must match DuckDB.  This is the
    randomized analog of the reference's fle-test.cc round-trip tests,
    aimed at the full extraction contract: every {=,<,≤,>,≥,IN,BETWEEN}
    leaf under every AND/OR/NOT combination, with NULLs in play."""
    import random

    from impala_avx2_parquet_scanner_spark.catalog import table as _table

    li = _table(spark, sf_dir, "lineitem")
    for seed in range(40):
        rng = random.Random(1000 + seed)
        cond, sql = _random_tree(rng, depth=3)
        got = sorted(
            (r.l_orderkey, r.l_linenumber)
            for r in li.filter(cond).select("l_orderkey", "l_linenumber").collect()
        )
        want = sorted(
            map(
                tuple,
                duck.execute(
                    f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {sql}"
                ).fetchall(),
            )
        )
        assert got == want, f"seed={seed} predicate={sql}"


@settings(**_SETTINGS)
@given(date_str=st.dates().map(str))
def test_date_range_matches_duckdb(spark, duck, sf_dir, date_str):
    got = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit(date_str).cast("timestamp_ntz"))
        .count()
    )
    want = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_shipdate < CAST(? AS TIMESTAMP)",
        [date_str],
    ).fetchone()[0]
    assert got == want
