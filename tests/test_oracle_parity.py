"""Replays the verification driver's t2 gate over a representative sample
of the registry at sf0.001: row count + column names + order-insensitive
value equality vs DuckDB.  (tools/parity.py covers the full registry; the
sample keeps the suite fast.)"""

from __future__ import annotations

import pytest

import impala_avx2_parquet_scanner_spark as engine
from impala_avx2_parquet_scanner_spark.registry import REGISTRY

engine.load_all()

SAMPLE = [
    "tpch_q1",
    "tpch_q6",
    "tpch_q13",
    "pred_in",
    "pred_kleene_null",
    "agg_rollup",
    "join_left_outer",
    "join_semi",
    "window_topk_per_group",
    "set_intersect",
    "fn_datetime",
    "events_sessionize",
    "text_stats",
    "dedup_exact",
    "ann_bruteforce_topk",
    "basket_pair_affinity",
    "events_anomaly_zscore",
]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else str(v) for v in r))
    return sorted(out)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    assert spec.oracle, f"{name} has no oracle"
    df = spec.fn(spark, sf_dir)
    s_cols = sorted(df.columns)
    res = duck.execute(spec.oracle)
    d_cols = sorted(d[0] for d in res.description)
    assert s_cols == d_cols
    d_rows = res.fetchall()
    s_rows = [tuple(r) for r in df.collect()]
    assert len(s_rows) == len(d_rows)
    # order columns by name on both sides (driver compare semantics)
    s_order = [df.columns.index(c) for c in s_cols]
    d_desc = [d[0] for d in duck.execute(spec.oracle).description]
    d_order = [d_desc.index(c) for c in d_cols]
    s_n = norm([tuple(r[i] for i in s_order) for r in s_rows])
    d_n = norm([tuple(r[i] for i in d_order) for r in d_rows])
    assert s_n == d_n


def test_all_registered_queries_have_unique_names():
    assert len(REGISTRY) >= 75


def test_oracle_keys_subset_of_queries():
    from impala_avx2_parquet_scanner_spark.registry import all_oracles, all_queries

    assert set(all_oracles()) <= set(all_queries())
