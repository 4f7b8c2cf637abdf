"""Property-style as-of join parity (seeded): for arbitrary generated
event sets, the union+carry-forward composition in operators/asof.py must
agree with pandas.merge_asof (backward) and with a brute-force
"earliest following row" scan (forward)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from impala_avx2_parquet_scanner_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frames(spark, seed: int, n_left: int, n_right: int):
    """Two keyed event frames with integer 'times' (BIGINT ms) including
    deliberate collisions (times drawn from a small range)."""
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "k": rng.randint(0, 4, n_left),
            "t": rng.randint(0, 50, n_left).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_right) + 1000,
            "k": rng.randint(0, 4, n_right),
            "t": rng.randint(0, 50, n_right).astype(np.int64),
            "payload": rng.randint(0, 1_000_000, n_right).astype(np.int64),
        }
    )
    # unique (k, t) on the right: at equal times both merge_asof and the
    # window composition would pick arbitrarily — the join contract
    # requires a deterministic tiebreak only when duplicates exist, and
    # merge_asof offers none, so the property holds on the dedup'd set
    right = right.drop_duplicates(subset=["k", "t"], keep="first")
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


@settings(**_SETTINGS)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_asof_backward_matches_pandas_merge_asof(spark, seed):
    sl, sr, left, right = _frames(spark, seed, n_left=40, n_right=30)
    got = {
        r.lid: r.asof_payload
        for r in asof_join(
            sl, sr, key="k", left_time="t", right_time="t",
            right_values=["payload"],
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {row.lid: row.payload for row in want_df.itertuples()}
    assert set(got) == set(want)
    for lid in want:
        w = want[lid]
        assert got[lid] == (None if pd.isna(w) else int(w)), f"lid={lid}"


@settings(**_SETTINGS)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_asof_forward_matches_bruteforce(spark, seed):
    sl, sr, left, right = _frames(spark, seed, n_left=40, n_right=30)
    got = {
        r.lid: r.asof_payload
        for r in asof_join_forward(
            sl, sr, key="k", left_time="t", right_time="t",
            right_values=["payload"], tiebreak="payload",
        ).collect()
    }
    for row in left.itertuples():
        cand = right[(right.k == row.k) & (right.t >= row.t)]
        if cand.empty:
            assert got[row.lid] is None
        else:
            first_t = cand.t.min()
            expect = int(cand[cand.t == first_t].payload.min())
            assert got[row.lid] == expect, f"lid={row.lid}"


@settings(**_SETTINGS)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    tol=st.integers(min_value=0, max_value=20),
)
def test_asof_tolerance_matches_pandas_merge_asof(spark, seed, tol):
    """The staleness-bounded form must agree with pandas merge_asof's
    native tolerance semantics for arbitrary integer tolerances."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.operators.asof import (
        asof_join_tolerance,
    )

    sl, sr, left, right = _frames(spark, seed, n_left=40, n_right=30)
    got = {
        r.lid: r.asof_payload
        for r in asof_join_tolerance(
            sl, sr, key="k", left_time="t", right_time="t",
            right_values=["t", "payload"], tolerance=F.lit(tol),
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        tolerance=tol,
    )
    want = {row.lid: row.payload for row in want_df.itertuples()}
    assert set(got) == set(want)
    for lid in want:
        w = want[lid]
        assert got[lid] == (None if pd.isna(w) else int(w)), f"lid={lid} tol={tol}"


@settings(**_SETTINGS)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_asof_nearest_matches_bruteforce(spark, seed):
    """direction='nearest' semantics: minimal |t_right - t_left|, an
    exact backward/forward distance tie breaks BACKWARD (pandas rule).
    Verified against a brute-force scan per left row on the deduplicated
    right set (the query-level contract also dedupes)."""
    from impala_avx2_parquet_scanner_spark.operators.asof import (
        asof_join_nearest,
    )

    sl, sr, left, right = _frames(spark, seed, n_left=40, n_right=30)
    got = {
        r.lid: (r.nearest_payload, r.direction)
        for r in asof_join_nearest(
            sl, sr, key="k", left_time="t", right_time="t",
            right_values=["payload"],
        ).collect()
    }
    for row in left.itertuples():
        cand = right[right.k == row.k]
        if cand.empty:
            assert got[row.lid] == (None, None), f"lid={row.lid}"
            continue
        back = cand[cand.t <= row.t]
        fwd = cand[cand.t > row.t]
        bdist = (row.t - back.t.max()) if not back.empty else None
        fdist = (fwd.t.min() - row.t) if not fwd.empty else None
        if fdist is None or (bdist is not None and bdist <= fdist):
            expect = int(back[back.t == back.t.max()].payload.iloc[0])
            expect_dir = "backward"
        else:
            expect = int(fwd[fwd.t == fwd.t.min()].payload.iloc[0])
            expect_dir = "forward"
        assert got[row.lid] == (expect, expect_dir), f"lid={row.lid}"
