"""The reference's published selectivity sweep (README.md:15-22)
reproduced on the FLE container's own scan path.

The reference reports one TPC-H-derived curve: scan time at 1/10/20/
30/50/80/100% predicate selectivity, base scanner vs the AVX2 FLE
kernels evaluating the predicate on encoded data.  This runs the same
protocol on this engine's fledir path: 60M uniform l_quantity values
in 1..100, predicate ``l_quantity <= K`` for K matching each
selectivity, measuring (a) the pushdown read — kernels on plane words,
block-skip survivor decode — and (b) decode-everything-then-filter
(the base-scanner analog).  Expected shape, as in the reference's
table: the pushdown curve rises with selectivity (survivor decode
grows) while staying below the flat decode-all curve at every point.

Both physical layouts run: UNIFORM (survivors in every block — the
reference's setting; in numpy both paths are vectorized, so unlike
the reference's AVX2-vs-scalar-decode win the two curves converge
once most blocks hold survivors) and SORTED (the engine's sorted-sink
layout, where chunk-stat refutation + block-skip decode make the
pushdown curve scale with selectivity instead of data size — the
regime the parquet-path selectivity_sorted_* queries measure).

Run:  python tools/fle_selectivity_bench.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (  # noqa: E402
    FleDirReader,
    decode_segment_columns,
    encode_segment_columns,
    parse_segment,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
SEG_ROWS = 937_500  # 64 segments at 60M
SELECTIVITIES = (1, 10, 20, 30, 50, 80, 100)


def build_segments(n_rows: int, layout: str) -> list[bytes]:
    rng = np.random.default_rng(13)
    qty = rng.integers(1, 101, size=n_rows).astype(np.int64)
    if layout == "sorted":
        qty = np.sort(qty)
    return [
        encode_segment_columns(
            [("l_quantity", qty[lo:lo + min(SEG_ROWS, n_rows - lo)])]
        )
        for lo in range(0, n_rows, SEG_ROWS)
    ]


def best_of(fn, reps=3):
    times, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return min(times), out


def pushdown_read(segs, bound):
    r = FleDirReader({"path": "bench"})
    r.pushed = [("l_quantity", "le", bound)]
    total = 0
    for payload in segs:
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        total += decode_segment_columns(
            seg, mask=mask, columns=["l_quantity"]
        )["l_quantity"][0].size
    return total


def decode_then_filter(segs, bound):
    total = 0
    for payload in segs:
        seg = parse_segment(payload)
        vals, _ = decode_segment_columns(
            seg, columns=["l_quantity"]
        )["l_quantity"]
        total += int((vals <= bound).sum())
    return total


def main() -> None:
    for layout in ("uniform", "sorted"):
        segs = build_segments(N_ROWS, layout)
        print(
            f"\n[{layout}]\n"
            "| selectivity | pushdown ms | decode+filter ms | rows kept |"
        )
        print("|---|---|---|---|")
        for pct in SELECTIVITIES:
            t_push, n_push = best_of(lambda: pushdown_read(segs, pct))
            t_dec, n_dec = best_of(lambda: decode_then_filter(segs, pct))
            assert n_push == n_dec, (pct, n_push, n_dec)
            print(
                f"| {pct}% | {t_push * 1000:.0f} | {t_dec * 1000:.0f} "
                f"| {n_push:,} |"
            )
            print(json.dumps(
                {"layout": layout, "pct": pct,
                 "push_ms": round(t_push * 1000, 1),
                 "decode_ms": round(t_dec * 1000, 1),
                 "rows": int(n_push)}
            ), file=sys.stderr)
        del segs


if __name__ == "__main__":
    main()
