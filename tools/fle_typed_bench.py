"""FLE typed-kind microbench — sortable-bits doubles and
dictionary-LIKE predicates on encoded data vs decode-then-filter.

Round 8 closed the container's type matrix: doubles ride an
order-preserving sortable-bits bijection onto the same u64 plane
kernels the int kinds use, and string LIKE predicates evaluate once
per dictionary entry before touching any plane word.  This measures
both against the decode-everything baseline at the round-7/8 protocol
size (60M rows, 64 segments, from encoded bytes in memory, best of 3):

* f64 clustered — prices sorted across segments (the sorted-sink
  layout): a fractional range predicate should skip most chunks via
  the BSTA stats and most blocks via the kernel mask.
* f64 uniform — survivors everywhere: the kernel mask is the only
  saving; survivor decode bounds the time.
* LIKE prefix on a 64-entry dictionary — contiguous code range, two
  range kernels; vs decode to object strings + np startswith.

Run:  python tools/fle_typed_bench.py [n_rows]
Prints one JSON line per measurement plus a markdown table.
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
LO, HI = 2000.25, 2100.75  # ~1.25% of the 900..9000 price domain

NAMES = [
    f"{a} {b}"
    for a in ("cold", "warm", "blue", "red", "large", "small", "wide",
              "thin")
    for b in ("widget", "bolt", "rod", "cog", "gear", "plate", "pin",
              "nut")
]


def build_segments(n_rows: int, clustered: bool) -> list[bytes]:
    rng = np.random.default_rng(11)
    price = np.round(rng.uniform(900.0, 9000.0, size=n_rows), 2)
    if clustered:
        price = np.sort(price)
    name_codes = rng.integers(0, len(NAMES), size=n_rows)
    names = np.asarray(NAMES, dtype=object)[name_codes]
    segs = []
    for lo in range(0, n_rows, SEG_ROWS):
        n = min(SEG_ROWS, n_rows - lo)
        segs.append(encode_segment_columns([
            ("p_name", names[lo:lo + n]),
            ("price", price[lo:lo + n], "f64"),
        ]))
    return segs


def best_of(fn, reps=3):
    times, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return min(times), out


def pushdown_read(segs, pushed, want):
    r = FleDirReader({"path": "bench"})
    r.pushed = pushed
    total = 0
    for payload in segs:
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        cols = decode_segment_columns(seg, mask=mask, columns=[want])
        total += cols[want][0].size
    return total


def decode_then_filter_f64(segs):
    total = 0
    for payload in segs:
        seg = parse_segment(payload)
        vals, _ = decode_segment_columns(seg, columns=["price"])["price"]
        total += int(((vals > LO) & (vals <= HI)).sum())
    return total


def decode_then_filter_like(segs, prefix):
    total = 0
    for payload in segs:
        seg = parse_segment(payload)
        vals, _ = decode_segment_columns(seg, columns=["p_name"])["p_name"]
        total += int(
            np.char.startswith(vals.astype(str), prefix).sum()
        )
    return total


def main() -> None:
    rows = []
    for layout in ("clustered", "uniform"):
        segs = build_segments(N_ROWS, clustered=(layout == "clustered"))

        t_push, n_push = best_of(lambda: pushdown_read(
            segs, [("price", "gt", LO), ("price", "le", HI)], "price"
        ))
        t_dec, n_dec = best_of(lambda: decode_then_filter_f64(segs))
        assert n_push == n_dec, (n_push, n_dec)
        rows.append((f"[{layout}] f64 range pushdown read", t_push, n_push))
        rows.append((f"[{layout}] f64 decode + numpy filter", t_dec, n_dec))

        if layout == "uniform":
            t_like, n_like = best_of(lambda: pushdown_read(
                segs, [("p_name", "startswith", "cold")], "p_name"
            ))
            t_ldec, n_ldec = best_of(
                lambda: decode_then_filter_like(segs, "cold")
            )
            assert n_like == n_ldec, (n_like, n_ldec)
            rows.append(("LIKE 'cold%' dictionary-predicate read",
                         t_like, n_like))
            rows.append(("LIKE 'cold%' decode + np startswith",
                         t_ldec, n_ldec))
        del segs

    print()
    print("| scan path | ms | rows kept |")
    print("|---|---|---|")
    for label, t, n in rows:
        print(f"| {label} | {t * 1000:.0f} | {n:,} |")
        print(json.dumps(
            {"label": label, "ms": round(t * 1000, 1), "rows": int(n),
             "n_rows": N_ROWS}
        ), file=sys.stderr)


if __name__ == "__main__":
    main()
