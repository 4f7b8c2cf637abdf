"""FLE scan-path pushdown microbench — IN-list and dictionary-domain
short-circuit at 10x the round-6 size.

Round 6 measured the `le`/`eq` kernel pushdown against decode-then-filter
on 6M rows (MICROBENCH.md "FLE pushdown in the SCAN path").  This adds
the operators the reference's dictionary reader optimizes specially
(dict-encoding.h:461-541's code-space translation + page-level domain
skip) at 60M rows, on two physical layouts:

* uniform — survivors in every 64-value block: the kernel mask is the
  only thing cheaper than decoding (survivor decode itself is the bound).
* clustered — quantity sorted across segments (the engine's sorted-sink
  layout): the mask's zero words let decode SKIP whole blocks
  (hdfs-parquet-scanner.cc:1006-1038's bitset-driven skip), so the full
  pushdown read beats decode-then-filter by the selectivity ratio.

Plus `l_returnflag IN ('X', 'Y')` where neither literal is in any
segment's dictionary — the domain probe rejects whole segments for the
cost of a header parse, zero kernel words touched.

Run:  python tools/fle_pushdown_bench.py [n_rows]
Prints one JSON line per measurement plus a markdown table to stdout.
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
SEG_ROWS = 937_500  # 64 segments at 60M (same segment count as round 6)
IN_LIST = (3, 17, 41)


def build_segments(n_rows: int, clustered: bool) -> list[bytes]:
    rng = np.random.default_rng(7)
    qty_all = rng.integers(1, 51, size=n_rows).astype(np.int64)
    if clustered:
        qty_all = np.sort(qty_all)
    segs = []
    for lo in range(0, n_rows, SEG_ROWS):
        n = min(SEG_ROWS, n_rows - lo)
        rf = np.array(["A", "N", "R"], dtype=object)[
            rng.integers(0, 3, size=n)
        ]
        segs.append(
            encode_segment_columns(
                [("l_returnflag", rf), ("l_quantity", qty_all[lo:lo + n])]
            )
        )
    return segs


def timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def in_reader() -> FleDirReader:
    r = FleDirReader({"path": "x"})
    r.pushed = [("l_quantity", "in", IN_LIST)]
    return r


def mask_only(segs: list[bytes]) -> int:
    """Parse + kernel words, no decode (round-6 methodology)."""
    r = in_reader()
    alive = 0
    for payload in segs:
        m = r._segment_mask(parse_segment(payload))
        if m is not None and m.any():
            alive += 1
    return alive


def pushdown_read(segs: list[bytes]) -> int:
    """The real scan path: mask + block-skipping survivor decode."""
    r = in_reader()
    hits = 0
    for payload in segs:
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        hits += decode_segment_columns(seg, mask=mask)[
            "l_quantity"
        ][0].size
    return hits


def decode_then_in(segs: list[bytes]) -> int:
    hits = 0
    for payload in segs:
        cols = decode_segment_columns(parse_segment(payload))
        qty, valid = cols["l_quantity"]
        hits += int(np.isin(qty[valid], IN_LIST).sum())
    return hits


def domain_short_circuit(segs: list[bytes]) -> int:
    r = FleDirReader({"path": "x"})
    r.pushed = [("l_returnflag", "in", ("X", "Y"))]
    decoded = 0
    for payload in segs:
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        decoded += decode_segment_columns(seg, mask=mask)[
            "l_quantity"
        ][0].size
    assert decoded == 0  # both literals outside every dictionary
    return decoded


def main() -> None:
    table_rows: list[tuple[str, float, float]] = []
    for layout in ("uniform", "clustered"):
        segs = build_segments(N_ROWS, clustered=(layout == "clustered"))
        if layout == "uniform":
            print(json.dumps({
                "metric": "fle_segments", "n_rows": N_ROWS,
                "n_segments": len(segs),
                "mb_on_disk": round(sum(map(len, segs)) / 1e6, 1),
                "mb_raw": round(N_ROWS * 9 / 1e6, 1),
            }))
        # correctness: pushdown read == decode-then-filter row count
        hits_p, hits_d = pushdown_read(segs), decode_then_in(segs)
        assert hits_p == hits_d, (hits_p, hits_d)
        t_mask = timed(lambda: mask_only(segs))
        t_push = timed(lambda: pushdown_read(segs))
        t_dec = timed(lambda: decode_then_in(segs))
        t_dom = timed(lambda: domain_short_circuit(segs))
        for label, sec, base in (
            (f"[{layout}] parse + IN kernel words only", t_mask, t_mask),
            (f"[{layout}] pushdown read (mask + block-skip decode)",
             t_push, t_mask),
            (f"[{layout}] decode all + isin on decoded values",
             t_dec, t_mask),
            (f"[{layout}] IN outside every dictionary domain "
             "(zero decodes)", t_dom, t_mask),
        ):
            print(json.dumps({
                "metric": "fle_in_pushdown", "layout": layout,
                "path": label, "ms": round(sec * 1000, 1),
                "vs_mask_only": round(sec / base, 1),
            }))
            table_rows.append((label, sec, base))
        print(json.dumps({
            "metric": "fle_in_hits", "layout": layout,
            "matching_rows": hits_p, "n_rows": N_ROWS,
        }))
    print()
    print("| scan path | ms |")
    print("|---|---|")
    for label, sec, _base in table_rows:
        print(f"| {label} | {sec * 1000:.0f} |")


if __name__ == "__main__":
    main()
