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


def mask_only(workdir: str) -> int:
    """Parse + kernel words, no decode (round-6 methodology)."""
    r = in_reader()
    alive = 0
    for payload in _payloads(workdir):
        m = r._segment_mask(parse_segment(payload))
        if m is not None and m.any():
            alive += 1
    return alive


def _payloads(workdir: str):
    """Iterate segment bytes FROM DISK — every path below pays the same
    file IO, so the rows compare algorithms, not cache states."""
    import os

    for name in sorted(os.listdir(workdir)):
        if name.endswith(".fle"):
            with open(os.path.join(workdir, name), "rb") as fh:
                yield fh.read()


def pushdown_read(workdir: str) -> int:
    """The read-time scan path: every file opened, kernel mask +
    block-skipping survivor decode."""
    r = in_reader()
    hits = 0
    for payload in _payloads(workdir):
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        hits += decode_segment_columns(seg, mask=mask)[
            "l_quantity"
        ][0].size
    return hits


def pushdown_read_nostats(workdir: str) -> int:
    """Same scan path with the round-8 BSTA chunk-stats footer IGNORED
    (chunk_stats forced to None → every kernel runs over the full plane
    matrix) — isolates what the per-chunk min/max skip buys mid-file."""
    r = in_reader()
    hits = 0
    for payload in _payloads(workdir):
        seg = parse_segment(payload)
        seg.chunk_stats = None
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        hits += decode_segment_columns(seg, mask=mask)[
            "l_quantity"
        ][0].size
    return hits


def decode_then_in(workdir: str) -> int:
    hits = 0
    for payload in _payloads(workdir):
        cols = decode_segment_columns(parse_segment(payload))
        qty, valid = cols["l_quantity"]
        hits += int(np.isin(qty[valid], IN_LIST).sum())
    return hits


def domain_short_circuit(workdir: str) -> int:
    r = FleDirReader({"path": "x"})
    r.pushed = [("l_returnflag", "in", ("X", "Y"))]
    decoded = 0
    for payload in _payloads(workdir):
        seg = parse_segment(payload)
        mask = r._segment_mask(seg)
        if mask is not None and not mask.any():
            continue
        decoded += decode_segment_columns(seg, mask=mask)[
            "l_quantity"
        ][0].size
    assert decoded == 0  # both literals outside every dictionary
    return decoded


def manifest_pruned_read(workdir: str) -> int:
    """The round-7 full path: stats in the _DONE manifest prune whole
    FILES on the driver (never opened); survivors get kernel masks +
    block-skip decode."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
    )

    r = FleDirReader({"path": workdir, "numpartitions": "1"})
    r.pushed = [("l_quantity", "in", IN_LIST)]
    hits = 0
    # stats-refuted files already dropped by partitions(); survivors get
    # the same parse/mask/decode-count loop as pushdown_read (no Arrow
    # conversion, so the rows compare pruning, not materialization)
    for part in r.partitions():
        for path in part.paths:
            with open(path, "rb") as fh:
                seg = parse_segment(fh.read())
            mask = r._segment_mask(seg)
            if mask is not None and not mask.any():
                continue
            hits += decode_segment_columns(seg, mask=mask)[
                "l_quantity"
            ][0].size
    return hits


def write_dir(segs: list[bytes], workdir: str) -> None:
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirWriter,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    w = FleDirWriter({"path": workdir}, overwrite=True)
    w.commit([w.write([_Row(i, s) for i, s in enumerate(segs)])])


def main() -> None:
    import tempfile

    table_rows: list[tuple[str, float, float]] = []
    for layout in ("uniform", "clustered"):
        segs = build_segments(N_ROWS, clustered=(layout == "clustered"))
        print(json.dumps({
            "metric": "fle_segments", "layout": layout, "n_rows": N_ROWS,
            "n_segments": len(segs),
            "mb_on_disk": round(sum(map(len, segs)) / 1e6, 1),
            "mb_raw": round(N_ROWS * 9 / 1e6, 1),
        }))
        with tempfile.TemporaryDirectory() as workdir:
            write_dir(segs, workdir)
            del segs  # all paths read from disk below
            # correctness: all four read paths agree on the row count
            hits_p = pushdown_read(workdir)
            hits_n = pushdown_read_nostats(workdir)
            hits_d = decode_then_in(workdir)
            hits_m = manifest_pruned_read(workdir)
            assert hits_p == hits_n == hits_d == hits_m, (
                hits_p, hits_n, hits_d, hits_m
            )
            t_mask = timed(lambda: mask_only(workdir))
            t_push = timed(lambda: pushdown_read(workdir))
            t_nost = timed(lambda: pushdown_read_nostats(workdir))
            t_man = timed(lambda: manifest_pruned_read(workdir))
            t_dec = timed(lambda: decode_then_in(workdir))
            t_dom = timed(lambda: domain_short_circuit(workdir))
        for label, sec, base in (
            (f"[{layout}] parse + IN kernel words only", t_mask, t_mask),
            (f"[{layout}] pushdown read (chunk-skip kernels + "
             "block-skip decode)", t_push, t_mask),
            (f"[{layout}] pushdown read, chunk-stats footer ignored "
             "(full-plane kernels)", t_nost, t_mask),
            (f"[{layout}] manifest-stats prune + pushdown read "
             "(refuted files never opened)", t_man, t_mask),
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
