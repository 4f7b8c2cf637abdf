"""One more measured decade for the container — the three stats tiers
toggled on the SAME data, through the REAL Spark scan path.

The in-process tools (fle_pushdown_bench / fle_selectivity_bench /
fle_typed_bench) measure the kernels and decode; this measures the whole
DSv2 road at 60M rows (the 100x-of-sf0.1 decade for lineitem's
l_quantity): `spark.read.format("fledir") ... filter(l_quantity <= K)`
against three byte-identical-except-for-stats variants of a globally
SORTED 64-segment container:

* full      — manifest min/max per file + per-chunk BSTA footers: the
              driver prunes ~97% of FILES before any task exists, chunk
              stats clean up the boundary files.
* no-manifest — names-only manifest (the stats JSON stripped): every
              file opens, the chunk tier alone must refute (the
              boundary-file regime of MICROBENCH's round-8 section, here
              end-to-end).
* no-stats  — BSTA footers truncated too: the kernels walk every plane
              word of every segment; only block-skip survivor decode
              remains.

Each tier reports min-of-5 wall seconds AND the marginal over
`spark_floor_sec` (a 1-row parquet count measured in the same session) —
the honest number on a VM whose fixed per-job cost is weather-dependent.
The query result (count + sum) is asserted IDENTICAL across tiers every
rep: the tiers may only change speed, never rows.

Run:  python tools/fle_tier_bench.py [n_rows] [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (  # noqa: E402
    _CHUNK_BLOCKS,
    encode_segment_columns,
    parse_segment,
    segment_stats,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
#: value domain 2^40: ~40-bit planes (≈300 MB at 60M rows), so per-file
#: kernel/decode work dominates the Python-worker fixed cost and the
#: tier differences are visible through the Spark road (at l_quantity's
#: 7-bit width all three tiers sit on the job floor — measured)
DOMAIN = 1 << 40
PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03  # selectivity
SEG_ROWS = 937_500  # 64 segments at 60M
ROOT = f"/tmp/spark_graft_fle_tiers_{N_ROWS}_w40"


def _footer_len(payload: bytes) -> int:
    """Byte length of the trailing BSTA footer (single-column segment)."""
    seg = parse_segment(payload)
    n_chunks = (seg.n_blocks + _CHUNK_BLOCKS - 1) // _CHUNK_BLOCKS
    return 4 + 4 + len(seg.columns) * (4 + 16 * n_chunks)


def query_bound() -> int:
    """The PCT-quantile of the deterministic value stream — recomputed
    identically in build and query so the run is parameter-free."""
    rng = np.random.default_rng(13)
    qty = rng.integers(0, DOMAIN, size=N_ROWS).astype(np.int64)
    return int(np.partition(qty, int(N_ROWS * PCT))[int(N_ROWS * PCT)])


def build_dirs() -> dict[str, str]:
    dirs = {t: os.path.join(ROOT, t) for t in ("full", "no-manifest",
                                               "no-stats")}
    if all(os.path.exists(os.path.join(d, "_DONE")) for d in dirs.values()):
        return dirs
    rng = np.random.default_rng(13)
    qty = np.sort(rng.integers(0, DOMAIN, size=N_ROWS).astype(np.int64))
    entries_full, entries_bare = [], []
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    for si, lo in enumerate(range(0, N_ROWS, SEG_ROWS)):
        payload = encode_segment_columns(
            [("l_quantity", qty[lo:lo + min(SEG_ROWS, N_ROWS - lo)])]
        )
        name = f"seg_{si:03d}.fle"
        with open(os.path.join(dirs["full"], name), "wb") as fh:
            fh.write(payload)
        with open(os.path.join(dirs["no-manifest"], name), "wb") as fh:
            fh.write(payload)
        with open(os.path.join(dirs["no-stats"], name), "wb") as fh:
            fh.write(payload[:-_footer_len(payload)])
        st = segment_stats(parse_segment(payload))
        st["__rows__"] = parse_segment(payload).n
        entries_full.append(f"{name}\t{json.dumps(st)}")
        entries_bare.append(name)
    with open(os.path.join(dirs["full"], "_DONE"), "w") as fh:
        fh.write("\n".join(entries_full))
    for t in ("no-manifest", "no-stats"):
        with open(os.path.join(dirs[t], "_DONE"), "w") as fh:
            fh.write("\n".join(entries_bare))
    # sanity: the truncated variant must parse stat-less
    with open(os.path.join(dirs["no-stats"], "seg_000.fle"), "rb") as fh:
        assert parse_segment(fh.read()).chunk_stats is None
    return dirs


def main() -> None:
    from impala_avx2_parquet_scanner_spark.session import get_spark
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        register_fledir,
    )

    dirs = build_dirs()
    K = query_bound()
    spark = get_spark("fle-tier-bench")
    register_fledir(spark)
    from pyspark.sql import functions as F

    def run(path: str):
        # fresh load() per action: the Spark 4.1 planned-scan cache
        # (fle_datasource module docstring)
        row = (
            spark.read.format("fledir").option("path", path).load()
            .filter(F.col("l_quantity") <= K)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").alias("s"))
            .collect()[0]
        )
        return (row.n, row.s)

    def floor() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.read.parquet(
                "/root/testdata/sf0.1/region.parquet"
            ).count()
            best = min(best, time.perf_counter() - t0)
        return best

    def run_no_pushdown(path: str):
        # (q + 0) <= K is not a translatable source filter, so Catalyst
        # keeps it post-scan: the reader decodes and ships ALL rows
        # through Arrow and Spark filters afterwards — the
        # decode-then-filter baseline END-TO-END (the reference's base
        # scanner), including the transfer cost pushdown avoids
        row = (
            spark.read.format("fledir").option("path", path).load()
            .filter((F.col("l_quantity") + F.lit(0)) <= K)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").alias("s"))
            .collect()[0]
        )
        return (row.n, row.s)

    fl = floor()
    results = {}
    expect = None
    for tier in ("full", "no-manifest", "no-stats"):
        run(dirs[tier])  # warm (page cache + plan)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(dirs[tier])
            best = min(best, time.perf_counter() - t0)
            if expect is None:
                expect = out
            assert out == expect, (tier, out, expect)
        results[tier] = round(best, 4)
    run_no_pushdown(dirs["full"])  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_no_pushdown(dirs["full"])
        best = min(best, time.perf_counter() - t0)
        assert out == expect, ("no-pushdown", out, expect)
    results["no-pushdown"] = round(best, 4)
    fl2 = floor()
    print(json.dumps({
        "n_rows": N_ROWS, "k": K, "rows_kept": expect[0],
        "floor_pre": round(fl, 4), "floor_post": round(fl2, 4),
        "wall": results,
        "marginal": {t: round(v - min(fl, fl2), 4)
                     for t, v in results.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
