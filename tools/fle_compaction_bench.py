"""Measure what small-file compaction is worth on the container —
the SAME rows as ~2000 tiny segments vs the compacted layout, through
the REAL Spark DSv2 road.

A micro-batched writer leaves a 100 TB fledir table as a sea of tiny
segments; every scan then pays per-file costs (open, header+footer
parse, a too-small unit of kernel/decode work, Arrow batch overhead).
`compact_fledir` exists to retire that tax.  This tool prices it:

* tiny      — N rows as TINY_ROWS-row segments (default 10k → ~2000
              files), globally sorted, full manifest stats.
* compacted — byte-identical rows after `compact_fledir` at
              TARGET_ROWS (default 1M → ~20 files), same stats tiers
              (recomputed by the rewrite).

Two queries, each min-of-5 wall + marginal over `spark_floor_sec`:

* full-scan agg (count+sum, no pushable filter): pure per-file
  overhead comparison — compaction's home turf.
* selective range (~3%): pushdown + manifest pruning on BOTH layouts.
  Honest caveat measured, not assumed: tiny files prune at FINER
  granularity (the kept byte range is smaller), so compaction can
  give some of its win back here — the classic
  file-size-vs-pruning-granularity trade every table format documents.

The compaction job's own wall is reported too (the amortized cost of
the rewrite).  Results are asserted IDENTICAL across layouts and reps.

Run:  python tools/fle_compaction_bench.py [n_rows] [tiny_rows] [target_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (  # noqa: E402
    encode_segment_columns,
    parse_segment,
    segment_stats,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
TINY_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
TARGET_ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
DOMAIN = 1 << 40
ROOT = f"/tmp/spark_graft_fle_compact_{N_ROWS}_{TINY_ROWS}"


def build_tiny() -> str:
    """N sorted rows as TINY_ROWS-row segments + a full-stats manifest
    (driver-side build, write-once)."""
    d = os.path.join(ROOT, "tiny")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(17)
    qty = np.sort(rng.integers(0, DOMAIN, size=N_ROWS).astype(np.int64))
    entries = []
    for si, lo in enumerate(range(0, N_ROWS, TINY_ROWS)):
        payload = encode_segment_columns(
            [("l_quantity", qty[lo:lo + min(TINY_ROWS, N_ROWS - lo)])]
        )
        name = f"seg_{si:06d}.fle"
        with open(os.path.join(d, name), "wb") as fh:
            fh.write(payload)
        seg = parse_segment(payload)
        st = segment_stats(seg)
        st["__rows__"] = seg.n
        entries.append(f"{name}\t{json.dumps(st)}")
    with open(os.path.join(d, "_DONE"), "w") as fh:
        fh.write("\n".join(entries))
    return d


def main() -> None:
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.session import get_spark
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        register_fledir,
    )
    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        compact_fledir,
    )

    tiny = build_tiny()
    # key the compacted layout on its target: a rerun with a different
    # TARGET_ROWS must not silently reuse a stale layout (review finding)
    compacted = os.path.join(ROOT, f"compacted_{TARGET_ROWS}")
    spark = get_spark("fle-compaction-bench")
    register_fledir(spark)

    compact_wall = None
    if not os.path.exists(os.path.join(compacted, "_DONE")):
        shutil.copytree(tiny, compacted, copy_function=os.link,
                        dirs_exist_ok=True)
        t0 = time.perf_counter()
        report = compact_fledir(spark, compacted,
                                target_rows=TARGET_ROWS)
        compact_wall = round(time.perf_counter() - t0, 4)
        assert report["compacted"], report
    n_tiny = sum(1 for f in os.listdir(tiny) if f.endswith(".fle"))
    n_comp = sum(1 for f in os.listdir(compacted) if f.endswith(".fle"))

    # ~3% selective bound from the same deterministic stream
    rng = np.random.default_rng(17)
    qty = rng.integers(0, DOMAIN, size=N_ROWS).astype(np.int64)
    k = int(np.partition(qty, int(N_ROWS * 0.03))[int(N_ROWS * 0.03)])
    del qty

    def full_scan(path: str):
        # modular checksum: a raw 40-bit-domain sum over 20M rows
        # overflows bigint under ANSI mode
        row = (
            spark.read.format("fledir").option("path", path).load()
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity") % F.lit(1_000_003)).alias("s"))
            .collect()[0]
        )
        return (row.n, row.s)

    def range_scan(path: str):
        row = (
            spark.read.format("fledir").option("path", path).load()
            .filter(F.col("l_quantity") <= k)
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

    fl = floor()
    wall: dict[str, float] = {}
    for label, fn in (("full", full_scan), ("range", range_scan)):
        expect = None
        for layout, path in (("tiny", tiny), ("compacted", compacted)):
            fn(path)  # warm: page cache + plan
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = fn(path)
                best = min(best, time.perf_counter() - t0)
                if expect is None:
                    expect = out
                assert out == expect, (label, layout, out, expect)
            wall[f"{label}_{layout}"] = round(best, 4)
    fl2 = floor()
    fl = min(fl, fl2)
    print(json.dumps({
        "n_rows": N_ROWS, "files_tiny": n_tiny, "files_compacted": n_comp,
        "compact_wall_sec": compact_wall, "k": k,
        "floor": round(fl, 4), "wall": wall,
        "marginal": {t: round(v - fl, 4) for t, v in wall.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
