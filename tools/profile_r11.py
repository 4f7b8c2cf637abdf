"""Round-11 optimization profiler.

For each named query, this times the computation in isolation (noop sink
per the optimization guide §1.4 — no collect cost, full column
materialization) and optionally dumps the formatted physical plan to
plans/r11/<name>_<tag>.txt so before/after plan diffs are committable
evidence.

Usage:
    python tools/profile_r11.py [--sf DIR] [--reps N] [--plans TAG] q1 q2 ...
    python tools/profile_r11.py --bench-set --plans before   # all bench queries

Timing protocol mirrors bench.py (min-of-N, warm run first) but writes
nothing to BENCH_FULL.json — this is the engineering loop, not the
artifact pin.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import impala_avx2_parquet_scanner_spark as engine  # noqa: E402
from impala_avx2_parquet_scanner_spark.registry import REGISTRY  # noqa: E402
from impala_avx2_parquet_scanner_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump plans/r11/<q>_<TAG>.txt")
    ap.add_argument("--bench-set", action="store_true")
    ap.add_argument("--collect", action="store_true", help="time collect() like bench.py instead of the noop sink")
    args = ap.parse_args()

    engine.load_all()
    names = list(args.names)
    if args.bench_set:
        names += sorted(n for n, s in REGISTRY.items() if s.bench and n not in names)

    spark = get_spark("profile_r11")
    sc = spark.sparkContext

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r11")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    # warm the session the way bench.py does
    from impala_avx2_parquet_scanner_spark.catalog import TABLES, table
    from impala_avx2_parquet_scanner_spark.operators.tpch import _materialize_sorted_lineitem

    REGISTRY["selectivity_002"].fn(spark, args.sf).collect()
    _materialize_sorted_lineitem(spark, args.sf)
    for t in TABLES:
        table(spark, args.sf, t).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, args.sf)

        def run():
            d = spec.fn(spark, args.sf)
            if args.collect:
                d.collect()
            else:
                d.write.format("noop").mode("overwrite").save()

        sc.setJobDescription(f"r11-profile: {name}")
        run()  # warm (codegen + page cache + AQE stats)
        durs = []
        for _ in range(args.reps):
            t0 = time.time()
            run()
            durs.append(time.time() - t0)
        sc.setJobDescription(None)
        s = sorted(durs)
        out[name] = {
            "min": round(s[0], 4),
            "median": round(s[len(s) // 2], 4),
            "max": round(s[-1], 4),
            "reps": len(durs),
        }
        print(f"{name:40s} min={s[0]:.4f} median={s[len(s)//2]:.4f} max={s[-1]:.4f}", flush=True)

        if args.plans:
            from impala_avx2_parquet_scanner_spark.plans import final_adaptive_plan, formatted_plan

            static = formatted_plan(df)
            final = final_adaptive_plan(df)
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(f"== {name} — static plan (explain formatted) ==\n\n")
                fh.write(static)
                fh.write(f"\n\n== {name} — final adaptive plan (post-execution) ==\n\n")
                fh.write(final)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
