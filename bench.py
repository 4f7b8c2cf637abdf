"""Benchmark harness — reproduces the reference's published workload
(BASELINE.md): TPC-H-style Q1/Q3/Q5/Q6/Q12/Q13/Q14 plus the 1–100%
selectivity sweep, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "..."}

Each query is timed end-to-end (plan + execute + collect).  Results are
small aggregates, so collect() cost is negligible — the measurement is
scan/filter/join/agg throughput, same as the reference's wall-clock-per-
query numbers (README.md:9-22).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import impala_avx2_parquet_scanner_spark as engine
from impala_avx2_parquet_scanner_spark.registry import REGISTRY
from impala_avx2_parquet_scanner_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all()
    spark = get_spark("bench")
    names = sorted(n for n, s in REGISTRY.items() if s.bench)

    # Warm the JVM/code paths once on the smallest query so per-query times
    # measure execution, not first-job startup.
    REGISTRY["selectivity_002"].fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 4)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
