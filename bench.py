"""Benchmark harness — reproduces the reference's published workload
(BASELINE.md): TPC-H-style Q1/Q3/Q5/Q6/Q12/Q13/Q14 plus the 1–100%
selectivity sweep, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "duckdb": {name: sec, ...},
     "ratio_vs_duckdb": {name: r, ...}, "sf": "..."}

Each query is timed end-to-end (plan + execute + collect).  Results are
small aggregates, so collect() cost is negligible — the measurement is
scan/filter/join/agg throughput, same as the reference's wall-clock-per-
query numbers (README.md:9-22).

DuckDB yardstick: BASELINE.md's absolute numbers come from unrecorded
2015-era hardware/SF, so "within 2× of the reference" is not directly
testable.  Instead each headline query's oracle SQL also runs in DuckDB
(all cores, same parquet files, same machine) and the JSON carries
per-query `duckdb_sec` + ratio — a real engine on this hardware as the
portable baseline.  Disable with SPARK_GRAFT_NO_DUCKDB=1 for quick
iteration loops.
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


def duckdb_times(sf_dir: str, names: list[str]) -> dict[str, float]:
    """Per-query DuckDB wall-times for the same oracle SQL on the same
    parquet.  One warmup execution per query (OS page cache + catalog),
    then one timed run — mirroring the Spark side's warmed measurement."""
    import duckdb

    from impala_avx2_parquet_scanner_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    times: dict[str, float] = {}
    for name in names:
        sql = REGISTRY[name].oracle
        if not sql:
            continue
        con.execute(sql).fetchall()  # warm
        t0 = time.time()
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 4)
    con.close()
    return times


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

    if not os.environ.get("SPARK_GRAFT_NO_DUCKDB"):
        duck = duckdb_times(sf_dir, names)
        out["duckdb"] = duck
        out["duckdb_total_sec"] = round(sum(duck.values()), 4)
        out["ratio_vs_duckdb"] = {
            n: round(times[n] / duck[n], 2) for n in duck if duck[n] > 0
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
