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

Two scales, because fixed cost and throughput are different questions:
at sf0.1 (600k lineitem rows) EVERY Spark query sits on the ~0.3-0.5 s
job floor (scheduling + codegen + task launch) while DuckDB's in-process
scans finish in 20 ms — the sf0.1 ratios measure Spark's fixed overhead,
not its throughput, and `spark_floor_sec` (a 1-row parquet count) is
reported so the reader can see it.  The `scaled10x` section re-times the
reference's own headline four + the mid-sweep point on a deterministic
10x replication of lineitem/orders (≈6M lineitem rows, sf1-equivalent)
where per-row work dominates — that ratio is the honest single-node
throughput comparison, and the regime that extrapolates toward 100 TB.
Disable with SPARK_GRAFT_NO_SCALE10=1.
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
        path = os.path.join(sf_dir, f"{t}.parquet")
        # Spark-written tables are directories of part files
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
        )
    times: dict[str, float] = {}
    for name in names:
        sql = REGISTRY[name].oracle
        if not sql:
            continue
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(2):  # min-of-2, symmetric with the Spark loop
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        times[name] = round(best, 4)
    con.close()
    return times


SCALE10_QUERIES = [
    "tpch_q6",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "selectivity_050",
    # the sorted-rewrite skipping claim at the scale where it matters:
    # 6M rows, 2%-selective pushed range predicate on sorted data
    "selectivity_sorted_002",
    # the heaviest static plan in the suite (4 shuffles, 21 columns
    # pre-AQE): its 10x point certifies the derived-partsupp pair
    # shuffle + decorrelated window scale with the data (round-6's lone
    # wrong-way bench mover — since re-measured, see EXTRA_REPS)
    "tpch_q2",
]

#: Queries that get extra timed reps above the adaptive floor policy:
#: tpch_q2's round-6 reading moved +7% on an unchanged plan (VM noise on
#: a 2-rep minimum) — four reps keeps one GC pause from being the number.
EXTRA_REPS = {"tpch_q2": 4}


def _steal_sample() -> tuple[int, int] | None:
    """(steal_jiffies, busy_jiffies) from the aggregate /proc/stat line,
    where busy = everything except idle+iowait.  Linux-only, best-effort.

    Round-10 finding: this VM's "machine weather" is hypervisor CPU
    steal that is TRIGGERED BY OUR OWN LOAD — /proc/stat steal sits at
    ~0.3% while the box idles and jumps to 60-380 jiffies per 2 s the
    moment a Spark job runs, so a floor probe can read 4-10x loud with
    zero local load and no external noise to "wait out".  Recording
    steal/busy over the timed region makes the artifact carry direct
    evidence of how much of the run the hypervisor confiscated, instead
    of inferring it from the floor/DuckDB yardsticks alone."""
    try:
        with open("/proc/stat") as fh:
            fields = fh.readline().split()
        v = [int(x) for x in fields[1:]]
        idle = v[3] + (v[4] if len(v) > 4 else 0)
        steal = v[7] if len(v) > 7 else 0
        # busy from the first 8 fields only (user nice system idle iowait
        # irq softirq steal): guest/guest_nice (v[8:]) are already counted
        # inside user/nice on Linux, so summing them would double-count
        # and understate the steal percentage (ADVICE r10).
        return steal, sum(v[:8]) - idle
    except Exception:  # noqa: BLE001  (non-Linux / locked-down /proc)
        return None


def _steal_pct(a, b) -> float | None:
    """Percent of busy CPU time stolen between two _steal_sample()s."""
    if not a or not b or b[1] <= a[1]:
        return None
    return round(100.0 * (b[0] - a[0]) / (b[1] - a[1]), 2)


def synth_scale10_dir(spark, base_sf: str) -> str:
    """Write-once 10x replication of lineitem+orders under /tmp and
    return a dir usable as an sf_dir (other tables symlink to the base).

    Replicas shift l_orderkey/o_orderkey by a disjoint per-replica offset
    (join keys stay consistent; part/customer foreign keys unchanged, so
    dimension joins fan out 10x — the same shape real growth has).
    Deterministic, so Spark and DuckDB read identical bytes."""
    import hashlib

    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import TABLES, table

    key = hashlib.md5(os.path.abspath(base_sf).encode()).hexdigest()[:12]
    out_dir = f"/tmp/spark_graft_bench10x_{key}"
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        os.makedirs(out_dir, exist_ok=True)
        okey_span = (
            table(spark, base_sf, "orders").agg(F.max("o_orderkey")).collect()[0][0]
            + 1
        )
        for name, keycols in (("lineitem", ("l_orderkey",)), ("orders", ("o_orderkey",))):
            base = table(spark, base_sf, name)
            parts = []
            for i in range(10):
                r = base
                for kc in keycols:
                    r = r.withColumn(kc, F.col(kc) + F.lit(i * okey_span))
                parts.append(r)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(32).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
        for t in TABLES:
            if t in ("lineitem", "orders"):
                continue
            link = os.path.join(out_dir, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(base_sf, f"{t}.parquet"), link)
        open(done, "w").close()
    return out_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all()
    spark = get_spark("bench")
    names = sorted(n for n, s in REGISTRY.items() if s.bench)

    # Warm the JVM/code paths once on the smallest query so per-query times
    # measure execution, not first-job startup; pre-materialize the sorted
    # rewrite and pre-scan every input table so one-time layout writes and
    # first-touch page-cache misses land before the clock starts (a cold
    # cache has been measured to inflate EVERY query ~2x on this VM).
    from impala_avx2_parquet_scanner_spark.catalog import TABLES, table
    from impala_avx2_parquet_scanner_spark.operators.tpch import (
        _materialize_sorted_lineitem,
    )

    REGISTRY["selectivity_002"].fn(spark, sf_dir).collect()
    _materialize_sorted_lineitem(spark, sf_dir)
    for t in TABLES:
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Min-of-N timed executions per query: a single reading occasionally
    # eats a GC pause / page-cache miss blip (observed +3x on one query in
    # an otherwise idle run).  Two reps baseline; queries living on the
    # job floor get more, because there a single scheduler hiccup IS the
    # measurement (round-5's selectivity_080 ratio jumped 9.9->16.5 on an
    # unchanged plan; round-7's selectivity_002 flapped +61% even at 6
    # reps on a visibly-loaded VM).  Sub-0.5s points now take min-of-8
    # and every query's rep count + min/median/max land in BENCH_FULL's
    # rep_stats, so a noisy machine-weather run is self-diagnosing: if
    # median >> min across the board, believe the mins.
    def timed_best(run, base_floor: int = 2) -> tuple[float, dict]:
        durs: list[float] = []
        while True:
            t0 = time.time()
            run()
            durs.append(time.time() - t0)
            best = min(durs)
            floor = max(
                base_floor,
                8 if best < 0.5 else 6 if best < 0.8 else 2,
            )
            if len(durs) >= floor:
                break
        s = sorted(durs)
        return best, {
            "reps": len(durs),
            "min": round(s[0], 4),
            "median": round(s[len(s) // 2], 4),
            "max": round(s[-1], 4),
        }

    # --- machine-weather gate (VERDICT r9 #2) ---------------------
    # MICROBENCH.md's calibration: quiet band is spark_floor
    # ~0.076-0.10 s on this VM.  A loud window makes every wall-clock
    # in the artifact untrustworthy (round 9's committed run read
    # 64 s where the same tree reads ~15 s quiet), so probe the floor
    # up front and, if loud, wait and re-probe a bounded number of
    # times instead of committing a run the pre-registered reading
    # rule already rejects.  All probes land in the artifact so it
    # self-reports its weather.
    weather_probes: list[float] = []
    weather_probe_steal: list[float | None] = []
    retries = int(os.environ.get("SPARK_GRAFT_WEATHER_RETRIES", "3"))
    wait_s = float(os.environ.get("SPARK_GRAFT_WEATHER_WAIT", "45"))

    def floor_probe() -> float:
        # settle the JVM first: broadcast/shuffle debris from the
        # warm-up is freed only after a collection notices it, and an
        # un-GC'd heap has been measured to inflate back-to-back
        # readings 5.5->42 s (tools/scale_check.py's _run)
        import gc as _gc

        _gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        s0 = _steal_sample()
        fb, _ = timed_best(
            lambda: spark.read.parquet(
                os.path.join(sf_dir, "region.parquet")
            ).count(),
            base_floor=3,
        )
        weather_probe_steal.append(_steal_pct(s0, _steal_sample()))
        return round(fb, 4)

    weather_probes.append(floor_probe())
    while weather_probes[-1] > 0.105 and len(weather_probes) <= retries:
        time.sleep(wait_s)
        weather_probes.append(floor_probe())

    times: dict[str, float] = {}
    rep_stats: dict[str, dict] = {}
    steal_headline0 = _steal_sample()
    for name in names:
        best, stats = timed_best(
            lambda: REGISTRY[name].fn(spark, sf_dir).collect(),
            base_floor=max(2, EXTRA_REPS.get(name, 0)),
        )
        times[name] = round(best, 4)
        rep_stats[name] = stats
    steal_headline = _steal_pct(steal_headline0, _steal_sample())

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "rep_stats": rep_stats,
        "sf": sf_dir,
        # self-document the core count: a BENCH_FULL.json from a
        # low-core companion run must never be mistaken for the 32-core
        # pin again (it happened in rounds 10 AND 11)
        "cpus": spark.sparkContext.defaultParallelism,
    }

    # Spark's fixed per-job cost on this setup: a 1-row parquet count.
    # Sub-second headline times sit on this floor; subtract it mentally
    # when reading sf0.1 ratios.
    floor_best, floor_stats = timed_best(
        lambda: spark.read.parquet(
            os.path.join(sf_dir, "region.parquet")
        ).count(),
        base_floor=3,
    )
    out["spark_floor_sec"] = round(floor_best, 4)
    out["spark_floor_stats"] = floor_stats
    out["weather_probes"] = weather_probes
    out["weather_probe_steal_pct"] = weather_probe_steal
    out["cpu_steal_pct_headline"] = steal_headline
    out["weather"] = (
        "quiet" if floor_best <= 0.105 else "loud"
    )

    # Yardstick extras are best-effort: the headline JSON contract must
    # survive any failure in them (missing duckdb, full /tmp, ...).
    if not os.environ.get("SPARK_GRAFT_NO_DUCKDB"):
        try:
            duck = duckdb_times(sf_dir, names)
            out["duckdb"] = duck
            out["duckdb_total_sec"] = round(sum(duck.values()), 4)
            out["ratio_vs_duckdb"] = {
                n: round(times[n] / duck[n], 2) for n in duck if duck[n] > 0
            }
        except Exception as exc:  # noqa: BLE001
            out["duckdb_error"] = str(exc)[:200]

        if not os.environ.get("SPARK_GRAFT_NO_SCALE10"):
            try:
                big = synth_scale10_dir(spark, sf_dir)
                s10: dict[str, float] = {}
                s10_stats: dict[str, dict] = {}
                for name in SCALE10_QUERIES:
                    REGISTRY[name].fn(spark, big).collect()  # warm plan
                    # same adaptive floor policy as the sf0.1 loop: on
                    # sub-half-second points one scheduler hiccup IS the
                    # measurement
                    best, stats = timed_best(
                        lambda: REGISTRY[name].fn(spark, big).collect(),
                        base_floor=max(2, EXTRA_REPS.get(name, 0)),
                    )
                    s10[name] = round(best, 4)
                    s10_stats[name] = stats
                d10 = duckdb_times(big, SCALE10_QUERIES)
                out["scaled10x"] = {
                    "spark": s10,
                    "rep_stats": s10_stats,
                    "duckdb": d10,
                    "ratio_vs_duckdb": {
                        n: round(s10[n] / d10[n], 2) for n in d10 if d10[n] > 0
                    },
                    "note": (
                        "single-JVM local mode pays a fixed per-job+per-shuffle "
                        "cost DuckDB's in-process engine does not; subtract "
                        "spark_floor_sec for marginal throughput. 100x-data runs "
                        "were measured by hand but are IO-bound on this VM's "
                        "shared disk (2 GB page cache) and too noisy to report. "
                        "tpch_q2's ratio specifically swings 6.4-23x with "
                        "DuckDB's page-cache state (Spark wall stable ~2.4-3.2s "
                        "across runs; MICROBENCH.md round-7 section) — read the "
                        "spark+rep_stats columns, not the ratio, for q2."
                    ),
                }
            except Exception as exc:  # noqa: BLE001
                out["scaled10x_error"] = str(exc)[:200]

    # The driver records only the last ~2000 chars of stdout and parses
    # the FINAL line as the round's JSON — r4/r5's single ever-growing
    # line outgrew that buffer and front-truncated (BENCH_r05.json
    # "parsed": null).  So: full detail goes to a file + the first line;
    # the LAST line is a compact contract (metric/value/queries/floor/
    # duckdb totals) that stays comfortably inside the buffer.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "spark_floor_sec": out.get("spark_floor_sec"),
        "duckdb_total_sec": out.get("duckdb_total_sec"),
        "scaled10x_ratio_vs_duckdb": out.get("scaled10x", {}).get(
            "ratio_vs_duckdb"
        ),
        "detail": "BENCH_FULL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # never regress the tail-buffer contract
        compact.pop("scaled10x_ratio_vs_duckdb", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
