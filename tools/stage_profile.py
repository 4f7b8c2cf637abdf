"""Stage-level breakdown for one query — guide §1.1's empirical loop
without the interactive UI.

Runs the named query through the noop sink on a UI-enabled session, then
pulls /api/v1 stage metrics and prints, per stage: wall, executor run
time, input bytes/rows, shuffle read/write bytes — so the expensive stage
(scan vs exchange vs window) is identified by measurement, not guesswork.

Usage:
    python tools/stage_profile.py [--sf DIR] [--cpus N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import impala_avx2_parquet_scanner_spark as engine  # noqa: E402
from impala_avx2_parquet_scanner_spark.registry import REGISTRY  # noqa: E402


def rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    engine.load_all()
    from pyspark.sql import SparkSession

    from impala_avx2_parquet_scanner_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("stage-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    # warm like bench.py: page cache + codegen
    from impala_avx2_parquet_scanner_spark.catalog import TABLES, table

    for t in TABLES:
        table(spark, args.sf, t).write.format("noop").mode("overwrite").save()

    for name in args.names:
        spec = REGISTRY[name]

        def run():
            spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()

        run()  # warm
        jobs_before = {j["jobId"] for j in rest(f"{base}/jobs")}
        spark.sparkContext.setJobDescription(f"stage-profile:{name}")
        t0 = time.time()
        run()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        stage_ids = set()
        for j in rest(f"{base}/jobs"):
            if j["jobId"] not in jobs_before:
                stage_ids.update(j["stageIds"])
        print(f"\n=== {name}: wall {wall:.3f}s (timed run) ===")
        rows = []
        for s in rest(f"{base}/stages?status=COMPLETE"):
            if s["stageId"] not in stage_ids:
                continue
            rows.append(
                (
                    s["stageId"],
                    s["numCompleteTasks"],
                    s.get("executorRunTime", 0) / 1e3,
                    s.get("executorCpuTime", 0) / 1e9,
                    s.get("inputBytes", 0) / 1e6,
                    s.get("inputRecords", 0),
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    (s.get("name") or "")[:60],
                )
            )
        rows.sort(key=lambda r: -r[2])
        print(f"{'stage':>5} {'tasks':>5} {'runT s':>8} {'cpuT s':>8} {'inMB':>8} {'inRows':>9} {'shRdMB':>7} {'shWrMB':>7}  name")
        for r in rows:
            print(f"{r[0]:>5} {r[1]:>5} {r[2]:>8.2f} {r[3]:>8.2f} {r[4]:>8.1f} {r[5]:>9} {r[6]:>7.1f} {r[7]:>7.1f}  {r[8]}")
    spark.stop()


if __name__ == "__main__":
    main()
