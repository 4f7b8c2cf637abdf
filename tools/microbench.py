"""Microbenchmark harness — the Spark analog of the reference's three
micro-harnesses (no stored numbers in the reference either; BASELINE.md
"Microbenchmark harnesses"):

* encoding-benchmark.cc:130-190 — FLE vs RLE encode/decode throughput and
  compression ratio over 64×4096 uniform-random values at bit widths
  1–32.  Spark analog: parquet write+scan throughput and bytes-on-disk
  with dictionary encoding ON (RLE_DICTIONARY — the role FLE plays in the
  reference) vs OFF (PLAIN), same value distribution.
* fle-benchmark.cc:1239-1328 — AVX kernel variant shootout.  n/a by
  design (SURVEY §4): the vectorized decode role is played by Spark's
  columnar parquet reader, measured by the encoding rows above.
* string-compare-benchmark.cc:189-213 — SSE4.2 vs scalar string compare
  at lengths 10/100/10000.  Spark analog: predicate-scan throughput of
  `col = literal` and `col < literal` over string columns of those
  lengths (codegen'd UTF8String compare).

Run:  python tools/microbench.py [out_md]
Writes one JSON line per measurement to stdout and a summary table to
MICROBENCH.md (or out_md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time




sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark.session import get_spark  # noqa: E402

#: 2048× the reference's 64×4096 buffer — sized so scan time dominates
#: the fixed per-job cost on local[32] (the reference measures in-cache
#: kernels; we measure the whole reader, so we need enough rows to
#: amortize job launch).
N_VALUES = 8 * 1024 * 1024
BIT_WIDTHS = [1, 2, 4, 8, 12, 16, 20, 24, 32]
STRING_LENS = [10, 100, 10000]
N_STRINGS = {10: 8_000_000, 100: 2_000_000, 10000: 40_000}


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def bench_encoding(spark, workdir: str) -> list[dict]:
    """Dictionary (RLE_DICTIONARY) vs plain parquet encode/decode at each
    bit width: uniform values in [0, 2^w), generated executor-side
    (xxhash64 of the row id — deterministic, no driver transfer).

    Expected shape, mirroring the reference's FLE-vs-plain curve: at low
    widths the dictionary file approaches w bits/value and the decode is
    RLE_DICTIONARY; past the 2^16-entry dictionary cap (w ≥ ~17 here,
    uniform values) parquet-mr falls back to plain — the same fallback
    the reference implements (dict-encoding.h, SURVEY §2A #19)."""
    rows = []
    for w in BIT_WIDTHS:
        gen = spark.range(N_VALUES).selectExpr(
            f"pmod(xxhash64(id), cast(pow(2, {w}) as bigint)) as v"
        )
        for dict_on in (True, False):
            path = os.path.join(workdir, f"enc_w{w}_{dict_on}")
            writer = gen.coalesce(4).write.mode("overwrite").option(
                "parquet.enable.dictionary", str(dict_on).lower()
            ).option("compression", "none")
            enc_s = _timed(lambda: writer.parquet(path))
            nbytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            back = spark.read.parquet(path)
            dec_s = _timed(lambda: back.selectExpr("sum(v)").collect())
            rows.append(
                {
                    "bench": "encoding",
                    "bit_width": w,
                    "encoding": "dictionary" if dict_on else "plain",
                    "n_values": N_VALUES,
                    "encode_mvals_per_s": round(N_VALUES / enc_s / 1e6, 1),
                    "decode_mvals_per_s": round(N_VALUES / dec_s / 1e6, 1),
                    "bytes": nbytes,
                    "bits_per_value": round(nbytes * 8 / N_VALUES, 2),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_string_compare(spark, workdir: str) -> list[dict]:
    """Predicate-scan throughput on string columns of length 10/100/10000
    — equality and less-than at ~50% selectivity.  All strings share a
    (len-1)-char prefix, so every compare must touch the whole string
    (the same worst case the reference's SSE4.2 harness measures)."""
    rows = []
    for slen in STRING_LENS:
        n = N_STRINGS[slen]
        base = "x" * (slen - 1)
        needle = base + "A"
        other = base + "B"
        gen = spark.range(n).selectExpr(
            f"concat(repeat('x', {slen - 1}),"
            f"       case when pmod(xxhash64(id), 2) = 1 then 'A' else 'B' end) as s"
        )
        path = os.path.join(workdir, f"str_{slen}")
        gen.coalesce(4).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        df.count()  # warm file listing + page cache
        for op, cond in (("eq", f"s = '{needle}'"), ("lt", f"s < '{other}'")):
            sec = _timed(lambda: df.filter(cond).count())
            rows.append(
                {
                    "bench": "string_compare",
                    "str_len": slen,
                    "op": op,
                    "n_rows": n,
                    "mrows_per_s": round(n / sec / 1e6, 2),
                    "mb_per_s": round(n * slen / sec / 1e6, 1),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "MICROBENCH.md"
    workdir = tempfile.mkdtemp(prefix="microbench_")
    spark = get_spark("microbench")
    try:
        enc = bench_encoding(spark, workdir)
        strs = bench_string_compare(spark, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()

    lines = [
        "# MICROBENCH — Spark analogs of the reference micro-harnesses",
        "",
        "Generated by `tools/microbench.py` on local[32].  The reference",
        "ships these harnesses without stored numbers (BASELINE.md), so the",
        "contract here is the *shape*: dictionary encoding must win at low",
        "bit widths (the FLE territory) and string-compare throughput must",
        "scale with length (bytes/s roughly constant, rows/s falling).",
        "",
        "## Encoding (encoding-benchmark.cc:130-190 analog)",
        "",
        f"{N_VALUES} uniform values per width, parquet uncompressed,",
        "dictionary (RLE_DICTIONARY) vs plain; decode = full-column sum scan.",
        "",
        "| bit width | encoding | encode Mv/s | decode Mv/s | bits/value |",
        "|---|---|---|---|---|",
    ]
    for r in enc:
        lines.append(
            f"| {r['bit_width']} | {r['encoding']} | {r['encode_mvals_per_s']} "
            f"| {r['decode_mvals_per_s']} | {r['bits_per_value']} |"
        )
    lines += [
        "",
        "## String compare (string-compare-benchmark.cc:189-213 analog)",
        "",
        "Shared-prefix strings force whole-string compares; ~50% selectivity.",
        "",
        "| len | op | rows | Mrows/s | MB/s |",
        "|---|---|---|---|---|",
    ]
    for r in strs:
        lines.append(
            f"| {r['str_len']} | {r['op']} | {r['n_rows']} "
            f"| {r['mrows_per_s']} | {r['mb_per_s']} |"
        )
    lines += [
        "",
        "fle-benchmark.cc (AVX kernel variants) has no Spark analog by",
        "design — SURVEY §4 scopes FLE out; its decode role is played by",
        "the vectorized parquet reader measured above.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
