"""Local replica of the driver's t2 correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash.  Usage:

    python tools/parity.py [sf_dir] [query ...]

Exit code 0 iff all compared queries match.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

from impala_avx2_parquet_scanner_spark import registry  # noqa: E402
from impala_avx2_parquet_scanner_spark.catalog import TABLES  # noqa: E402
from impala_avx2_parquet_scanner_spark.session import get_spark  # noqa: E402
import impala_avx2_parquet_scanner_spark as engine  # noqa: E402


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    engine.load_all()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("parity", cpus=8)
    failures: list[str] = []
    for name, spec in sorted(registry.REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if spec.oracle is None:
            print(f"okNA {name}: rows={len(s_rows)} (no oracle) {time.time()-t0:.1f}s")
            if len(s_rows) == 0 and "empty_ok" not in spec.tags:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs = value_hash(s_cols, s_rows)
            hd = value_hash(d_cols, d_rows)
            if hs != hd:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ss = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                dd = sorted("\x01".join(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ss, dd):
                    if a != b:
                        problems.append(f"  first diff:\n   spark={a[:300]}\n   duck ={b[:300]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            print(f"ok   {name}: rows={len(s_rows)} {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
