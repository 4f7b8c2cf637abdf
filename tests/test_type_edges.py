"""Type-system edge fixtures (FIXTURES.md §2, mirroring the reference's
encoder unit tests): decimal byte-widths, CHAR/VARCHAR semantics, null
density sweeps, dictionary capacity fallback, narrow integer types.

Where the fixture tables lack a type (boolean, decimal, tinyint, CHAR),
tests write their own parquet via the engine sink and cross-check Spark's
read against DuckDB reading the very same files — write-path + read-path
parity in one shot.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.sources.parquet_io import read_parquet, write_parquet


def duck_rows(path: str, sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return con.execute(sql).fetchall()


def test_decimal_widths_roundtrip_and_coercion(spark, tmp_path):
    """DECIMAL(9,2)/(18,4)/(38,10) — the reference validates decimal
    byte-widths 4/8/16 (parquet-common.h:120-163) and coerces double
    literals to the column's decimal type for pushdown
    (scalar-fn-call.cc:784-872)."""
    rows = [
        (1, Decimal("1234567.89"), Decimal("12345678901234.5678"), Decimal("1234567890123456789012345678.0123456789")),
        (2, Decimal("-0.01"), Decimal("0.0001"), Decimal("-0.0000000001")),
        (3, Decimal("100.50"), Decimal("100.5000"), Decimal("100.5000000000")),
    ]
    schema = "id int, d92 decimal(9,2), d184 decimal(18,4), d3810 decimal(38,10)"
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "decs")
    write_parquet(df, out)

    back = read_parquet(spark, out)
    assert dict(back.dtypes)["d92"] == "decimal(9,2)"
    assert dict(back.dtypes)["d3810"] == "decimal(38,10)"
    # double-literal comparison on a decimal column (coercion contract)
    got = sorted(r.id for r in back.filter(F.col("d92") > 100.49).collect())
    want = sorted(
        r[0] for r in duck_rows(out, "SELECT id FROM t WHERE d92 > 100.49")
    )
    assert got == want == [1, 3]
    # exact values survive both engines
    s_vals = sorted(tuple(r) for r in back.select("id", "d184").collect())
    d_vals = sorted(tuple(r) for r in duck_rows(out, "SELECT id, d184 FROM t"))
    assert s_vals == d_vals


def test_char_varchar_semantics(spark):
    """CHAR(N) space-pads and compares padded (reference:
    hdfs-parquet-scanner.cc:579-596, string-value.inline.h:105-118) —
    Spark honors this under `spark.sql.preserveCharVarcharTypeInfo`.
    VARCHAR(N) overflow: the reference truncates silently
    (hdfs-parquet-scanner.cc:313-314); Spark is ANSI-stricter and raises
    EXCEED_LIMIT_LENGTH — explicit substring() is the truncation path.
    Both behaviors are pinned here."""
    prev = spark.conf.get("spark.sql.preserveCharVarcharTypeInfo", "false")
    spark.conf.set("spark.sql.preserveCharVarcharTypeInfo", "true")
    try:
        r = spark.sql(
            """
            SELECT CAST('ab' AS CHAR(5)) AS c5,
                   LENGTH(CAST('ab' AS CHAR(5))) AS c5_len,
                   CAST('ab   ' AS CHAR(5)) = CAST('ab' AS CHAR(5)) AS pad_eq,
                   CAST('abcde' AS VARCHAR(5)) AS v5_fit
            """
        ).collect()[0]
        assert r.c5 == "ab   "
        assert r.c5_len == 5
        assert r.pad_eq is True
        assert r.v5_fit == "abcde"
        with pytest.raises(Exception, match="EXCEED_LIMIT_LENGTH"):
            spark.sql("SELECT CAST('abcdefgh' AS VARCHAR(5))").collect()
        # explicit truncation — the portable spelling of the reference's
        # silent VARCHAR truncation
        trunc = spark.sql(
            "SELECT CAST(SUBSTRING('abcdefgh', 1, 5) AS VARCHAR(5)) AS v"
        ).collect()[0]
        assert trunc.v == "abcde"
    finally:
        spark.conf.set("spark.sql.preserveCharVarcharTypeInfo", prev)


def test_narrow_ints_and_float_roundtrip(spark, tmp_path):
    """TINYINT/SMALLINT widen to INT32 on disk (parquet-common.h:43-44)
    but read back at declared width; FLOAT stays 4-byte."""
    df = spark.createDataFrame(
        [(127, 32767, 1.5), (-128, -32768, -2.25)],
        "t tinyint, s smallint, f float",
    )
    out = str(tmp_path / "narrow")
    write_parquet(df, out)
    back = read_parquet(spark, out)
    assert dict(back.dtypes) == {"t": "tinyint", "s": "smallint", "f": "float"}
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    assert sorted(duck_rows(out, "SELECT t, s, f FROM t")) == [
        (-128, -32768, -2.25),
        (127, 32767, 1.5),
    ]


def test_boolean_column_predicates(spark, tmp_path):
    """BOOLEAN (bit-packed, never dictionary-encoded —
    hdfs-parquet-scanner.cc:607-634): round-trip + predicate."""
    df = spark.range(100).select(
        "id", (F.col("id") % 3 == 0).alias("flag")
    )
    out = str(tmp_path / "bools")
    write_parquet(df, out)
    back = read_parquet(spark, out)
    assert back.filter(F.col("flag")).count() == 34
    assert duck_rows(out, "SELECT COUNT(*) FROM t WHERE flag")[0][0] == 34


@pytest.mark.parametrize("null_frac", [0.0, 0.5, 1.0])
def test_null_density_sweep(spark, tmp_path, null_frac):
    """0% / 50% / 100% NULL columns (nullable_edges fixture; the all-NULL
    page is the reference's PLAIN-fallback edge,
    hdfs-parquet-table-writer.cc:635-638)."""
    n = 1000
    df = spark.range(n).select(
        "id",
        F.when((F.col("id") % 2 == 0) if null_frac == 0.5 else F.lit(null_frac == 1.0), None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    out = str(tmp_path / f"nulls_{int(null_frac*100)}")
    write_parquet(df, out)
    back = read_parquet(spark, out)
    got_nulls = back.filter(F.col("v").isNull()).count()
    expect = {0.0: 0, 0.5: n // 2, 1.0: n}[null_frac]
    assert got_nulls == expect
    assert duck_rows(out, "SELECT COUNT(*) FROM t WHERE v IS NULL")[0][0] == expect


def test_dictionary_fallback_high_cardinality(spark, tmp_path):
    """The reference's dictionary caps at 2^16-1 entries then falls back
    to PLAIN (hdfs-parquet-table-writer.cc:59); parquet-mr does the same
    on dictionary-page overflow.  90k distinct strings must survive the
    fallback path byte-for-byte."""
    n = 90_000
    df = spark.range(n).select(
        "id", F.concat(F.lit("unique_value_"), F.col("id").cast("string")).alias("s")
    )
    out = str(tmp_path / "hicard")
    write_parquet(df, out, max_records_per_file=None)
    back = read_parquet(spark, out)
    assert back.select(F.count_distinct("s")).collect()[0][0] == n
    assert duck_rows(out, "SELECT COUNT(DISTINCT s) FROM t")[0][0] == n


def test_timestamp_precision_roundtrip(spark, tmp_path):
    """Microsecond timestamps survive write/read in both engines (the
    reference stores INT96 nanos; Spark writes INT64 micros — same
    logical value contract)."""
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1, TIMESTAMP_NTZ '2024-03-01 12:34:56.789012'),
          (2, TIMESTAMP_NTZ '1969-12-31 23:59:59.999999')
        AS t(id, ts)
        """
    )
    out = str(tmp_path / "ts")
    write_parquet(df, out)
    back = {r.id: r.ts for r in read_parquet(spark, out).collect()}
    assert back[1].microsecond == 789012
    assert str(duck_rows(out, "SELECT ts FROM t WHERE id = 2")[0][0]) == "1969-12-31 23:59:59.999999"
