"""fledir storage round-trip: the FLE byte layout as a real on-disk
format (encode → serialize → file → parse → decode must be the identity
on values AND validity — fle-encoding.h:8315-9812's encode/decode
cycle)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
    decode_segment,
    encode_segment,
)


def test_segment_roundtrip_basic():
    rf = np.array(["N", "A", "R", "N", "N", "R"], dtype=object)
    qty = np.array([1.0, 50.0, np.nan, 7.0, np.nan, 33.0])
    out_rf, out_qty, valid = decode_segment(encode_segment(rf, qty))
    assert list(out_rf) == list(rf)
    assert valid.tolist() == [True, True, False, True, False, True]
    assert out_qty[valid].tolist() == [1, 50, 7, 33]


def test_segment_roundtrip_integral_input_all_valid():
    rf = np.array(["X"] * 130, dtype=object)  # spans 3 blocks
    qty = np.arange(130, dtype=np.int64)
    out_rf, out_qty, valid = decode_segment(encode_segment(rf, qty))
    assert valid.all()
    assert out_qty.tolist() == list(range(130))
    assert len(out_rf) == 130


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_segment(b"NOPE" + b"\x00" * 64)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R", "zz", "é"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=2**20)),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_segment_roundtrip_fuzz(rows):
    rf = np.array([r[0] for r in rows], dtype=object)
    qty = np.array(
        [float("nan") if r[1] is None else float(r[1]) for r in rows]
    )
    out_rf, out_qty, valid = decode_segment(encode_segment(rf, qty))
    assert list(out_rf) == list(rf)
    for i, r in enumerate(rows):
        if r[1] is None:
            assert not valid[i]
        else:
            assert valid[i] and out_qty[i] == r[1]


def test_datasource_read_matches_parquet_base(spark, sf_dir):
    """End-to-end through the registered DataSource: write lineitem
    through the fledir writer, read it back, and compare the aggregate
    against the parquet base table computed in the same session."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        materialize_fle_dir,
        register_fledir,
    )

    path = materialize_fle_dir(spark, sf_dir)
    register_fledir(spark)
    got = (
        spark.read.format("fledir")
        .option("path", path)
        .load()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("l_quantity").alias("np"),
            F.sum("l_quantity").alias("s"),
        )
    )
    base = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.nullif(F.col("l_quantity").cast("bigint"), F.lit(10)).alias("q"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("q").alias("np"),
            F.sum("q").alias("s"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_reader_pushdown_kernel_masks():
    """Pushed conjuncts must be evaluated on the ENCODED planes: build a
    segment, push filters through the reader API, and check the decoded
    survivors against direct evaluation; unsupported filters come back
    as residuals."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        StringContains,
    )

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        parse_segment,
    )

    rf = np.array(["A", "N", "R"] * 50, dtype=object)
    qty = np.array([float(i % 53) if i % 7 else float("nan") for i in range(150)])
    payload = encode_segment(rf, qty)

    r = FleDirReader({"path": "/nonexistent"})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("l_quantity",), 30),
                EqualTo(("l_returnflag",), "R"),
                StringContains(("l_returnflag",), "X"),  # not pushable
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["StringContains"]
    assert len(r.pushed) == 2

    mask = r._segment_mask(parse_segment(payload))
    got_rf, got_qty, valid = decode_segment(payload, mask=mask)
    # direct evaluation on the raw arrays
    want = [
        (rf[i], int(qty[i]))
        for i in range(150)
        if not np.isnan(qty[i]) and qty[i] >= 30 and rf[i] == "R"
    ]
    assert valid.all()
    assert list(zip(got_rf, got_qty)) == want
    assert len(want) > 0


def test_reader_pushdown_domain_short_circuit_and_empty_segment():
    from pyspark.sql.datasource import EqualTo, LessThanOrEqual

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        parse_segment,
    )

    rf = np.array(["A", "N"] * 40, dtype=object)
    qty = np.arange(80, dtype=np.int64).astype(float)
    payload = encode_segment(rf, qty)
    seg = parse_segment(payload)

    # literal above the dictionary domain: le short-circuits to all-true
    r = FleDirReader({"path": "x"})
    list(r.pushFilters([LessThanOrEqual(("l_returnflag",), "Z")]))
    assert r._segment_mask(seg) is None or (
        decode_segment(payload, mask=r._segment_mask(seg))[1].size == 80
    )

    # equality on a value absent from the dictionary: nothing survives,
    # the whole segment is kernel-rejected with zero decodes
    r2 = FleDirReader({"path": "x"})
    list(r2.pushFilters([EqualTo(("l_returnflag",), "R")]))
    m = r2._segment_mask(seg)
    assert m is not None and not m.any()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=63)),
        ),
        min_size=1,
        max_size=200,
    ),
    st.lists(
        st.sampled_from(
            [
                ("l_quantity", "ge", 30),
                ("l_quantity", "lt", 10),
                ("l_quantity", "le", 55),
                ("l_quantity", "gt", 62),
                ("l_quantity", "eq", 7),
                ("l_quantity", "in", (1, 5, 63)),
                ("l_quantity", "is_null", None),
                ("l_quantity", "is_not_null", None),
                ("l_returnflag", "eq", "N"),
                ("l_returnflag", "eq", "Z"),
                ("l_returnflag", "le", "M"),
                ("l_returnflag", "ge", "A"),
                ("l_returnflag", "lt", "A"),
                ("l_returnflag", "in", ("A", "R", "X")),
            ]
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_pushdown_mask_fuzz_matches_direct_eval(rows, conjuncts):
    """Any conjunction of pushable filters must produce exactly the rows
    direct evaluation keeps — SQL semantics (NULL never satisfies a
    comparison; IS NULL/IS NOT NULL ride validity)."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        parse_segment,
    )

    rf = np.array([r[0] for r in rows], dtype=object)
    qty = np.array(
        [float("nan") if r[1] is None else float(r[1]) for r in rows]
    )
    payload = encode_segment(rf, qty)
    r = FleDirReader({"path": "x"})
    r.pushed = [(c[0], c[1], c[2]) for c in conjuncts]
    mask = r._segment_mask(parse_segment(payload))
    got_rf, got_qty, got_valid = decode_segment(payload, mask=mask)

    def keep(i) -> bool:
        for col, op, val in conjuncts:
            if col == "l_quantity":
                q = rows[i][1]
                if op == "is_null":
                    if q is not None:
                        return False
                elif op == "is_not_null":
                    if q is None:
                        return False
                elif q is None:
                    return False  # NULL satisfies no comparison
                elif op == "in":
                    if q not in val:
                        return False
                elif op == "eq" and not q == val:
                    return False
                elif op == "lt" and not q < val:
                    return False
                elif op == "le" and not q <= val:
                    return False
                elif op == "gt" and not q > val:
                    return False
                elif op == "ge" and not q >= val:
                    return False
            else:
                f = rows[i][0]
                if op == "in":
                    if f not in val:
                        return False
                elif op == "eq" and not f == val:
                    return False
                elif op == "le" and not f <= val:
                    return False
                elif op == "ge" and not f >= val:
                    return False
                elif op == "lt" and not f < val:
                    return False
        return True

    want = [
        (rows[i][0], rows[i][1]) for i in range(len(rows)) if keep(i)
    ]
    got = [
        (got_rf[j], int(got_qty[j]) if got_valid[j] else None)
        for j in range(len(got_rf))
    ]
    assert got == want


def test_chunk_stats_footer_roundtrip_and_kernel_equivalence():
    """Round 8: the BSTA footer carries per-chunk code-space min/max;
    the reader's chunk-skipping kernel must produce EXACTLY the full
    kernel's mask on every op — and a footer-less (pre-round-8) segment
    must fall back to the full path."""
    from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
        FleKernels,
        pack_validity,
    )
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        _CHUNK_BLOCKS,
        _STATS_MAGIC,
        FleDirReader,
        encode_segment_columns,
        parse_segment,
    )

    # 5000 sorted values with a NULL band → 5 chunks (1024 vals each),
    # one all-NULL chunk, a ragged tail
    n = 5000
    vals = np.arange(n, dtype=np.float64)
    vals[1024:2048] = np.nan  # chunk 1 entirely NULL
    payload = encode_segment_columns([("q", vals)])
    seg = parse_segment(payload)
    assert seg.chunk_stats is not None and seg.chunk_blocks == _CHUNK_BLOCKS
    mins, maxs = seg.chunk_stats[0]
    assert mins.size == 5
    assert int(mins[0]) == 0 and int(maxs[0]) == 1023
    assert int(mins[1]) == 2**64 - 1 and int(maxs[1]) == 0  # all-NULL
    assert int(mins[4]) == 4096 and int(maxs[4]) == n - 1

    c = seg.columns[0]
    full = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
    for op, arg in [
        ("eq", 3000), ("eq", 1500), ("lt", 512), ("le", 1023),
        ("gt", 4999), ("ge", 4096), ("lt", 0), ("gt", 10**7),
        ("in", (5, 1500, 2500, 4999)), ("in", (1100, 1200)),
        ("eq", -1), ("ge", -5),
    ]:
        want = full.in_(arg) if op == "in" else getattr(full, op)(arg)
        got = FleDirReader._chunk_kernel(seg, c, 0, op, arg)
        assert np.array_equal(got, want), (op, arg)

    # pre-footer fallback: strip the footer, masks still correct
    foot = payload.rindex(_STATS_MAGIC)
    legacy = parse_segment(payload[:foot])
    assert legacy.chunk_stats is None
    got = FleDirReader._chunk_kernel(legacy, legacy.columns[0], 0, "eq", 3000)
    assert np.array_equal(got, full.eq(3000))

    # the chunk path actually SKIPS: a mid-file band predicate touches
    # only its chunks (verified via the validity gather size — monkeyless
    # check: masks outside candidate chunks are zero words)
    band = FleDirReader._chunk_kernel(seg, c, 0, "eq", 3000)
    assert band[: 2048 // 64].sum() == 0 and band[3072 // 64:].sum() == 0
    # footer overhead stays tiny
    assert len(payload) - foot < 0.02 * len(payload)
    _ = pack_validity  # silence unused-import lint in minimal envs


def test_chunk_kernel_out_of_domain_literals():
    """Literals outside the u64 code domain (negative, > 2^64-1) must
    route through the same domain short-circuits as the kernels — the
    clamp hazard: lt 2^70 against a width-64 all-max chunk matches EVERY
    row, which a naive min<clamped(u64max) candidate test would refute."""
    from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
        FleKernels,
        fle_pack,
    )
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        ParsedColumn,
        ParsedSegment,
        _chunk_min_max,
        encode_segment_columns,
        parse_segment,
    )

    # ordinary segment via the encode layer
    seg = parse_segment(
        encode_segment_columns([("q", np.arange(3000, dtype=np.int64))])
    )
    c = seg.columns[0]
    full = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
    for op, arg in [
        ("eq", 2**64 + 1), ("lt", 2**70), ("ge", 2**70),
        ("gt", -3), ("le", -1),
        ("in", (5, 2**64 + 3)), ("in", (2**65,)), ("in", (-4, 100)),
    ]:
        got = FleDirReader._chunk_kernel(seg, c, 0, op, arg)
        want = full.in_(arg) if op == "in" else getattr(full, op)(arg)
        assert np.array_equal(got, want), (op, arg)

    # width-64 all-max data (encode layer caps at int64: build directly)
    codes = np.full(2100, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    planes, n = fle_pack(codes, 64)
    col = ParsedColumn(name="q", kind=0, nullable=False, validity=None,
                       dictionary=None, width=64, planes=planes)
    mins, maxs = _chunk_min_max(codes, np.ones(n, bool), planes.shape[0])
    wide = ParsedSegment(n=n, n_blocks=planes.shape[0], columns=[col],
                         chunk_blocks=16, chunk_stats=[(mins, maxs)])
    wfull = FleKernels(planes, 64, n)
    for op, arg in [
        ("lt", 2**70), ("le", 2**64), ("eq", 2**64),
        ("ge", 2**64 + 1), ("gt", 2**70),
    ]:
        got = FleDirReader._chunk_kernel(wide, col, 0, op, arg)
        assert np.array_equal(got, getattr(wfull, op)(arg)), (op, arg)


def test_fledir_commit_protocol(tmp_path):
    """Writer commit seals the directory with a _DONE manifest listing
    every segment; an unsealed directory is unreadable (parquet-style
    write visibility); abort removes this attempt's files."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        FleDirWriter,
    )

    out = str(tmp_path / "fle_out")
    w = FleDirWriter({"path": out}, overwrite=True)

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    rf = np.array(["A", "R"] * 10, dtype=object)
    qty = np.arange(20, dtype=np.int64).astype(float)
    payload = encode_segment(rf, qty)
    msg = w.write([_Row(1, payload), _Row(2, payload)])
    assert sorted(msg.files) == ["seg_1.fle", "seg_2.fle"]

    # not committed yet: reader refuses the unsealed directory
    r = FleDirReader({"path": out})
    with pytest.raises(ValueError, match="_DONE"):
        r.partitions()

    w.commit([msg])
    parts = FleDirReader({"path": out}).partitions()
    paths = sorted(p for part in parts for p in part.paths)
    assert [os.path.basename(p) for p in paths] == ["seg_1.fle", "seg_2.fle"]
    rows = sum(
        len(decode_segment(open(p, "rb").read())[0]) for p in paths
    )
    assert rows == 40

    # abort path: pre-commit the attempt's data lives under TEMP names
    # only (never a visible .fle), and abort removes them; committed
    # files stay untouched
    w2 = FleDirWriter({"path": out}, overwrite=False)
    msg2 = w2.write([_Row(9, payload)])
    assert not os.path.exists(os.path.join(out, "seg_9.fle"))
    assert any(".fle.tmp-" in f for f in os.listdir(out))
    w2.abort([msg2, None])
    assert not any(".fle.tmp-" in f for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "seg_1.fle"))


def test_fledir_append_merges_manifest_and_overwrite_is_deferred(tmp_path):
    """Append commits MERGE the previous manifest (old segments stay
    readable); an overwrite that never commits leaves the previous
    committed data fully intact — destruction happens only after the
    new _DONE is durable (ADVICE r7: planning-time deletion destroyed
    old data on a failed overwrite)."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        FleDirWriter,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    out = str(tmp_path / "fle_def")
    payload = encode_segment(
        np.array(["A", "R"], dtype=object), np.array([1.0, 2.0])
    )
    w1 = FleDirWriter({"path": out}, overwrite=True)
    w1.commit([w1.write([_Row(1, payload)])])

    # append: new segment joins the old one in the manifest
    w2 = FleDirWriter({"path": out}, overwrite=False)
    w2.commit([w2.write([_Row(2, payload)])])
    parts = FleDirReader({"path": out}).partitions()
    names = sorted(
        os.path.basename(p) for part in parts for p in part.paths
    )
    assert names == ["seg_1.fle", "seg_2.fle"]

    # overwrite attempt that aborts: old directory state survives
    w3 = FleDirWriter({"path": out}, overwrite=True)
    msg3 = w3.write([_Row(3, payload)])
    assert os.path.exists(os.path.join(out, "seg_1.fle"))  # still there
    w3.abort([msg3])
    parts = FleDirReader({"path": out}).partitions()
    names = sorted(
        os.path.basename(p) for part in parts for p in part.paths
    )
    assert names == ["seg_1.fle", "seg_2.fle"]  # nothing destroyed

    # overwrite that commits: only the new segment remains
    w4 = FleDirWriter({"path": out}, overwrite=True)
    w4.commit([w4.write([_Row(4, payload)])])
    assert sorted(os.listdir(out)) == ["_DONE", "_history", "seg_4.fle"]


def test_encode_object_ints_beyond_2_53_exact():
    """Object-dtype integer columns must NOT detour through float64:
    2**60 + 1 has no float64 representation, so a lossy path would
    round-trip a different value (ADVICE r7 medium)."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    big = np.array([2**60 + 1, 5, None, 2**63 - 1], dtype=object)
    payload = encode_segment_columns([("v", big)])
    vals, valid = decode_segment_columns(parse_segment(payload))["v"]
    assert valid.tolist() == [True, True, False, True]
    got = [int(np.uint64(v)) for v, ok in zip(vals, valid) if ok]
    assert got == [2**60 + 1, 5, 2**63 - 1]
    with pytest.raises(ValueError, match="non-integral"):
        encode_segment_columns([("v", np.array([1, 2.5], dtype=object))])
    # negatives now route to the OFFSET kind and round-trip
    neg = decode_segment_columns(parse_segment(
        encode_segment_columns([("v", np.array([1, -2], dtype=object))])
    ))["v"][0]
    assert neg.tolist() == [1, -2]
    with pytest.raises(ValueError, match="bigint decode"):
        encode_segment_columns([("v", np.array([2**63], dtype=object))])


def test_pushdown_rejects_fractional_literals_and_missing_columns():
    """A fractional literal stays residual (int(10.5) would answer the
    wrong predicate), and a pushed conjunct whose column is absent from
    a segment fails loudly instead of returning unfiltered rows
    (ADVICE r7)."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
    )

    class _Lt:
        def __init__(self, col, value):
            self.attribute, self.value = (col,), value

    _Lt.__name__ = "LessThan"

    r = FleDirReader({"path": "/nonexistent"})
    residual = list(r.pushFilters([_Lt("q", 10.5), _Lt("q", 10.0)]))
    assert len(residual) == 1 and residual[0].value == 10.5
    assert r.pushed == [("q", "lt", 10.0)]

    payload = encode_segment(
        np.array(["A"], dtype=object), np.array([1.0])
    )
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        parse_segment,
    )

    r2 = FleDirReader({"path": "/nonexistent"})
    r2.pushed = [("absent_col", "lt", 5)]
    with pytest.raises(ValueError, match="absent"):
        r2._segment_mask(parse_segment(payload))


def test_multicolumn_segment_roundtrip():
    """The schema-general container: N columns of mixed kinds (two dict
    strings — one nullable, one nullable int, one plain int) round-trip
    values AND per-column validity."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    rf = np.array(["N", "A", "R", "N"], dtype=object)
    status = np.array(["F", None, "O", "F"], dtype=object)
    qty = np.array([1.0, np.nan, 7.0, 33.0])
    ln = np.array([1, 2, 3, 4], dtype=np.int64)
    payload = encode_segment_columns(
        [("rf", rf), ("status", status), ("qty", qty), ("ln", ln)]
    )
    cols = decode_segment_columns(parse_segment(payload))
    assert list(cols["rf"][0]) == list(rf) and cols["rf"][1].all()
    sv, svalid = cols["status"]
    assert svalid.tolist() == [True, False, True, True]
    assert [sv[i] for i in (0, 2, 3)] == ["F", "O", "F"]
    qv, qvalid = cols["qty"]
    assert qvalid.tolist() == [True, False, True, True]
    assert qv[qvalid].tolist() == [1, 7, 33]
    assert cols["ln"][0].tolist() == [1, 2, 3, 4] and cols["ln"][1].all()


def test_encode_rejects_fractional_and_offsets_negative():
    """Fractional input still raises; negative integers now route to
    the OFFSET kind (round 8): the container applies the
    order-preserving offset itself instead of asking the caller to."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        _KIND_OFFSET,
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    with pytest.raises(ValueError, match="non-integral"):
        encode_segment_columns([("q", np.array([1.0, 2.5]))])
    with pytest.raises(ValueError, match="non-integral"):
        encode_segment_columns([("q", np.array([-1.5, 2.0]))])

    seg = parse_segment(
        encode_segment_columns([("q", np.array([-1, 2], dtype=np.int64))])
    )
    assert seg.columns[0].kind == _KIND_OFFSET
    vals, valid = decode_segment_columns(seg)["q"]
    assert vals.tolist() == [-1, 2] and valid.all()


def test_offset_kind_signed_roundtrip_and_pushdown():
    """Signed int64 columns (incl. extremes and NULLs) round-trip via
    the offset kind, and pushed conjuncts with negative / crossing-zero
    literals evaluate correctly in translated code space — both kernel
    and chunk-stats tiers."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
        segment_stats,
    )

    lo, hi = -(2**63), 2**63 - 1
    vals = np.array(
        [lo, -5, None, 0, 7, hi, -1000000, 42], dtype=object
    )
    seg = parse_segment(encode_segment_columns([("v", vals)]))
    got, valid = decode_segment_columns(seg)["v"]
    assert valid.tolist() == [True, True, False, True, True, True, True, True]
    assert [int(got[i]) for i in np.flatnonzero(valid)] == [
        lo, -5, 0, 7, hi, -1000000, 42
    ]

    # manifest stats live in value space
    s = segment_stats(seg)["v"]
    assert s["min"] == lo and s["max"] == hi and s["has_null"]

    # pushed predicates with signed literals, validated against direct
    # evaluation (NULL satisfies no comparison)
    raw = [None if v is None else int(v) for v in vals]
    for op, lit, direct in [
        ("ge", 0, lambda x: x >= 0),
        ("lt", 0, lambda x: x < 0),
        ("le", -5, lambda x: x <= -5),
        ("gt", -1000001, lambda x: x > -1000001),
        ("eq", lo, lambda x: x == lo),
        ("in", (-5, 42, 999), lambda x: x in (-5, 42, 999)),
    ]:
        r = FleDirReader({"path": "x"})
        r.pushed = [("v", op, lit)]
        mask = r._segment_mask(seg)
        kept, _ = decode_segment_columns(seg, mask=mask)["v"]
        want = [x for x in raw if x is not None and direct(x)]
        assert sorted(int(k) for k in kept) == sorted(want), (op, lit)

    # ordered data: chunk stats refute in translated code space
    big = np.arange(-3000, 2000, dtype=np.int64)
    seg2 = parse_segment(encode_segment_columns([("v", big)]))
    r = FleDirReader({"path": "x"})
    r.pushed = [("v", "ge", -10), ("v", "le", 10)]
    mask = r._segment_mask(seg2)
    kept, _ = decode_segment_columns(seg2, mask=mask)["v"]
    assert kept.tolist() == list(range(-10, 11))
    # blocks far from the band carry zero mask words (chunk-refuted)
    assert mask[:40].sum() == 0 and mask[-20:].sum() == 0


def test_long_dictionary_entry_roundtrips():
    """u16 length prefix: entries beyond the old u8 limit round-trip;
    the 65535-byte format bound raises a clear error."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    long_entry = "x" * 300
    vals = np.array([long_entry, "a", long_entry], dtype=object)
    payload = encode_segment_columns([("s", vals)])
    got, valid = decode_segment_columns(parse_segment(payload))["s"]
    assert list(got) == [long_entry, "a", long_entry] and valid.all()
    with pytest.raises(ValueError, match="65535"):
        encode_segment_columns(
            [("s", np.array(["y" * 70_000], dtype=object))]
        )


def test_writer_overwrite_clears_stale_segments(tmp_path):
    """mode('overwrite') must REPLACE the directory: stale segments from
    a previous commit (or a crashed unsealed attempt) do not survive
    into the new manifest or the file listing."""
    import os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        FleDirWriter,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    out = str(tmp_path / "fle_over")
    payload = encode_segment(
        np.array(["A"], dtype=object), np.array([1.0])
    )
    w1 = FleDirWriter({"path": out}, overwrite=True)
    w1.commit([w1.write([_Row(1, payload), _Row(2, payload)])])
    # leave a stale unsealed file behind too
    with open(os.path.join(out, "seg_999.fle"), "wb") as fh:
        fh.write(payload)

    w2 = FleDirWriter({"path": out}, overwrite=True)
    w2.commit([w2.write([_Row(7, payload)])])
    assert sorted(os.listdir(out)) == ["_DONE", "_history", "seg_7.fle"]
    parts = FleDirReader({"path": out}).partitions()
    assert [os.path.basename(p) for part in parts for p in part.paths] == [
        "seg_7.fle"
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.one_of(st.none(), st.sampled_from(["F", "O", "P"])),
            st.one_of(st.none(), st.integers(min_value=0, max_value=63)),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=1,
        max_size=200,
    ),
    st.lists(
        st.sampled_from(
            [
                ("qty", "ge", 30),
                ("qty", "in", (1, 5, 63)),
                ("qty", "is_null", None),
                ("ln", "le", 3),
                ("ln", "eq", 7),
                ("ln", "in", (1, 2)),
                ("rf", "eq", "N"),
                ("rf", "ge", "N"),
                ("status", "eq", "F"),
                ("status", "is_not_null", None),
                ("status", "is_null", None),
                ("status", "le", "Z"),
                ("status", "lt", "F"),
            ]
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_multicolumn_pushdown_fuzz(rows, conjuncts):
    """Per-column conjunct routing on the general container: any
    conjunction over four mixed-kind columns must keep exactly the rows
    direct evaluation keeps (NULL satisfies no comparison; nullable dict
    columns AND their validity into domain short-circuits too)."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    payload = encode_segment_columns([
        ("rf", np.array([r[0] for r in rows], dtype=object)),
        ("status", np.array([r[1] for r in rows], dtype=object)),
        ("qty", np.array(
            [float("nan") if r[2] is None else float(r[2]) for r in rows]
        )),
        ("ln", np.array([r[3] for r in rows], dtype=np.int64)),
    ])
    r = FleDirReader({"path": "x"})
    r.pushed = list(conjuncts)
    seg = parse_segment(payload)
    cols = decode_segment_columns(seg, mask=r._segment_mask(seg))

    def keep(i) -> bool:
        vals = {"rf": rows[i][0], "status": rows[i][1], "qty": rows[i][2],
                "ln": rows[i][3]}
        for col, op, lit in conjuncts:
            v = vals[col]
            if op == "is_null":
                if v is not None:
                    return False
            elif op == "is_not_null":
                if v is None:
                    return False
            elif v is None:
                return False
            elif op == "in":
                if v not in lit:
                    return False
            elif op == "eq" and not v == lit:
                return False
            elif op == "lt" and not v < lit:
                return False
            elif op == "le" and not v <= lit:
                return False
            elif op == "gt" and not v > lit:
                return False
            elif op == "ge" and not v >= lit:
                return False
        return True

    want = [
        (rows[i][0], rows[i][1], rows[i][2], rows[i][3])
        for i in range(len(rows))
        if keep(i)
    ]
    got = [
        (
            cols["rf"][0][j],
            cols["status"][0][j] if cols["status"][1][j] else None,
            int(cols["qty"][0][j]) if cols["qty"][1][j] else None,
            int(cols["ln"][0][j]),
        )
        for j in range(len(cols["rf"][0]))
    ]
    assert got == want


def test_schema_inference_from_segment_header(tmp_path):
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirWriter,
        encode_segment_columns,
        infer_fledir_schema,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    out = str(tmp_path / "fle_schema")
    payload = encode_segment_columns([
        ("name", np.array(["a"], dtype=object)),
        ("v", np.array([3], dtype=np.int64)),
    ])
    w = FleDirWriter({"path": out}, overwrite=True)
    w.commit([w.write([_Row(1, payload)])])
    assert infer_fledir_schema(out) == "name string, v bigint"


def test_manifest_stats_prune_files_at_planning_time(tmp_path):
    """The parquet footer-stats skip at file granularity: the writer
    derives per-segment min/max ON THE PLANES (plane_min_max — zero
    decode) into the _DONE manifest, and `partitions()` drops files the
    pushed conjunction provably cannot match — on the driver, before any
    scan task exists (hdfs-parquet-scanner.cc:1006-1038)."""
    import os as _os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        FleDirWriter,
        encode_segment_columns,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    def seg(qty_lo, statuses, with_null=False):
        qty = np.arange(qty_lo, qty_lo + 10).astype(float)
        if with_null:
            qty[0] = float("nan")
        status = np.array((statuses * 10)[:10], dtype=object)
        return encode_segment_columns(
            [("status", status), ("qty", qty)]
        )

    out = str(tmp_path / "fle_stats")
    w = FleDirWriter({"path": out}, overwrite=True)
    w.commit([w.write([
        _Row(1, seg(1, ["a", "b"])),            # qty 1..10,  status a-b
        _Row(2, seg(40, ["x", "z"], True)),     # qty 41..49 + a NULL, x-z
    ])])

    def surviving(pushed):
        r = FleDirReader({"path": out})
        r.pushed = pushed
        return sorted(
            _os.path.basename(p)
            for part in r.partitions()
            for p in part.paths
        )

    # no filters: both files
    assert surviving([]) == ["seg_1.fle", "seg_2.fle"]
    # int range refutes seg_1
    assert surviving([("qty", "ge", 30)]) == ["seg_2.fle"]
    assert surviving([("qty", "eq", 45)]) == ["seg_2.fle"]
    assert surviving([("qty", "in", (2, 7))]) == ["seg_1.fle"]
    # string stats refute via the sorted dictionary endpoints
    assert surviving([("status", "eq", "y")]) == ["seg_2.fle"]
    assert surviving([("status", "le", "b")]) == ["seg_1.fle"]
    # IS NULL prunes the null-free file
    assert surviving([("qty", "is_null", None)]) == ["seg_2.fle"]
    # contradiction prunes everything → one EMPTY partition, zero rows
    r = FleDirReader({"path": out})
    r.pushed = [("qty", "gt", 1000)]
    parts = r.partitions()
    assert [p for part in parts for p in part.paths] == []
    assert list(r.read(parts[0])) == []
    # stats must not over-prune: a satisfiable conjunction keeps the file
    assert surviving([("qty", "ge", 45), ("status", "ge", "x")]) == [
        "seg_2.fle"
    ]


def test_segment_stats_match_decoded_values():
    """Manifest stats are exact: plane-kernel min/max == decoded min/max
    for every column kind, and has_null reflects the validity words."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        encode_segment_columns,
        parse_segment,
        segment_stats,
    )

    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 200))
        qty = rng.integers(0, 1000, size=n).astype(float)
        qty[rng.random(n) < 0.2] = float("nan")
        words = np.array(["ab", "zz", "mm", "k"], dtype=object)
        status = words[rng.integers(0, 4, size=n)]
        payload = encode_segment_columns([("s", status), ("q", qty)])
        stats = segment_stats(parse_segment(payload))
        valid = ~np.isnan(qty)
        if valid.any():
            assert stats["q"]["min"] == int(qty[valid].min())
            assert stats["q"]["max"] == int(qty[valid].max())
        else:
            assert stats["q"]["min"] is None
        assert stats["q"]["has_null"] == bool((~valid).any())
        assert stats["s"]["min"] == min(status)
        assert stats["s"]["max"] == max(status)
        assert stats["s"]["has_null"] is False


def test_user_schema_prunes_decoded_columns(spark, sf_dir):
    """Projection pruning: a user-supplied SUBSET schema makes the
    reader decode only those columns' plane sections (the
    one-reader-per-materialized-slot model — unreferenced columns never
    materialize), and the values still match the base table."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        decode_segment_columns,
        encode_segment_columns,
        materialize_fle_multi_dir,
        parse_segment,
        register_fledir,
    )

    # unit: decode restricted to one column returns only that column
    payload = encode_segment_columns([
        ("a", np.array(["x", "y"], dtype=object)),
        ("b", np.array([1, 2], dtype=np.int64)),
    ])
    only_b = decode_segment_columns(parse_segment(payload), columns=["b"])
    assert list(only_b) == ["b"]

    path = materialize_fle_multi_dir(spark, sf_dir)
    register_fledir(spark)
    got = (
        spark.read.format("fledir")
        .schema("l_returnflag string, l_quantity bigint")  # 2 of 4 cols
        .option("path", path)
        .load()
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    want = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.nullif(F.col("l_quantity").cast("bigint"), F.lit(10)).alias(
                "l_quantity"
            ),
        )
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_pushed_filter_on_pruned_column(spark, sf_dir):
    """A filter column FULLY consumed by pushdown can be pruned out of
    the read schema by Catalyst (the conjunct is not residual, so
    nothing above the scan references it) — the kernels must still
    evaluate it on the plane words even though its values are never
    decoded, and the surviving rows must match the base table."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        materialize_fle_multi_dir,
        register_fledir,
    )

    path = materialize_fle_multi_dir(spark, sf_dir)
    register_fledir(spark)
    got = (
        spark.read.format("fledir")
        .option("path", path)
        .load()
        .filter(F.col("l_quantity") >= 40)  # pushable: no residual
        .select("l_returnflag")  # filter column NOT selected
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.nullif(F.col("l_quantity").cast("bigint"), F.lit(10)).alias("q"),
        )
        .filter(F.col("q") >= 40)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_sorted_fle_layout_prunes_files_for_range(spark, sf_dir):
    """End-to-end stat pruning on the engine-materialized sorted FLE
    layout: a narrow quantity range must leave MOST manifest files
    unopened (driver-side refutation), and the surviving files must
    still produce exactly the base table's rows."""
    import os as _os

    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        materialize_fle_sorted_dir,
        register_fledir,
    )

    path = materialize_fle_sorted_dir(spark, sf_dir)
    with open(_os.path.join(path, "_DONE")) as fh:
        total = len([ln for ln in fh.read().splitlines() if ln])
    assert total >= 8  # the range partitioning actually segmented

    r = FleDirReader({"path": path})
    r.pushed = [("l_quantity", "ge", 47), ("l_quantity", "le", 49)]
    surviving = sum(len(p.paths) for p in r.partitions())
    assert 0 < surviving <= total // 2, (surviving, total)

    register_fledir(spark)
    got = (
        spark.read.format("fledir")
        .option("path", path)
        .load()
        .filter(F.col("l_quantity").between(47, 49))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    want = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("l_quantity"),
        )
        .filter(F.col("l_quantity").between(47, 49))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_chunked_fle_layout_skips_mid_file(spark):
    """The chunk-skip tier's own layout (round 8): locally-sorted,
    non-range-partitioned segments — the MANIFEST must keep every file
    (each spans ~the full domain), every segment must carry a BSTA
    footer whose stats refute most chunks for a narrow band predicate,
    and the results must match the parquet base exactly.  Runs at
    sf0.01 (60k rows): the sf0.001 fixture's ~750-row partitions fit in
    one 1024-value chunk, which leaves nothing to skip."""
    import os as _os

    import numpy as _np

    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        materialize_fle_chunked_dir,
        parse_segment,
        register_fledir,
    )

    sf_dir = "/root/testdata/sf0.01"
    path = materialize_fle_chunked_dir(spark, sf_dir)
    with open(_os.path.join(path, "_DONE")) as fh:
        names = [
            ln.partition("\t")[0] for ln in fh.read().splitlines() if ln
        ]
    assert len(names) >= 8

    # file tier: nothing refutable — partitions() keeps every file
    r = FleDirReader({"path": path})
    r.pushed = [("l_quantity", "ge", 23), ("l_quantity", "le", 24)]
    surviving = sum(len(p.paths) for p in r.partitions())
    assert surviving == len(names)

    # chunk tier: within each multi-chunk segment, most chunks refuted
    checked = 0
    for name in names:
        with open(_os.path.join(path, name), "rb") as fh:
            seg = parse_segment(fh.read())
        assert seg.chunk_stats is not None
        mins, maxs = seg.chunk_stats[
            [c.name for c in seg.columns].index("l_quantity")
        ]
        if mins.size < 4:
            continue  # tiny tail segment: no skip potential
        cand = (mins <= _np.uint64(24)) & (maxs >= _np.uint64(23))
        assert cand.sum() <= max(1, mins.size // 2), (
            name, int(cand.sum()), int(mins.size)
        )
        checked += 1
    assert checked >= 4  # locally-sorted layout produced real chunk runs

    register_fledir(spark)
    got = (
        spark.read.format("fledir")
        .option("path", path)
        .load()
        .filter(F.col("l_quantity").between(23, 24))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    want = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("l_quantity"),
        )
        .filter(F.col("l_quantity").between(23, 24))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_fledir_streaming_exactly_once(spark, tmp_path):
    """The streaming FLE scanner must deliver every segment's rows
    exactly once across micro-batches, with late-arriving segment files
    picked up by the next batch (offset = processed-name set), NULLs
    from the validity words intact."""
    import os as _os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDataSource,
    )

    try:
        spark.dataSource.register(FleDataSource)
    except Exception:
        pass
    d = str(tmp_path / "fle_stream_in")
    _os.makedirs(d)

    def put(seg_id: int):
        rf = np.array(["A", "N", "R"], dtype=object)
        qty = np.array([float(seg_id), np.nan, float(seg_id * 10)])
        with open(_os.path.join(d, f"seg_{seg_id:06d}.fle"), "wb") as fh:
            fh.write(encode_segment(rf, qty))

    for i in (1, 2, 3):
        put(i)
    stream = spark.readStream.format("fledir").option("path", d).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("fle_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for i in (4, 5):  # late arrivals
            put(i)
        q.processAllAvailable()
        rows = spark.table("fle_stream_out").collect()
    finally:
        q.stop()
    assert len(rows) == 15  # 5 segments x 3 rows, no re-delivery
    got = sorted(
        [(r.l_returnflag, r.l_quantity) for r in rows],
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    want = sorted(
        [("A", float(i)) for i in (1, 2, 3, 4, 5)]
        + [("N", None)] * 5
        + [("R", float(i * 10)) for i in (1, 2, 3, 4, 5)],
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    assert [(a, None if b is None else int(b)) for a, b in got] == [
        (a, None if b is None else int(b)) for a, b in want
    ]


def test_fle_stream_replay_between_offsets_matches_batch(tmp_path):
    """Checkpoint-recovery contract (VERDICT r7 #7): replaying a
    micro-batch with readBetweenOffsets must return EXACTLY the rows the
    original read() produced — across a boundary where a late segment
    arrived — and the union of all micro-batches must equal the batch
    read of the directory.  A torn (half-written) foreign file is left
    out of both the batch and the offset, then delivered once complete."""
    import os as _os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleStreamReader,
        decode_segment_columns,
        parse_segment,
    )

    d = str(tmp_path / "fle_replay")
    _os.makedirs(d)

    def put(seg_id: int):
        rf = np.array(["A", "N"], dtype=object)
        qty = np.array([float(seg_id), np.nan])
        with open(_os.path.join(d, f"seg_{seg_id:03d}.fle"), "wb") as fh:
            fh.write(encode_segment(rf, qty))

    put(1)
    put(2)
    r = FleStreamReader({"path": d})
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    rows1 = list(rows1)
    assert sorted(off1["names"]) == ["seg_001.fle", "seg_002.fle"]

    # late segment + a torn foreign write land between batches
    put(3)
    with open(_os.path.join(d, "seg_004.fle"), "wb") as fh:
        fh.write(b"FLE2\x00\x01")  # truncated mid-header
    rows2, off2 = r.read(off1)
    rows2 = list(rows2)
    # torn file: excluded from the batch AND the offset (retried later)
    assert "seg_004.fle" not in off2["names"]
    assert sorted(off2["names"]) == [
        "seg_001.fle", "seg_002.fle", "seg_003.fle"
    ]

    # failure replay: a fresh reader instance (post-crash) must rebuild
    # each micro-batch exactly from the checkpointed offset pair
    r2 = FleStreamReader({"path": d})
    assert list(r2.readBetweenOffsets(off0, off1)) == rows1
    assert list(r2.readBetweenOffsets(off1, off2)) == rows2

    # the torn file completes → next batch delivers it exactly once
    with open(_os.path.join(d, "seg_004.fle"), "wb") as fh:
        fh.write(encode_segment(
            np.array(["R"], dtype=object), np.array([40.0])
        ))
    rows3, off3 = r.read(off2)
    rows3 = list(rows3)
    assert [t[0] for t in rows3] == ["R"]
    assert "seg_004.fle" in off3["names"]

    # stream == batch: the union of micro-batches equals decoding every
    # committed segment directly
    batch = []
    for name in sorted(_os.listdir(d)):
        if name.endswith(".fle"):
            with open(_os.path.join(d, name), "rb") as fh:
                seg = parse_segment(fh.read())
            cols = decode_segment_columns(seg)
            order = [c.name for c in seg.columns]
            for j in range(seg.n):
                batch.append(tuple(
                    None if not cols[cn][1][j]
                    else str(cols[cn][0][j]) if seg.columns[i].kind == 1
                    else int(cols[cn][0][j])
                    for i, cn in enumerate(order)
                ))
    assert sorted(
        rows1 + rows2 + rows3, key=lambda t: (t[0], t[1] or 0)
    ) == sorted(batch, key=lambda t: (t[0], t[1] or 0))


def test_datasource_in_and_isnull_pushdown_e2e(spark, sf_dir):
    """IN-list and IS NULL conjuncts through a real Spark read: both are
    accepted by pushFilters (kernel OR-of-Eq; validity-word is_null) and
    the results must match the same filters applied to the parquet base."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        materialize_fle_dir,
        register_fledir,
    )

    path = materialize_fle_dir(spark, sf_dir)
    register_fledir(spark)
    fle = spark.read.format("fledir").option("path", path).load()
    base = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.nullif(F.col("l_quantity").cast("bigint"), F.lit(10)).alias(
            "l_quantity"
        ),
    )

    got_in = (
        fle.filter(F.col("l_quantity").isin(1, 5, 49))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    want_in = (
        base.filter(F.col("l_quantity").isin(1, 5, 49))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    )
    assert sorted(map(tuple, got_in.collect())) == sorted(
        map(tuple, want_in.collect())
    )

    got_null = fle.filter(F.col("l_quantity").isNull()).groupBy(
        "l_returnflag"
    ).count()
    want_null = base.filter(F.col("l_quantity").isNull()).groupBy(
        "l_returnflag"
    ).count()
    assert sorted(map(tuple, got_null.collect())) == sorted(
        map(tuple, want_null.collect())
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),                                   # overwrite?
            st.lists(st.integers(0, 4), min_size=1, max_size=3,
                     unique=True),                           # seg ids
            st.booleans(),                                   # commit?
        ),
        min_size=1,
        max_size=6,
    )
)
def test_writer_protocol_fuzz_matches_model(jobs):
    """Stateful fuzz of the round-8 atomic writer protocol: any sequence
    of append/overwrite jobs, each committed or aborted, must leave the
    directory's COMMITTED view (manifest ∩ files, byte-for-byte) equal
    to a trivial in-memory model — aborted jobs change nothing,
    committed appends merge (collision → new payload wins), committed
    overwrites replace everything, and no temp file ever survives."""
    import os
    import tempfile

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirWriter,
        _manifest_entries,
        encode_segment_columns,
    )

    class _Row:
        def __init__(self, seg_id, payload):
            self.seg_id, self.payload = seg_id, payload

    with tempfile.TemporaryDirectory() as d:
        model: dict[str, bytes] = {}
        for job_idx, (overwrite, ids, do_commit) in enumerate(jobs):
            payloads = {
                f"seg_{i}.fle": encode_segment_columns(
                    [("q", np.array([job_idx * 1000 + i], dtype=np.int64))]
                )
                for i in ids
            }
            w = FleDirWriter({"path": d}, overwrite=overwrite)
            msg = w.write([
                _Row(i, payloads[f"seg_{i}.fle"]) for i in sorted(ids)
            ])
            if do_commit:
                w.commit([msg])
                if overwrite:
                    model = dict(payloads)
                else:
                    model.update(payloads)
            else:
                w.abort([msg, None])

            # committed view == model, byte-for-byte
            names = [n for n, _ in _manifest_entries(d)]
            assert sorted(names) == sorted(model)
            for n in names:
                with open(os.path.join(d, n), "rb") as fh:
                    assert fh.read() == model[n], n
            # no temp file ever survives a finished job
            assert not any(".fle.tmp-" in f for f in os.listdir(d))


def test_fle_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """REAL checkpoint recovery (not the simulated replay): a streaming
    query over fledir is stopped and RESTARTED from its checkpoint; the
    second run must resume from the committed offset — files from the
    first run are not re-delivered, files added while the query was
    down are delivered exactly once."""
    import os as _os

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDataSource,
    )

    try:
        spark.dataSource.register(FleDataSource)
    except Exception:
        pass
    d = str(tmp_path / "fle_ckpt_in")
    ckpt = str(tmp_path / "fle_ckpt")
    sink = str(tmp_path / "fle_ckpt_out")
    _os.makedirs(d)

    def put(seg_id: int):
        rf = np.array(["A"], dtype=object)
        qty = np.array([float(seg_id)])
        with open(_os.path.join(d, f"seg_{seg_id:04d}.fle"), "wb") as fh:
            fh.write(encode_segment(rf, qty))

    def run_once():
        stream = spark.readStream.format("fledir").option("path", d).load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    put(1)
    put(2)
    run_once()
    # query is DOWN; more segments arrive
    put(3)
    put(4)
    run_once()  # restart from the same checkpoint

    rows = spark.read.parquet(sink).collect()
    got = sorted(int(r.l_quantity) for r in rows)
    assert got == [1, 2, 3, 4]  # each segment exactly once across runs


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
        min_size=1,
        max_size=4000,
    )
)
def test_chunk_stats_agree_with_file_stats(values):
    """Coherence of the two stats tiers: the manifest's file-level
    min/max (computed on the PLANES by plane_min_max) must equal the
    min/max over the BSTA footer's per-chunk stats (computed on the
    CODES at encode time) — a divergence would mean one tier prunes
    what the other would keep."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        encode_segment_columns,
        parse_segment,
        segment_stats,
    )

    arr = np.array(
        [float("nan") if v is None else float(v) for v in values]
    )
    seg = parse_segment(encode_segment_columns([("q", arr)]))
    file_stats = segment_stats(seg)["q"]
    mins, maxs = seg.chunk_stats[0]
    nonempty = mins <= maxs  # all-NULL chunks carry the empty interval
    if file_stats["min"] is None:
        assert not nonempty.any()
    else:
        assert int(mins[nonempty].min()) == file_stats["min"]
        assert int(maxs[nonempty].max()) == file_stats["max"]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-(2**40), max_value=2**40)
        ),
        min_size=1,
        max_size=200,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["ge", "gt", "le", "lt", "eq"]),
            st.integers(min_value=-(2**41), max_value=2**41),
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_signed_pushdown_fuzz_matches_direct_eval(values, comparisons):
    """Offset-kind fuzz: any conjunction of signed comparisons over a
    random signed column (NULLs included) must keep exactly the rows
    direct evaluation keeps — the literal translation, kernels, chunk
    stats, and validity semantics all under random data."""
    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        decode_segment_columns,
        encode_segment_columns,
        parse_segment,
    )

    arr = np.array(values, dtype=object)
    seg = parse_segment(encode_segment_columns([("v", arr)]))
    r = FleDirReader({"path": "x"})
    r.pushed = [("v", op, lit) for op, lit in comparisons]
    mask = r._segment_mask(seg)
    kept, kvalid = decode_segment_columns(seg, mask=mask)["v"]
    assert kvalid.all()  # NULL satisfies no comparison

    import operator as _op

    ops = {"ge": _op.ge, "gt": _op.gt, "le": _op.le,
           "lt": _op.lt, "eq": _op.eq}
    want = [
        v for v in values
        if v is not None
        and all(ops[op](v, lit) for op, lit in comparisons)
    ]
    assert sorted(int(k) for k in kept) == sorted(want)


def test_large_files_split_into_block_spans(spark, tmp_path):
    """Scan-range splitting: two 100k-row segments must NOT cap the
    scan at two tasks — partitions() splits them into disjoint block
    spans (the reference scheduler's scan ranges), and every row is
    read exactly once, with pushdown still correct across spans."""
    import pandas as pd

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDirReader,
        encode_segment_columns,
        register_fledir,
    )

    register_fledir(spark)
    path = str(tmp_path / "big_fle")

    def encode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                i = int(row["seg_id"])
                qty = np.arange(i * 100_000, (i + 1) * 100_000,
                                dtype=np.int64)
                yield pd.DataFrame({
                    "seg_id": [i],
                    "payload": [encode_segment_columns([("q", qty)])],
                })

    (
        spark.createDataFrame([(0,), (1,)], "seg_id long")
        .repartition(2)
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", path)
        .save()
    )

    r = FleDirReader({"path": path})
    parts = r.partitions()
    assert len(parts) == 8  # floor-8 target met by splitting 2 files
    spans = [
        (p, s)
        for part in parts
        for p, s in zip(part.paths, part.spans)
    ]
    assert all(s is not None for _, s in spans)
    # disjoint, complete coverage per file
    per_file: dict = {}
    for p, (b0, b1) in spans:
        per_file.setdefault(p, []).append((b0, b1))
    n_blocks = (100_000 + 63) // 64
    for ranges in per_file.values():
        ranges.sort()
        assert ranges[0][0] == 0 and ranges[-1][1] >= n_blocks
        for (a0, a1), (c0, c1) in zip(ranges, ranges[1:]):
            assert a1 == c0  # contiguous, no overlap

    df = spark.read.format("fledir").option("path", path).load()
    assert df.count() == 200_000
    assert df.rdd.getNumPartitions() == 8
    # pushdown across span boundaries: exact range count
    n = (
        spark.read.format("fledir").option("path", path).load()
        .filter("q >= 150000 AND q < 150123").count()
    )
    assert n == 123
    # explicit numpartitions above the file count is honored by splits
    # UP TO window granularity: 1563 blocks per file / 256-block
    # windows = 7 spans per file, 14 total
    r32 = FleDirReader({"path": path, "numpartitions": "32"})
    assert len(r32.partitions()) == 14


def test_fle_stream_partitioned_root_e2e(spark, tmp_path):
    """Round 10: a hive-partitioned fledir root streams end-to-end
    through Structured Streaming — leaf-qualified offsets, partition
    keys materialized as trailing typed columns, and a leaf appended
    mid-stream delivered exactly once."""
    import os as _os

    import numpy as _np

    from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
        FleDataSource,
        encode_segment_columns,
        segment_stats,
        parse_segment,
    )

    try:
        spark.dataSource.register(FleDataSource)
    except Exception:
        pass
    root = str(tmp_path / "fle_stream_part")

    def put(flag: str, day: int, seg_id: int, base: int):
        leaf = _os.path.join(root, f"flag={flag}", f"day={day}")
        _os.makedirs(leaf, exist_ok=True)
        payload = encode_segment_columns([
            ("q", _np.arange(base, base + 3, dtype=_np.int64)),
        ])
        name = f"seg_{seg_id:06d}.fle"
        with open(_os.path.join(leaf, name), "wb") as fh:
            fh.write(payload)
        import json as _json

        entry = segment_stats(parse_segment(payload))
        entry["__rows__"] = 3
        done = _os.path.join(leaf, "_DONE")
        prev = ""
        if _os.path.exists(done):
            with open(done) as fh:
                prev = fh.read() + "\n"
        with open(done, "w") as fh:
            fh.write(prev + f"{name}\t{_json.dumps(entry)}")
        return {(base + k, flag, day) for k in range(3)}

    want = put("A", 1, 0, 0) | put("A", 2, 1, 100) | put("R", 1, 2, 200)
    stream = (
        spark.readStream.format("fledir").option("path", root).load()
    )
    assert [f.name for f in stream.schema.fields] == ["q", "flag", "day"]
    assert dict((f.name, f.dataType.simpleString())
                for f in stream.schema.fields)["day"] == "bigint"
    q = (
        stream.writeStream.format("memory")
        .queryName("fle_stream_part_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        want |= put("R", 2, 3, 300)  # new leaf arrives mid-stream
        q.processAllAvailable()
        rows = spark.table("fle_stream_part_out").collect()
    finally:
        q.stop()
    assert len(rows) == 12  # 4 leaves x 3 rows, exactly once
    assert {(r.q, r.flag, r.day) for r in rows} == want
