"""DELETE WHERE on the fledir container: exact Kleene matching on
decoded values, metadata-bounded write amplification (stats + bloom),
atomic commit + time-travel composition, and loud-failure edges."""
from __future__ import annotations

import os

import numpy as np
import pytest

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
    _history_generations,
    _manifest_entries,
    encode_segment_columns,
    register_fledir,
)
from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
    _conjunct_rows,
    delete_fledir,
)


def _write(spark, path, segments, bloomcols=None):
    import pandas as pd

    register_fledir(spark)
    payloads = [encode_segment_columns(s) for s in segments]

    def encode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                i = int(row["seg_id"])
                yield pd.DataFrame(
                    {"seg_id": [i], "payload": [payloads[i]]}
                )

    w = (
        spark.createDataFrame(
            [(i,) for i in range(len(segments))], "seg_id long"
        )
        .repartition(2)
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", path)
    )
    if bloomcols:
        w = w.option("bloomcols", bloomcols)
    w.save()
    return path


def _rows(spark, path):
    return sorted(
        (
            tuple(r)
            for r in spark.read.format("fledir")
            .option("path", path).load().collect()
        ),
        key=str,  # NULL-safe ordering
    )


def test_conjunct_rows_kleene_and_types():
    # nullable object ints: NULL never matches a comparison
    vals = np.array([1, None, 5, 10], dtype=object)
    assert list(_conjunct_rows(vals, "ge", 5, 4)) == [
        False, False, True, True,
    ]
    assert list(_conjunct_rows(vals, "is_null", None, 4)) == [
        False, True, False, False,
    ]
    assert list(_conjunct_rows(vals, "in", [1, 10, None], 4)) == [
        True, False, False, True,
    ]
    # native ints vectorized
    iv = np.array([3, 7, 9], dtype=np.int64)
    assert list(_conjunct_rows(iv, "lt", 8, 3)) == [True, True, False]
    # floats: NaN lane is NULL
    fv = np.array([1.5, np.nan, 9.0])
    assert list(_conjunct_rows(fv, "gt", 1.0, 3)) == [
        True, False, True,
    ]
    # datetimes incl. NaT
    tv = np.array(
        ["1995-01-01", "NaT", "1997-06-01"], dtype="datetime64[us]"
    )
    assert list(_conjunct_rows(tv, "ge", "1996-01-01", 3)) == [
        False, False, True,
    ]
    # strings
    sv = np.array(["aa", None, "zz"], dtype=object)
    assert list(_conjunct_rows(sv, "eq", "zz", 3)) == [
        False, False, True,
    ]


def test_delete_sorted_layout_bounds_amplification(spark, tmp_path):
    path = str(tmp_path / "d1")
    segs = [
        [("q", np.arange(lo, lo + 50, dtype=np.int64)),
         ("tag", np.array(["x"] * 50, dtype=object))]
        for lo in (0, 100, 200, 300)
    ]
    _write(spark, path, segs)
    before = {n for n, _ in _manifest_entries(path)}
    rep = delete_fledir(spark, path, [("q", "ge", 310)])
    assert rep == {
        "path": path, "segments_rewritten": 1,
        "segments_untouched": 3, "rows_deleted": 40,
    }
    after = {n for n, _ in _manifest_entries(path)}
    assert len(before & after) == 3
    got = [r[0] for r in _rows(spark, path)]
    assert max(got) == 309 and len(got) == 160


def test_delete_conjunction_and_nulls(spark, tmp_path):
    path = str(tmp_path / "d2")
    seg = [
        ("q", np.array([1.0, np.nan, 5.0, 7.0])),  # NULL lane
        ("tag", np.array(["r", "r", "r", "k"], dtype=object)),
    ]
    _write(spark, path, [seg])
    rep = delete_fledir(
        spark, path, [("q", "ge", 5), ("tag", "eq", "r")]
    )
    # only (5.0, 'r') matches both; NULL q never matches ge
    assert rep["rows_deleted"] == 1
    vals = {tuple(r) for r in _rows(spark, path)}
    assert vals == {(1, "r"), (None, "r"), (7, "k")}
    # is_null delete removes exactly the NULL lane
    rep2 = delete_fledir(spark, path, [("q", "is_null", None)])
    assert rep2["rows_deleted"] == 1
    assert {tuple(r) for r in _rows(spark, path)} == {
        (1, "r"), (7, "k"),
    }


def test_delete_bloom_tier_on_scattered_layout(spark, tmp_path):
    path = str(tmp_path / "d3")
    segs = [
        [("k", np.arange(i, 400, 4, dtype=np.int64))]
        for i in range(4)
    ]
    _write(spark, path, segs, bloomcols="k")
    rep = delete_fledir(
        spark, path, [("k", "eq", 41)], bloomcols="k"
    )
    assert rep["segments_rewritten"] <= 2  # blooms spare the rest
    assert rep["rows_deleted"] == 1
    assert 41 not in {r[0] for r in _rows(spark, path)}


def test_delete_commits_generation_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "d4")
    _write(spark, path, [[("k", np.arange(10, dtype=np.int64))]])
    rep = delete_fledir(spark, path, [("k", "lt", 3)])
    assert rep["rows_deleted"] == 3
    assert _history_generations(path) == [1, 2]
    g1 = sorted(
        r[0]
        for r in spark.read.format("fledir")
        .option("path", path).option("generation", 1)
        .load().collect()
    )
    assert g1 == list(range(10))


def test_delete_loud_failures(spark, tmp_path):
    path = str(tmp_path / "d5")
    _write(spark, path, [[("k", np.arange(5, dtype=np.int64))]])
    with pytest.raises(ValueError, match="at least one conjunct"):
        delete_fledir(spark, path, [])
    with pytest.raises(ValueError, match="bad delete conjunct"):
        delete_fledir(spark, path, [("k", "like", "x")])
    with pytest.raises(KeyError):
        delete_fledir(spark, path, [("nope", "eq", 1)])
    root = str(tmp_path / "proot")
    for key in ("A", "B"):
        _write(spark, os.path.join(root, f"p={key}"),
               [[("k", np.arange(3, dtype=np.int64))]])
    # all-partition-key predicate: that is a partition drop, refuse
    with pytest.raises(ValueError, match="expire_fledir_partitions"):
        delete_fledir(spark, root, [("p", "eq", "A")])


def test_delete_partitioned_root_routes_and_prunes_leaves(
    spark, tmp_path
):
    """Partition-key conjuncts prune whole leaves; data conjuncts run
    per leaf; pruned leaves' bytes are untouched."""
    root = str(tmp_path / "dp")
    for key, lo in (("A", 0), ("B", 100), ("C", 200)):
        _write(spark, os.path.join(root, f"p={key}"),
               [[("k", np.arange(lo, lo + 20, dtype=np.int64))]])
    rep = delete_fledir(
        spark, root, [("p", "in", ["B", "C"]), ("k", "ge", 210)]
    )
    assert rep["leaves_pruned"] == 1       # p=A never visited
    # within kept leaves the stats tier still applies: B's k interval
    # (100..119) refutes k>=210, so only C's segment rewrites
    assert rep["segments_rewritten"] == 1
    assert rep["segments_untouched"] == 1
    got = sorted(
        tuple(r)
        for r in spark.read.format("fledir")
        .option("path", root).load().select("p", "k").collect()
    )
    assert [t for t in got if t[0] == "A"] == [
        ("A", v) for v in range(0, 20)
    ]
    assert [t for t in got if t[0] == "C"] == [
        ("C", v) for v in range(200, 210)
    ]
    assert len([t for t in got if t[0] == "B"]) == 20
    assert rep["rows_deleted"] == 10


def test_delete_unpushable_literal_still_exact(spark, tmp_path):
    """A fractional literal on an int column is not stats-pushable —
    pruning disables (all segments rewrite) but matching stays exact."""
    path = str(tmp_path / "d6")
    _write(spark, path, [
        [("k", np.arange(0, 50, dtype=np.int64))],
        [("k", np.arange(100, 150, dtype=np.int64))],
    ])
    rep = delete_fledir(spark, path, [("k", "gt", 120.5)])
    assert rep["segments_untouched"] == 0  # pruning declined
    assert rep["rows_deleted"] == 29  # 121..149
    assert max(r[0] for r in _rows(spark, path)) == 120


def test_delete_in_fractional_literal_never_truncates(spark, tmp_path):
    """Review finding: IN with a fractional literal over an int column
    must match NOTHING (SQL 1 = 1.5 is false) — casting the literal to
    the column dtype would truncate 1.5 → 1 and silently over-delete."""
    path = str(tmp_path / "din")
    _write(spark, path, [[("k", np.arange(5, dtype=np.int64))]])
    rep = delete_fledir(spark, path, [("k", "in", [1.5, 3])])
    assert rep["rows_deleted"] == 1  # only k=3; k=1 survives
    assert [r[0] for r in _rows(spark, path)] == [0, 1, 2, 4]
