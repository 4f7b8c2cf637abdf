"""Generational snapshots / time travel on the fledir container:
commit-timeline recording, generation reads through retired files,
vacuum-driven snapshot expiry, overwrite timeline restart, and the
loud-failure edges."""
from __future__ import annotations

import os

import numpy as np
import pytest

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
    _HISTORY_DIR,
    _history_generations,
    encode_segment_columns,
    expire_fledir_snapshots,
    fledir_history,
    register_fledir,
)


def _write(spark, path, segments, mode="overwrite", seg_base=0):
    import pandas as pd

    register_fledir(spark)
    payloads = [encode_segment_columns(s) for s in segments]

    def encode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                i = int(row["seg_id"])
                yield pd.DataFrame(
                    {
                        "seg_id": [seg_base + i],
                        "payload": [payloads[i]],
                    }
                )

    (
        spark.createDataFrame(
            [(i,) for i in range(len(segments))], "seg_id long"
        )
        .repartition(2)
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode(mode)
        .option("path", path)
        .save()
    )
    return path


def _seg(lo: int, n: int = 40) -> list[tuple]:
    return [("q", np.arange(lo, lo + n, dtype=np.int64))]


def _read(spark, path, generation=None):
    r = spark.read.format("fledir").option("path", path)
    if generation is not None:
        r = r.option("generation", generation)
    return sorted(v[0] for v in r.load().select("q").collect())


def test_commits_record_generations_and_snapshot_reads(spark, tmp_path):
    path = str(tmp_path / "tl")
    _write(spark, path, [_seg(0), _seg(100)])
    _write(spark, path, [_seg(1000)], mode="append", seg_base=50)
    assert _history_generations(path) == [1, 2]
    assert _read(spark, path, generation=1) == sorted(
        list(range(0, 40)) + list(range(100, 140))
    )
    assert _read(spark, path, generation=2) == _read(spark, path)
    hist = fledir_history(path)
    assert hist == [(1, 2, 80, True), (2, 3, 120, True)]


def test_generation_survives_compaction_via_retired_files(
    spark, tmp_path
):
    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        compact_fledir,
    )

    path = str(tmp_path / "cp")
    _write(spark, path, [_seg(0), _seg(100)])
    _write(spark, path, [_seg(1000)], mode="append", seg_base=50)
    before = _read(spark, path)
    compact_fledir(spark, path, target_rows=10_000)
    assert _history_generations(path) == [1, 2, 3]
    # pre-compaction generations read bit-exactly through .retired
    assert _read(spark, path, generation=2) == before
    assert _read(spark, path, generation=1) == sorted(
        list(range(0, 40)) + list(range(100, 140))
    )
    assert _read(spark, path, generation=3) == before
    assert all(r[3] for r in fledir_history(path))


def test_vacuum_expires_snapshots_and_expired_reads_fail(
    spark, tmp_path
):
    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        compact_fledir,
        vacuum_fledir,
    )

    path = str(tmp_path / "vx")
    _write(spark, path, [_seg(0), _seg(100)])
    _write(spark, path, [_seg(1000)], mode="append", seg_base=50)
    compact_fledir(spark, path, target_rows=10_000)
    current = _read(spark, path)
    # manual retired-file loss BEFORE vacuum: the generation read must
    # fail loudly, never return a partial snapshot
    retired = sorted(
        f for f in os.listdir(path) if f.endswith(".retired")
    )
    os.remove(os.path.join(path, retired[0]))
    with pytest.raises(Exception, match="expired|vacuumed"):
        _read(spark, path, generation=1)
    vacuum_fledir(path)
    # vacuum reclaimed the rest and dropped the unreadable snapshots
    assert not any(f.endswith(".retired") for f in os.listdir(path))
    gens = _history_generations(path)
    assert gens == [3]
    assert _read(spark, path, generation=3) == current
    with pytest.raises(Exception, match="no\\s+snapshot|generations"):
        _read(spark, path, generation=2)


def test_overwrite_restarts_timeline(spark, tmp_path):
    path = str(tmp_path / "ow")
    _write(spark, path, [_seg(0)])
    _write(spark, path, [_seg(100)], mode="append", seg_base=10)
    assert _history_generations(path) == [1, 2]
    _write(spark, path, [_seg(5000)])
    assert _history_generations(path) == [1]
    assert _read(spark, path, generation=1) == list(range(5000, 5040))
    hist = fledir_history(path)
    assert hist == [(1, 1, 40, True)]


def test_partitioned_root_generation_read_raises(spark, tmp_path):
    root = str(tmp_path / "pt")
    for key in ("A", "B"):
        _write(spark, os.path.join(root, f"k={key}"), [_seg(0)])
    with pytest.raises(Exception, match="leaf, not a"):
        (
            spark.read.format("fledir")
            .option("path", root)
            .option("generation", 1)
            .load()
            .collect()
        )
    # per-LEAF timelines work fine
    assert _read(
        spark, os.path.join(root, "k=A"), generation=1
    ) == list(range(0, 40))


def test_unknown_generation_and_tmp_leftovers(spark, tmp_path):
    path = str(tmp_path / "uk")
    _write(spark, path, [_seg(0)])
    with pytest.raises(Exception, match="generations"):
        _read(spark, path, generation=9)
    # a crashed commit's history temp is invisible to the timeline
    with open(
        os.path.join(path, _HISTORY_DIR, "7.manifest.tmp"), "w"
    ) as fh:
        fh.write("junk")
    assert _history_generations(path) == [1]
    assert expire_fledir_snapshots(path)["snapshots_dropped"] == []


def test_stats_pruning_applies_to_snapshot_reads(spark, tmp_path):
    """A generation read keeps the manifest stats tier: the snapshot
    manifest carries the same per-segment stats lines."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "pr")
    _write(spark, path, [_seg(0), _seg(100_000)])
    _write(spark, path, [_seg(500_000)], mode="append", seg_base=77)
    df = (
        spark.read.format("fledir")
        .option("path", path)
        .option("generation", 1)
        .load()
        .filter(F.col("q") >= 100_000)
    )
    assert sorted(v[0] for v in df.select("q").collect()) == list(
        range(100_000, 100_040)
    )


def test_name_reuse_append_expires_snapshots_referencing_it(
    spark, tmp_path
):
    """Review finding: an append that REUSES a committed segment name
    replaces its bytes in place — snapshots referencing the old bytes
    must expire at commit, or a generation read would silently return
    the NEW rows under the OLD manifest."""
    path = str(tmp_path / "nr")
    _write(spark, path, [_seg(0)])            # gen 1: seg_0
    _write(spark, path, [_seg(100)], mode="append", seg_base=50)
    assert _history_generations(path) == [1, 2]
    # reuse seg_0's NAME with different rows
    _write(spark, path, [_seg(9000)], mode="append", seg_base=0)
    # gens 1 and 2 referenced seg_0's old bytes: both expired;
    # the reuse commit minted generation 3 (numbers stay monotonic
    # even when expiry empties the timeline)
    gens = _history_generations(path)
    assert gens == [3]
    with pytest.raises(Exception, match="generations"):
        _read(spark, path, generation=1)
    assert _read(spark, path, generation=gens[0]) == _read(spark, path)


def test_change_feed_inserts_deletes_and_compaction_absorption(
    spark, tmp_path
):
    """CDF semantics: an append span is pure inserts, a merge span is
    the update's delete+insert pair, and a compaction-only span is
    EMPTY — the lineage absorption means zero segment bytes read."""
    from pyspark.sql import functions as F

    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        compact_fledir,
        fledir_changes,
        merge_fledir,
    )

    path = str(tmp_path / "cdf")
    _write(spark, path, [_seg(0, 5)])                      # gen 1
    _write(spark, path, [_seg(100, 3)], mode="append",
           seg_base=50)                                    # gen 2
    ch = fledir_changes(spark, path, 1, 2)
    got = sorted(
        (r["q"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [(v, "insert") for v in range(100, 103)]
    # merge: update q=101's row (full-row replace in a 1-col table
    # means replacing it with a new value)
    # a 1-col table: key IS the row; replace 101 with itself and add 999
    updates = spark.createDataFrame([(101,), (999,)], "q long")
    merge_fledir(spark, path, updates, key="q")            # gen 3
    ch23 = fledir_changes(spark, path, 2, 3)
    got23 = sorted(
        (r["q"], r["_change_type"]) for r in ch23.collect()
    )
    # 101 replaced by identical value cancels in the multiset diff;
    # only the genuinely new row surfaces
    assert got23 == [(999, "insert")]
    compact_fledir(spark, path, target_rows=10_000)        # gen 4
    ch34 = fledir_changes(spark, path, 3, 4)
    assert ch34.count() == 0  # pure re-shuffle: absorbed at file tier
    # end-to-end span: gen 1 → current
    ch14 = sorted(
        (r["q"], r["_change_type"])
        for r in fledir_changes(spark, path, 1, 4).collect()
    )
    assert ch14 == sorted(
        [(v, "insert") for v in range(100, 103)] + [(999, "insert")]
    )


def test_change_feed_delete_span_and_loud_edges(spark, tmp_path):
    from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
        delete_fledir,
        fledir_changes,
        vacuum_fledir,
    )

    path = str(tmp_path / "cdfd")
    _write(spark, path, [_seg(0, 10)])                     # gen 1
    delete_fledir(spark, path, [("q", "ge", 7)])           # gen 2
    got = sorted(
        (r["q"], r["_change_type"])
        for r in fledir_changes(spark, path, 1, 2).collect()
    )
    assert got == [(v, "delete") for v in (7, 8, 9)]
    with pytest.raises(ValueError, match="forward"):
        fledir_changes(spark, path, 2, 1)
    with pytest.raises(ValueError, match="generations"):
        fledir_changes(spark, path, 1, 9)
    vacuum_fledir(path)  # reclaims gen-1's retired segment
    with pytest.raises(ValueError, match="generations|expired"):
        fledir_changes(spark, path, 1, 2).collect()
