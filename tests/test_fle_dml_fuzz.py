"""Seeded DML fuzz: random append / merge / delete / compact / vacuum
sequences against a Python reference model, plus the change-data-feed
reconciliation invariant across a random span — the op-composition
corners (merge after compaction, delete after merge, feeds across
mixed spans) no single-feature test reaches."""
from __future__ import annotations

import numpy as np
import pytest

from impala_avx2_parquet_scanner_spark.sources.fle_datasource import (
    _history_generations,
    encode_segment_columns,
    register_fledir,
)
from impala_avx2_parquet_scanner_spark.sources.fle_maintenance import (
    compact_fledir,
    delete_fledir,
    fledir_changes,
    merge_fledir,
    vacuum_fledir,
)


def _encode_rows(rows: list[tuple]) -> bytes:
    ks = np.array([r[0] for r in rows], dtype=np.int64)
    tags = np.array([r[1] for r in rows], dtype=object)
    vals = np.array([r[2] for r in rows], dtype=object)
    return encode_segment_columns([
        ("k", ks), ("tag", tags), ("val", vals, "int"),
    ])


def _write_rows(spark, path, rows, seg_base, mode):
    import pandas as pd

    register_fledir(spark)
    payload = _encode_rows(rows)

    def encode(batches):
        for pdf in batches:
            for _ in pdf.itertuples():
                yield pd.DataFrame(
                    {"seg_id": [seg_base], "payload": [payload]}
                )

    (
        spark.createDataFrame([(0,)], "seg_id long")
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir").mode(mode)
        .option("path", path).save()
    )


def _table_rows(spark, path) -> set:
    return {
        tuple(r)
        for r in spark.read.format("fledir").option("path", path)
        .load().select("k", "tag", "val").collect()
    }


def _model_rows(model: dict) -> set:
    return {(k, t, v) for k, (t, v) in model.items()}


@pytest.mark.parametrize("seed", [11, 23, 37, 53, 71])
def test_dml_sequences_match_reference_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    path = str(tmp_path / f"fz{seed}")
    next_key = [0]
    next_seg = [0]

    def fresh_rows(n):
        out = []
        for _ in range(n):
            k = next_key[0]
            next_key[0] += 1
            tag = f"t{int(rng.integers(0, 4))}"
            val = (
                None if rng.random() < 0.15
                else int(rng.integers(0, 100))
            )
            out.append((k, tag, val))
        return out

    # initial table
    model: dict = {}
    rows0 = fresh_rows(int(rng.integers(5, 20)))
    _write_rows(spark, path, rows0, 0, "overwrite")
    next_seg[0] = 1
    for k, t, v in rows0:
        model[k] = (t, v)

    checkpoint = None  # (generation, model snapshot) for the CDF span
    vacuumed = False
    n_ops = 7
    for step in range(n_ops):
        if checkpoint is None and step == int(rng.integers(0, 3)):
            checkpoint = (
                _history_generations(path)[-1], dict(model),
            )
        op = rng.choice(["append", "merge", "delete", "compact",
                         "vacuum"])
        if op == "append":
            rows = fresh_rows(int(rng.integers(1, 10)))
            _write_rows(spark, path, rows, next_seg[0], "append")
            next_seg[0] += 1
            for k, t, v in rows:
                model[k] = (t, v)
        elif op == "merge":
            ups = []
            existing = sorted(model)
            for k in existing:
                if rng.random() < 0.2:
                    ups.append((
                        k, f"u{int(rng.integers(0, 3))}",
                        None if rng.random() < 0.1
                        else int(rng.integers(100, 200)),
                    ))
            ups.extend(fresh_rows(int(rng.integers(0, 4))))
            if not ups:
                continue
            df = spark.createDataFrame(
                ups, "k long, tag string, val long"
            )
            merge_fledir(spark, path, df, key="k")
            for k, t, v in ups:
                model[k] = (t, v)
        elif op == "delete":
            if rng.random() < 0.5:
                lo = int(rng.integers(0, 100))
                conj = [("val", "ge", lo)]
                gone = [
                    k for k, (t, v) in model.items()
                    if v is not None and v >= lo
                ]
            else:
                tag = f"t{int(rng.integers(0, 4))}"
                conj = [("tag", "eq", tag)]
                gone = [
                    k for k, (t, v) in model.items() if t == tag
                ]
            delete_fledir(spark, path, conj)
            for k in gone:
                del model[k]
        elif op == "compact":
            compact_fledir(spark, path, target_rows=10_000)
        else:
            vacuum_fledir(path)
            if checkpoint is not None:
                vacuumed = True
        assert _table_rows(spark, path) == _model_rows(model), (
            f"seed {seed} step {step} op {op}"
        )

    # CDF reconciliation across the random span: rows(end) ==
    # rows(checkpoint) − deletes ∪ inserts, as sets of unique-key rows
    if checkpoint is not None and not vacuumed:
        gen0, model0 = checkpoint
        gen1 = _history_generations(path)[-1]
        if gen1 > gen0:
            try:
                feed = fledir_changes(spark, path, gen0, gen1)
                ch = [
                    (tuple(r)[:3], r["_change_type"])
                    for r in feed.collect()
                ]
            except ValueError:
                return  # a vacuum inside the span expired the feed
            ins = {t for t, c in ch if c == "insert"}
            dels = {t for t, c in ch if c == "delete"}
            assert (
                (_model_rows(model0) - dels) | ins
                == _model_rows(model)
            ), f"seed {seed} CDF span {gen0}->{gen1}"
