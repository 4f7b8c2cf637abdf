"""The parity tool's canonicalizer must reproduce the driver's behavior.

Each test reconstructs one divergence class that the driver flagged in
round 1/2 while the old local tool reported parity — the canon must now
catch it locally — plus the date/timestamp unification the driver's green
results prove it performs.
"""

from __future__ import annotations

import datetime
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from tools.parity import compare_frames, norm_cell, CanonError  # noqa: E402

import pytest  # noqa: E402


def test_hugeint_window_sum_divergence_caught():
    # DuckDB window SUM over BIGINT → HUGEINT → pandas float64 ('0.0'),
    # Spark int64 ('0').  The events_sessionize / growth_accounting bug.
    spark_pdf = pd.DataFrame({"session_id": pd.array([0, 1], dtype="int64")})
    duck_pdf = pd.DataFrame({"session_id": pd.array([0.0, 1.0], dtype="float64")})
    problems = compare_frames(spark_pdf, duck_pdf)
    assert any("value-hash mismatch" in p for p in problems)


def test_decimal_trailing_zero_divergence_caught():
    # Spark DECIMAL(14,2) → Decimal('205941.60') object, DuckDB → float64.
    # The fn_cast bug.
    from decimal import Decimal

    spark_pdf = pd.DataFrame({"price_dec": [Decimal("205941.60")]})
    duck_pdf = pd.DataFrame({"price_dec": [205941.6]})
    problems = compare_frames(spark_pdf, duck_pdf)
    assert any("value-hash mismatch" in p for p in problems)


def test_array_cell_is_hard_failure():
    # ndarray cells crash the driver's pandas sort_values
    # (agg_collect_sorted / dedup_clusters bug) — must be a failure, not a
    # silent pass.
    spark_pdf = pd.DataFrame({"members": [np.array([1, 2]), np.array([3])]})
    duck_pdf = pd.DataFrame({"members": [np.array([1, 2]), np.array([3])]})
    problems = compare_frames(spark_pdf, duck_pdf)
    assert problems and "array cell" in problems[0]


def test_date_vs_midnight_timestamp_unified():
    # Spark DATE → datetime.date, DuckDB DATE → midnight Timestamp; the
    # driver's green date-bearing queries (events_gap_fill etc.) prove it
    # treats these as equal.
    spark_pdf = pd.DataFrame({"day": [datetime.date(2024, 1, 1)]})
    duck_pdf = pd.DataFrame({"day": [pd.Timestamp("2024-01-01 00:00:00")]})
    assert compare_frames(spark_pdf, duck_pdf) == []


def test_int_float_equal_values_match():
    # Identical representations must still match.
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([2, 1], dtype="int64")})  # order-insensitive
    assert compare_frames(a, b) == []


def test_null_forms_unified():
    # Spark None (object) vs DuckDB NaN (float64) for a nullable double.
    a = pd.DataFrame({"x": [None, 1.5]})
    b = pd.DataFrame({"x": [np.nan, 1.5]})
    assert compare_frames(a, b) == []


def test_norm_cell_raises_on_array():
    with pytest.raises(CanonError):
        norm_cell(np.array([1]))
