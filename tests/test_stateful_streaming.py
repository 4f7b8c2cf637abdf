"""Custom stateful streaming operator (applyInPandasWithState):
per-user session tracking with user-defined state."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.streaming.stateful import (
    SESSION_GAP_SECONDS,
    sessionize_stream,
)


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    """Two micro-batch files of synthetic events for user 1 and 2:
    user 1 has two sessions split by a > gap pause; user 2 one session."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    # gap is measured from the LAST event of the open session (base+5min for
    # user 1), so the session-2 opener must be > gap after THAT
    reopen = base + pd.Timedelta(minutes=5) + pd.Timedelta(seconds=SESSION_GAP_SECONDS + 120)

    def rows(batch):
        if batch == 0:
            return [
                (1, base, 1, 10.0),
                (1, base + pd.Timedelta(minutes=5), 2, 1.0),
                (2, base, 3, 5.0),
            ]
        return [
            (1, reopen, 4, 2.0),                             # closes user-1 session 1
            (1, reopen + pd.Timedelta(minutes=1), 5, 3.0),
            (2, reopen + pd.Timedelta(hours=2), 6, 7.0),     # closes user-2 session
        ]

    out = tmp_path / "stream_in"
    out.mkdir()
    for b in (0, 1):
        pdf = pd.DataFrame(rows(b), columns=["user_id", "ts", "event_id", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(out))
    return str(out)


def test_stateful_sessionization_emits_closed_sessions(spark, event_stream_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .parquet(event_stream_dir)
    )
    sessions = sessionize_stream(stream)
    # availableNow: process every staged file then stop — ProcessingTime
    # triggers never settle for stateful queries (timeout checks keep
    # scheduling batches), so processAllAvailable would hang
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stateful query did not terminate"
        rows = spark.sql(
            "SELECT * FROM sessions_out ORDER BY user_id, session_start"
        ).collect()
        # closed so far: user 1's first session (2 events, sum 11) and
        # user 2's first (1 event, sum 5); the open sessions stay in state
        closed = {(r.user_id, r.n_events, r.sum_value) for r in rows}
        assert (1, 2, 11.0) in closed
        assert (2, 1, 5.0) in closed
        # nothing emitted for sessions that are still open
        assert all(r.session_end >= r.session_start for r in rows)
    finally:
        q.stop()


def test_stateful_output_schema(spark, event_stream_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .parquet(event_stream_dir)
    )
    sessions = sessionize_stream(stream)
    assert [f.name for f in sessions.schema.fields] == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        "sum_value",
    ]
    assert sessions.isStreaming


@pytest.fixture()
def ewma_stream_dir(spark, tmp_path):
    """Two micro-batch files, in (ts, event_id) order per user ACROSS
    batches (the documented ingestion contract): enough events per user
    to exercise ramp-up AND full-depth windows (depth 10)."""
    base = pd.Timestamp("2024-02-01 00:00:00")
    rows0, rows1, eid = [], [], 0
    for user in (1, 2, 3):
        for i in range(8):  # batch 0: ramp-up region
            rows0.append(
                (user, base + pd.Timedelta(minutes=i), eid, (user * 10 + i) * 1.25)
            )
            eid += 1
        for i in range(8, 15):  # batch 1: crosses into full-depth EWMA
            rows1.append(
                (user, base + pd.Timedelta(minutes=i), eid, (user * 10 + i) * -0.75)
            )
            eid += 1
    out = tmp_path / "ewma_in"
    out.mkdir()
    for rows in (rows0, rows1):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(out))
    return str(out)


def test_streaming_ewma_equals_batch(spark, ewma_stream_dir):
    """stream==batch, bit-exact: the stateful incremental EWMA over two
    micro-batches must equal the batch LAG-tap query on the union —
    integer numerators/denominators AND the final double, for every
    event, including rows whose window spans the batch boundary."""
    from impala_avx2_parquet_scanner_spark.operators.windows import (
        ewma_features,
    )
    from impala_avx2_parquet_scanner_spark.streaming.ewma_stream import (
        ewma_stream,
    )

    schema = "user_id long, ts timestamp, event_id long, value double"
    stream = spark.readStream.schema(schema).parquet(ewma_stream_dir)
    q = (
        ewma_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "ewma stream did not terminate"
        got = {
            r.event_id: (r.ewma_q, r.denom_q, r.ewma)
            for r in spark.sql("SELECT * FROM ewma_out").collect()
        }
    finally:
        q.stop()

    batch = spark.read.schema(schema).parquet(ewma_stream_dir)
    want = {
        r.event_id: (r.ewma_q, r.denom_q, r.ewma)
        for r in ewma_features(batch).collect()
    }
    assert len(got) == len(want) == 45
    assert got == want  # exact integers + bit-identical doubles


def test_streaming_sliding_median_equals_batch(spark, tmp_path):
    """stream==batch, bit-exact: the stateful rolling median over two
    micro-batches must equal the batch collect_list+sort query on the
    union — including ramp-up rows and rows whose 5-row window spans
    the micro-batch boundary."""
    from impala_avx2_parquet_scanner_spark.operators.windows import (
        sliding_median_features,
    )
    from impala_avx2_parquet_scanner_spark.streaming.median_stream import (
        median_stream,
    )

    rows0, rows1, eid = [], [], 0
    for user in (1, 2):
        for i in range(7):  # batch 0: ramp-up + first full windows
            rows0.append((eid, user, (user * 13 + i * 7) % 29 - 5))
            eid += 1
        for i in range(7, 13):  # batch 1: windows span the boundary
            rows1.append((eid, user, (user * 17 + i * 11) % 31 - 8))
            eid += 1
    out = tmp_path / "median_in"
    out.mkdir()
    for rows in (rows0, rows1):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "v"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            str(out)
        )

    schema = "event_id long, user_id long, v long"
    stream = spark.readStream.schema(schema).parquet(str(out))
    q = (
        median_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("median_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "median stream did not terminate"
        got = {
            r.event_id: (r.v, r.med5)
            for r in spark.sql("SELECT * FROM median_out").collect()
        }
    finally:
        q.stop()

    batch = spark.read.schema(schema).parquet(str(out))
    want = {
        r.event_id: (r.v, r.med5)
        for r in sliding_median_features(batch).collect()
    }
    assert len(got) == len(want) == 26
    assert got == want  # exact integers + bit-identical midpoint doubles
