"""transformWithStateInPandas (Spark 4 StatefulProcessor API): per-user
running totals must equal the batch groupBy over the same files, and state
must carry across micro-batches."""

from __future__ import annotations

import pandas as pd
import pytest

from impala_avx2_parquet_scanner_spark.streaming.transform_state import (
    ROCKSDB_PROVIDER_CONF,
    TRANSFORM_WITH_STATE_AVAILABLE,
    running_totals_stream,
)

pytestmark = pytest.mark.skipif(
    not TRANSFORM_WITH_STATE_AVAILABLE,
    reason="transformWithState needs google.protobuf, absent in this "
    "container AND uninstallable: `pip download protobuf --no-deps` fails "
    "with 'Failed to establish a new connection: [Errno -2] Name or "
    "service not known' (no network egress; verified 2026-08-14). "
    "See streaming/transform_state.py docstring",
)


@pytest.fixture()
def totals_stream_dir(spark, tmp_path):
    """Two micro-batch files; user 1 appears in both so the second batch
    must see batch-1 state (3 events total), user 2 only in the first."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    batches = [
        [(1, base, 1, 10.0), (1, base + pd.Timedelta(minutes=1), 2, 1.5), (2, base, 3, 5.0)],
        [(1, base + pd.Timedelta(minutes=2), 4, 2.0), (3, base, 5, 7.0)],
    ]
    out = tmp_path / "totals_in"
    out.mkdir()
    for rows in batches:
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(out))
    return str(out)


def test_transform_with_state_matches_batch(spark, totals_stream_dir):
    conf_key, rocksdb = ROCKSDB_PROVIDER_CONF
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, rocksdb)
    try:
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
            .parquet(totals_stream_dir)
        )
        q = (
            running_totals_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("totals_out")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180), "stateful query did not terminate"
        finally:
            q.stop()
        # latest emitted totals per user == batch aggregation of all files
        rows = spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM totals_out) WHERE rn = 1"""
        ).collect()
        got = {(r.user_id, r.n_events, r.sum_value) for r in rows}
        batch = (
            spark.read.parquet(totals_stream_dir)
            .groupBy("user_id")
            .agg({"*": "count", "value": "sum"})
            .collect()
        )
        want = {(r["user_id"], r["count(1)"], r["sum(value)"]) for r in batch}
        assert got == want
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
