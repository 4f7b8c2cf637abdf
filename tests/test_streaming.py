"""Structured Streaming execution of the event-time operators
(streaming/stream_demo.py): parquet file source → watermarked windowed
aggregation / dedup → memory sink, driven synchronously.

The batch twins of these queries are oracle-checked (events_tumbling,
events_first_per_key); here the same logic is proven to run as a real
stream and to agree with the batch result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.registry import REGISTRY
from impala_avx2_parquet_scanner_spark.streaming.stream_demo import (
    dedup_stream,
    events_stream,
    run_to_memory,
    tumbling_counts_stream,
)
import impala_avx2_parquet_scanner_spark as engine

engine.load_all()


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    agg = tumbling_counts_stream(stream)
    q = run_to_memory(agg, "tumbling_out", output_mode="complete")
    try:
        got = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
        batch = REGISTRY["events_tumbling"].fn(spark, sf_dir)
        want = {
            (r.window_start, r.event_type): r.n for r in batch.collect()
        }
        # stream ts is LTZ (UTC session) vs batch ntz: compare naive values
        got_n = {(k[0].replace(tzinfo=None), k[1]): v for k, v in got.items()}
        assert got_n == want
    finally:
        q.stop()


def test_streaming_dedup_bounds_output(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    q = run_to_memory(dedup_stream(stream), "dedup_out")
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n
        distinct_keys = (
            REGISTRY["events_first_per_key"].fn(spark, sf_dir).count()
        )
        # exactly one row per (user_id, event_type) within the horizon
        assert n == distinct_keys
    finally:
        q.stop()


def test_stream_is_actually_streaming(spark, sf_dir):
    assert events_stream(spark, sf_dir).isStreaming
