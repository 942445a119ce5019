"""Structured Streaming tests: each streaming execution must equal its
batch twin on the same bounded input (the Structured Streaming contract),
plus watermarked dedup and a custom stateful operator."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.streaming import ops


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.tumbling_counts(stream), "tumbling_mem", output_mode="complete"
    )
    batch = ops.tumbling_counts(ops.load_events_batch(spark, sf_dir))
    cols = ["window_start", "event_type", "n_events", "value_sum"]
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.session_counts(stream, gap="2 hours"), "session_mem", output_mode="complete"
    )
    batch = ops.session_counts(ops.load_events_batch(spark, sf_dir), gap="2 hours")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_streaming_dedup_drops_duplicates(spark, sf_dir):
    # two files with overlapping event_ids -> two triggers -> dedup state
    # must drop the second occurrence
    events = ops.load_events_batch(spark, sf_dir).limit(100)
    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(f"{d}/f1")
        events.limit(40).write.parquet(f"{d}/f2")  # 40 duplicate ids
        schema = spark.read.parquet(f"{d}/f1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/*")
        )
        result = ops.run_stream_to_memory(
            ops.dedup_events(stream).select("event_id"),
            "dedup_mem",
            output_mode="append",
        )
        got = result.count()
    assert got == 100  # duplicates dropped, nothing else lost


def test_running_user_counts_stateful(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_user_counts(stream), "running_mem", output_mode="update"
    )
    # single bounded trigger -> last update per user is the final total
    final = (
        result.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        ops.load_events_batch(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert _rows(final, "user_id", "n_events") == _rows(batch, "user_id", "n_events")


def test_watermark_is_noop_on_batch(spark, sf_dir):
    # corpus entries reuse the same function bodies on batch inputs —
    # withWatermark must not change batch results
    batch = ops.load_events_batch(spark, sf_dir)
    n_with = ops.tumbling_counts(batch).count()
    n_without = (
        batch.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    )
    assert n_with == n_without


@pytest.mark.parametrize("name", ["events_tumbling_hourly", "events_sliding_windows", "events_session_windows", "events_interval_join"])
def test_streaming_corpus_parity(spark, duck, sf_dir, name):
    from spanner_jdbc_converter_spark.oracle import check_query

    result = check_query(spark, duck, sf_dir, name)
    assert result.ok, str(result)


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.interval_join(stream), "ivjoin_mem", output_mode="append"
    )
    batch = ops.interval_join(ops.load_events_batch(spark, sf_dir))
    cols = ["l_event_id", "user_id", "r_event_id", "lag_us"]
    assert _rows(batch, *cols)  # non-trivial fixture selectivity
    assert _rows(result, *cols) == _rows(batch, *cols)
