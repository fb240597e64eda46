"""Structured Streaming tier tests (§2.9): run real micro-batch streams
through memory sinks and assert results, including cross-batch state."""

import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sitecheck_spark.streaming.continuous import (
    polite_throttle,
    sessionized_activity,
    windowed_fetch_metrics,
)


import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _write_batch(spark, path, rows, schema):
    rows = [tuple(_ts(v) if isinstance(v, str) and v[:2] == "20" else v for v in r)
            for r in rows]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_windowed_fetch_metrics_stream(spark):
    src = tempfile.mkdtemp() + "/fetch_events"
    schema = "event_ts timestamp, url string, status int"
    _write_batch(spark, src, [
        ("2024-01-01 00:00:10", "u1", 200),
        ("2024-01-01 00:00:20", "u2", 404),
        ("2024-01-01 00:01:10", "u3", 200),
    ], schema)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        windowed_fetch_metrics(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory").queryName("fetch_metrics")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; force closure with a late batch
    _write_batch(spark, src, [("2024-01-01 00:10:00", "u4", 200)], schema)
    q2 = (
        windowed_fetch_metrics(spark.readStream.schema(schema).parquet(src),
                               window="1 minute", watermark="2 minutes")
        .writeStream.format("memory").queryName("fetch_metrics2")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    rows = {(str(r["window_start"]), r["status"]): r["n"]
            for r in spark.sql("select * from fetch_metrics2").collect()}
    assert rows[("2024-01-01 00:00:00", 200)] == 1
    assert rows[("2024-01-01 00:00:00", 404)] == 1
    assert rows[("2024-01-01 00:01:00", 200)] == 1


def test_sessionized_activity_stream(spark):
    src = tempfile.mkdtemp() + "/events"
    schema = "user_id long, ts timestamp"
    _write_batch(spark, src, [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),  # one session
        (1, "2024-01-01 02:00:00"),                               # new session
        (2, "2024-01-01 00:00:00"),
    ], schema)
    q = (
        sessionized_activity(spark.readStream.schema(schema).parquet(src),
                             gap="30 minutes", watermark="10 hours")
        .writeStream.format("memory").queryName("sessions")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["session_start"])): r["n_events"]
           for r in spark.sql("select * from sessions").collect()}
    assert got[(1, "2024-01-01 00:00:00")] == 2
    assert got[(1, "2024-01-01 02:00:00")] == 1
    assert got[(2, "2024-01-01 00:00:00")] == 1


def test_polite_throttle_state_spans_micro_batches(spark):
    src = tempfile.mkdtemp() + "/cands"
    schema = "netloc string, url string"
    # batch 1: 3 candidates for host a (budget 2 -> one rejected)
    _write_batch(spark, src, [
        ("a", "https://a/1"), ("a", "https://a/2"), ("a", "https://a/3"),
        ("b", "https://b/1"),
    ], schema)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        polite_throttle(stream, budget=2)
        .writeStream.format("memory").queryName("throttle")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["url"]: r["admitted"] for r in spark.sql("select * from throttle").collect()}
    assert got == {
        "https://a/1": True, "https://a/2": True, "https://a/3": False,
        "https://b/1": True,
    }
