"""Structured Streaming tier (SURVEY.md §2.9).

The crawl loop itself is batch-iterative (BFS waves match the reference's
semantics), but the engine's monitoring/ingest surfaces are streaming-native:

- `windowed_fetch_metrics` — watermarked tumbling-window per-status counts
  over a fetch-event stream (the live crawl dashboard feed).
- `sessionized_activity` — session_window aggregation (same operator the
  batch oracle checks as q_session_windows).
- `polite_throttle` — a *stateful* per-host politeness limiter via
  applyInPandasWithState: at most `budget` urls per netloc per interval,
  with the running count carried in GroupState across micro-batches. This
  is the streaming twin of the batch politeness window (W1).

All sources/sinks are pluggable (file/kafka/rate in production; memory sink
+ explicit micro-batch boundaries in tests).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_fetch_metrics(
    fetch_events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-status fetch counts in tumbling event-time windows.

    Late events beyond `watermark` are dropped — state is bounded, which is
    what lets this run forever on a 1000-executor cluster.
    """
    return (
        fetch_events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "status")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "status", "n")
    )


def sessionized_activity(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session-window counts per user (streaming form of q_session_windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


THROTTLE_OUTPUT_SCHEMA = "netloc string, url string, admitted boolean"
THROTTLE_STATE_SCHEMA = "used long"


def _throttle_fn(budget: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (netloc,) = key
        used = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            # deterministic admission order within the batch
            for url in sorted(pdf["url"]):
                admitted = used < budget
                if admitted:
                    used += 1
                out.append((netloc, url, admitted))
        state.update((used,))
        yield pd.DataFrame(out, columns=["netloc", "url", "admitted"])

    return fn


def polite_throttle(candidates: DataFrame, budget: int = 10) -> DataFrame:
    """Stateful per-host admission control across micro-batches.

    GroupState carries the per-netloc used-budget count; urls beyond the
    budget are emitted with admitted=false (a real crawler would requeue
    them). State is per-netloc — the same salting/skew caveats as the batch
    politeness window apply and are handled by Spark's state-store
    partitioning on the group key.
    """
    return candidates.groupBy("netloc").applyInPandasWithState(
        _throttle_fn(budget),
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
