"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming state (SURVEY.md §2.2); this is the substrate
demo for custom stateful operators the build brief names explicitly
(``applyInPandasWithState``): per-user event sessions closed by an
inactivity gap, with state carried across micro-batches and flushed on
event-time timeout.

A batch twin (``sessionize_batch``) computes identical sessions with window
functions — the streaming result is verified against it in tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SECONDS = 30 * 60

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

# state: (session_start_epoch, last_ts_epoch, n_events, total_value)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_US = 1_000_000


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = GAP_SECONDS * _US

    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(start_us, unit="us"),
              pd.Timestamp(last_us, unit="us"), n, total)],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )
        return

    events: list[tuple[int, float]] = []
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        events.extend(zip(ts_us.tolist(), pdf["value"].tolist()))
    events.sort()

    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = -1
        n, total = 0, 0.0

    closed: list[tuple] = []
    for ts_us, value in events:
        if start_us < 0:
            start_us = last_us = ts_us
            n, total = 1, float(value)
        elif ts_us - last_us > gap_us:
            closed.append((user_id, pd.Timestamp(start_us, unit="us"),
                           pd.Timestamp(last_us, unit="us"), n, total))
            start_us = last_us = ts_us
            n, total = 1, float(value)
        else:
            # a cross-batch late arrival (ts < last_us, still inside the
            # watermark) must not regress the session window or the timeout:
            # the batch twin takes min/max over the session's events
            if ts_us > last_us:
                last_us = ts_us
            if ts_us < start_us:
                start_us = ts_us
            n += 1
            total += float(value)

    if start_us >= 0:
        state.update((start_us, last_us, n, total))
        # close the open session once event time passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame(
            closed, columns=[f.name for f in SESSION_SCHEMA.fields]
        )


def sessionize_stream(events: DataFrame,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming gap sessionization with event-time timeouts."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame,
                     gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch twin: identical sessions via window functions (lag + cumulative
    session ids). Includes the trailing open session of each user."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    with_gap = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull()
             | (F.col("ts").cast("double") - F.col("prev_ts").cast("double")
                > gap_seconds)).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return with_gap.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("session_id")
