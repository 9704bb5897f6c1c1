"""Custom stateful streaming operator vs its batch twin."""

import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from marky_spark.ops.sessionize import sessionize_batch, sessionize_stream

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "part-0.parquet")

    schema = spark.read.parquet(str(events_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(events_dir))
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory").queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], round(r["total_value"], 2))
        for r in spark.sql("SELECT * FROM sess").collect()
    }

    batch = sessionize_batch(
        spark.read.parquet(f"{SF}/events.parquet")
    ).collect()
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], round(r["total_value"], 2))
        for r in batch
    }

    # every streamed session must be a real batch session
    assert got <= expected, sorted(got - expected)[:3]
    # in a single availableNow pass the stream closes sessions that a later
    # event's gap proves finished; trailing open sessions (one per user)
    # stay in state awaiting the event-time timeout
    n_users = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id").distinct().count()
    assert len(expected) - len(got) <= n_users
    assert len(got) > 0


def test_batch_sessionize_gap_semantics(spark):
    from marky_spark.ops.sessionize import sessionize_batch

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),   # same session (10 min gap)
        (1, "2024-01-01 01:00:00", 3.0),   # 50 min gap → new session
        (2, "2024-01-01 00:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in sessionize_batch(df).collect()
    )
    assert got == [(1, 1, 3.0), (1, 2, 3.0), (2, 1, 4.0)]


def test_cross_batch_late_event_does_not_regress_session_end():
    """A late event (within watermark) arriving a micro-batch after a newer
    one must extend, not regress, the session window and timeout."""
    import pandas as pd

    from marky_spark.ops.sessionize import _sessionize_group

    class FakeState:
        def __init__(self):
            self.hasTimedOut = False
            self.exists = False
            self._v = None
            self.timeout = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

        def remove(self):
            self._v = None
            self.exists = False

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

    us = 1_000_000
    t12 = 12 * 3600 * us
    t1150 = t12 - 10 * 60 * us
    state = FakeState()

    def batch(ts_us_list):
        pdf = pd.DataFrame({
            "ts": [pd.Timestamp(t, unit="us") for t in ts_us_list],
            "value": [1.0] * len(ts_us_list),
        })
        return list(_sessionize_group((7,), iter([pdf]), state))

    batch([t12])
    assert state.get[1] == t12
    batch([t1150])  # late arrival
    start_us, last_us, n, total = state.get
    assert last_us == t12       # end not regressed
    assert start_us == t1150    # start extended back (batch-twin min)
    assert n == 2 and total == 2.0
    assert state.timeout == t12 // 1000 + 30 * 60 * 1000
