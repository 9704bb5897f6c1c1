"""Structured Streaming surface: streaming == batch on the same inputs."""

from marky_spark.streaming import (
    stream_convert,
    stream_event_metrics,
    windowed_event_metrics,
)

SF = "/root/testdata/sf0.001"


def test_stream_convert_matches_batch(spark, tmp_path):
    from marky_spark.convert import convert
    from marky_spark.corpus import spark_corpus

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark_corpus(spark, 120, partitions=2).write.parquet(input_dir)

    q = stream_convert(spark, input_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = convert(spark.read.parquet(input_dir))
    assert got.count() == 120
    g = {r["doc_id"]: (r["status"], r["md_chars"]) for r in got.collect()}
    b = {r["doc_id"]: (r["status"], r["md_chars"]) for r in batch.collect()}
    assert g == b

    # exactly-once: restarting over the same checkpoint adds nothing
    q2 = stream_convert(spark, input_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 120


def test_windowed_metrics_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (str(r["window_start"]), r["event_type"]):
            (r["n_events"], r["total_value"])
        for r in windowed_event_metrics(events).collect()
    }

    # file stream sources need a directory, not a bare parquet file
    import shutil

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "part-0.parquet")
    q = stream_event_metrics(spark, str(events_dir),
                             str(tmp_path / "ckpt2"), query_name="tm")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]):
            (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tm").collect()
    }
    assert got == expected
    assert len(got) > 10
