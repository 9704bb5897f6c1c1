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


def test_stream_convert_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Content-duplicate docs arriving in LATER files are dropped by the
    keyed state (dropDuplicatesWithinWatermark); distinct docs all pass."""
    from marky_spark.corpus import spark_corpus
    from marky_spark.streaming import stream_convert_dedup

    input_dir = tmp_path / "din"
    input_dir.mkdir()
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    base = spark_corpus(spark, 60, partitions=1)
    # wave 1: docs 0-59; wave 2: the same CONTENT under new doc_ids
    # (content dedup must catch them) plus 20 genuinely new docs
    base.write.parquet(str(input_dir / "w1"))
    import pyspark.sql.functions as F

    dup_wave = base.limit(30).withColumn(
        "doc_id", F.concat(F.lit("copy-"), F.col("doc_id")))
    fresh = spark_corpus(spark, 80, partitions=1).where(
        F.col("doc_id") > "doc-0000000059")
    dup_wave.unionByName(fresh).write.parquet(str(input_dir / "w2"))

    q = stream_convert_dedup(
        spark, str(input_dir) + "/*", out_dir, ckpt)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    # expected = one survivor per distinct converted content across BOTH
    # waves (the synthetic corpus reuses binary payload variants, so some
    # "fresh" docs legitimately collide with wave-1 content too)
    from marky_spark.convert import convert

    all_docs = spark.read.parquet(str(input_dir) + "/*")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("markdown")),
                                        r"\s+", " ")))
    n_distinct = (convert(all_docs).select(fp.alias("f"))
                  .distinct().count())
    assert got.count() == n_distinct
    assert got.count() >= 60  # every wave-1 doc survived
    # the 30 verbatim copies were all dropped
    assert got.where(F.col("doc_id").startswith("copy-")).count() == 0
