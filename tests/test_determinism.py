"""Partitioning-invariance: operator results must not depend on the data's
physical layout. At 1000-executor scale the partitioning is different on
every run (AQE, cluster size, input splits) — any operator whose output
shifts with it (partition-seeded rand(), unordered first()/limit,
float-order-dependent aggregation) silently breaks reproducibility and the
resume contract.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("parts", [3, 17])
def test_results_invariant_under_repartition(spark, parts):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shuffled = docs.repartition(parts, "lang")  # deliberately poor layout

    from marky_spark.ops.dedup import dup_components, minhash_signature
    from marky_spark.ops.sampling import sample_stratified

    base_sample = _rowset(
        sample_stratified(docs, {"en": 0.3}, default_rate=0.1)
        .select("doc_id"))
    assert base_sample == _rowset(
        sample_stratified(shuffled, {"en": 0.3}, default_rate=0.1)
        .select("doc_id"))

    assert _rowset(minhash_signature(docs.limit(0).unionByName(docs))) == \
        _rowset(minhash_signature(shuffled))

    a = docs.where(F.pmod("doc_id", F.lit(7)) == 0).select(
        F.col("doc_id").alias("doc_a"))
    pairs = a.join(docs.select(F.col("doc_id").alias("doc_b")),
                   a["doc_a"] + 1 == F.col("doc_b"))
    assert _rowset(dup_components(pairs)) == _rowset(
        dup_components(pairs.repartition(parts)))


@pytest.mark.parametrize("shuffle_parts", ["5", "23"])
def test_curate_invariant_under_shuffle_partitions(spark, shuffle_parts):
    from marky_spark.entry_helpers import docs_to_spans, load_documents
    from marky_spark.ops.curate import curate

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
        spans = docs_to_spans(load_documents(spark, SF))
        out = curate(spans, rates={"en": 0.75, "und": 0.5},
                     default_rate=0.25, min_quality_bp=1000)
        got = _rowset(out.select("doc_id", "pred_lang", "quality_score_bp"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    if not hasattr(test_curate_invariant_under_shuffle_partitions, "_ref"):
        test_curate_invariant_under_shuffle_partitions._ref = got
    assert got == test_curate_invariant_under_shuffle_partitions._ref
