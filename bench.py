"""Headline benchmark. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Env knobs:
- ``SPARK_GRAFT_SF_DIR``   (default /root/testdata/sf0.1)
- ``SPARK_GRAFT_CPUS``     (default 32)
- ``SPARK_GRAFT_BENCH_DOCS`` (default 50000) — synthetic span-corpus size

The headline number is documents/sec through the full conversion pipeline
(the BASELINE.json metric); per-query wall seconds are reported alongside.
Scaling-efficiency evidence (pinned N vs 4N cores) lives in
``scripts/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "50000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from marky_spark.convert import convert
    from marky_spark.corpus import spark_corpus
    from marky_spark.session import get_spark

    spark = get_spark(
        app="marky-spark-bench",
        master=f"local[{cpus}]",
        confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries: dict[str, float] = {}

    def timed(name: str, fn) -> float:
        best = None
        for _ in range(2):  # min-of-2: reject noisy hypervisor windows
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        return best

    # warm the Python workers (excluded from measurement)
    convert(spark_corpus(spark, 512)).count()

    # headline: full conversion of the deterministic synthetic span corpus
    corpus = spark_corpus(spark, n_docs).persist()
    corpus.count()  # materialize generation outside the timed window
    from pyspark.sql import functions as F

    # best of 3: the sandbox hypervisor has noisy windows (observed 2-3x
    # drift on identical runs); min-of-N rejects bad windows, and the
    # headline number deserves one more repeat than the sub-queries
    convert_sec = None
    counts: dict[str, int] = {}
    for _ in range(3):
        t0 = time.time()
        out = convert(corpus)
        counts = {r["status"]: r["n"] for r in
                  out.groupBy("status").agg(F.count("*").alias("n")).collect()}
        dt = time.time() - t0
        convert_sec = dt if convert_sec is None else min(convert_sec, dt)
    corpus.unpersist()
    queries["convert_corpus"] = round(convert_sec, 3)
    n_ok = counts.get("ok", 0)
    docs_per_sec = n_ok / convert_sec if convert_sec > 0 else 0.0

    # flagship conversion over the driver-provided documents table
    from marky_spark.entry_helpers import converted

    timed("convert_documents", lambda: converted(spark, sf_dir).count())

    # substrate / training-data queries (same callables the driver verifies)
    q = entry_mod.queries()
    for name in ("dedup_exact", "token_stats", "events_window",
                 "resume_anti_join", "convert_metrics",
                 "minhash_dupes", "knn_join_ivf", "sessionize"):
        if name in q:
            timed(name, lambda name=name: q[name](spark, sf_dir).count())

    # "curate" stays the single-model (stopword) pipeline for cross-round
    # comparability — the driver query of the same name now unions BOTH
    # language models (round-3 registry consolidation) and would double
    # this wall for reasons unrelated to the operator's speed
    from marky_spark.entry_helpers import docs_to_spans, load_documents
    from marky_spark.ops.curate import curate as curate_op

    timed("curate", lambda: curate_op(
        docs_to_spans(load_documents(spark, sf_dir)),
        rates=entry_mod._CURATE_RATES, default_rate=0.25,
        min_quality_bp=entry_mod._CURATE_MIN_BP).count())

    # adversarial byte skew: every 50th doc is 100x the median (~2% of docs
    # hold ~2/3 of all bytes) — exercises pipeline.skew_balanced's p99 split
    # + round-robin isolation of the mega tail, the path that keeps a 100 TB
    # wave from serializing multi-GB documents into one hash partition
    from marky_spark.pipeline import skew_balanced

    skew_n = max(n_docs // 10, 2000)
    skewed = spark_corpus(spark, skew_n, mega_every=50,
                          mega_factor=100).persist()
    skewed.count()  # materialize generation outside the timed window
    timed("convert_skewed",
          lambda: convert(skew_balanced(skewed, cpus * 2))
          .where("status = 'ok'").count())
    skewed.unpersist()

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "total wall seconds: full span-corpus conversion + "
                  "substrate queries (BASELINE.json throughput metric is "
                  "the docs_per_sec field: documents/sec to ordered "
                  "Markdown spans, 10-kind mix, skew tail)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        "n_ok": n_ok,
        "docs_per_sec": round(docs_per_sec, 1),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
