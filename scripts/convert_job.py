"""Production driver script (reference CLI parity: cmd/marky/main.go:15-51,
re-shaped for a cluster: one job over a table, not one process per file).

    spark-submit --py-files marky_spark.zip scripts/convert_job.py \
        --input  /data/corpus_spans   (parquet dir or Iceberg table) \
        --output /data/out            (output root: out_spans/lineage/metrics) \
        --buckets 64 --waves 4 [--kinds html,pdf] [--local N]

Resumable: rerunning with the same --output skips committed buckets
(manifest snapshot; see marky_spark/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="convert_job")
    ap.add_argument("--input", required=True,
                    help="span-table parquet dir (or Iceberg table name)")
    ap.add_argument("--output", required=True, help="output root dir")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--kinds", default=None,
                    help="comma list: restrict to these span kinds")
    ap.add_argument("--local", type=int, default=None,
                    help="run on local[N] (default: session from spark-submit)")
    args = ap.parse_args(argv)

    from marky_spark.pipeline import run_convert_job
    from marky_spark.session import get_spark

    spark = get_spark(app="marky-convert",
                      master=f"local[{args.local}]" if args.local else None)
    spark.sparkContext.setLogLevel("WARN")

    if not os.path.exists(args.input) and "/" not in args.input:
        df = spark.read.table(args.input)
    else:
        if not os.path.exists(args.input):
            print(f"error: input {args.input!r} does not exist",
                  file=sys.stderr)
            return 1  # existence check parity: cmd/marky/main.go:23-25
        df = spark.read.parquet(args.input)

    if args.kinds:
        from pyspark.sql import functions as F

        kinds = [k.strip() for k in args.kinds.split(",") if k.strip()]
        df = df.where(F.arrays_overlap("spans.kind", F.lit(kinds)))

    t0 = time.time()
    results = run_convert_job(spark, df, args.output,
                              n_buckets=args.buckets, waves=args.waves)
    n_docs = sum(r.n_docs for r in results)
    n_err = sum(r.n_errors for r in results)
    dt = time.time() - t0
    print(json.dumps({
        "docs": n_docs, "errors": n_err, "seconds": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1) if dt > 0 else None,
        "waves": len(results), "output": args.output,
        "resumed": len(results) == 0,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
