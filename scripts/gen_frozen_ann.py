"""Regenerate marky_spark/frozen_ann.py — FROZEN sf0.01 outputs of the
deterministic-approximate ANN queries (ann_topk / ivf_topk / knn_join_ivf).

These operators are approximate by construction (recall vs brute force is
pinned in tests/test_ops.py), but they are fully DETERMINISTIC: the LSH
hyperplanes and IVF centroid seeds are fixed (PLANE_SEED / IVF_SEED), the
centroid sample is a deterministic md5-ordered draw, and every tie breaks
on integer (cos_ppm, id) ordering. So their exact output at the driver's
correctness scale (sf0.01) is a stable contract — frozen here as literals
that ``__spark_entry__.oracle_sql`` turns into VALUES oracles. A change to
the hashing, sampling, probing, or ranking logic flips those rows red.

Run deliberately, only when the *intended* algorithm changes:

    python scripts/gen_frozen_ann.py

and review the diff like any golden update.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.01"
QUERIES = ("ann_topk", "ivf_topk", "knn_join_ivf")


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    frozen: dict[str, tuple[list[str], list[tuple]]] = {}
    for name in QUERIES:
        df = entry.queries()[name](spark, SF_DIR)
        cols = df.columns
        rows = sorted(tuple(int(v) for v in r) for r in df.collect())
        frozen[name] = (cols, rows)
        print(f"{name}: {len(rows)} rows, cols {cols}")
    spark.stop()

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "marky_spark", "frozen_ann.py")
    with open(out_path, "w") as f:
        f.write('"""FROZEN sf0.01 ANN-query outputs — GENERATED, do not '
                'edit by hand.\n\nRegenerate with scripts/gen_frozen_ann.py '
                '(see that file for the\ndeterminism argument). Shape: '
                'ANN_GOLDEN[name] = (columns, rows).\nValid ONLY for the '
                f'driver correctness scale {SF_DIR!r}.\n"""\n\n')
        f.write(f"SF_DIR = {SF_DIR!r}\n\n")
        f.write("ANN_GOLDEN = {\n")
        for name, (cols, rows) in frozen.items():
            f.write(f"    {name!r}: ({cols!r}, [\n")
            for row in rows:
                f.write(f"        {row!r},\n")
            f.write("    ]),\n")
        f.write("}\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
