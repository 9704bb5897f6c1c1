"""Regenerate marky_spark/frozen_golden.py — the FROZEN expected outputs of
the binary-format kernels over the deterministic synthetic corpus.

The driver's DuckDB oracle cannot parse zip/PDF containers in SQL, so the
binary kernels (docx/xlsx/pptx/epub/pdf) are pinned the other way around:
this script runs the kernels ONCE over the deterministic corpus slice
(corpus.make_synth_doc — same bytes everywhere, forever), records
``(doc_id, md5(markdown), len(markdown))`` per document, and freezes those
as Python literals that ``__spark_entry__.oracle_sql`` turns into literal
``VALUES`` oracles. The frozen values are committed to git: any later
kernel regression changes the Spark side but NOT the frozen expectation,
so the driver's correctness gate goes red.

Run deliberately, only when the *intended* kernel output changes:

    python scripts/gen_frozen_golden.py

and review the diff like any golden update.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marky_spark.convert import convert_document  # noqa: E402
from marky_spark.corpus import (  # noqa: E402
    EXTRA_KINDS,
    N_EXTRA,
    make_extra_doc,
    make_synth_doc,
)

N_CORPUS = 2000  # matches the convert_* driver queries' corpus size
BINARY_KINDS = ("docx", "xlsx", "pptx", "epub", "pdf")


def main() -> None:
    golden: dict[str, list[tuple[str, str, int]]] = {k: [] for k in BINARY_KINDS}
    for i in range(N_CORPUS):
        doc = make_synth_doc(i)
        kinds = {s["kind"] for s in doc["spans"]}
        kind = next((k for k in BINARY_KINDS if k in kinds), None)
        if kind is None:
            continue
        row = convert_document(doc["doc_id"], doc["spans"])
        assert row["status"] == "ok", (doc["doc_id"], row["error"])
        assert row["md_chars"] == len(row["markdown"])
        golden[kind].append((
            row["doc_id"],
            hashlib.md5(row["markdown"].encode("utf-8")).hexdigest(),
            row["md_chars"],
        ))

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "marky_spark", "frozen_golden.py")
    with open(out_path, "w") as f:
        f.write('"""FROZEN binary-kernel goldens — GENERATED, do not edit '
                'by hand.\n\nRegenerate with scripts/gen_frozen_golden.py '
                '(see that file for why these\nare frozen literals rather '
                'than recomputed). Shape:\n'
                'BINARY_GOLDEN[kind] = [(doc_id, md5(markdown), '
                'len(markdown)), ...]\nover the deterministic '
                f'{N_CORPUS}-doc corpus slice.\n"""\n\n')
        f.write(f"N_CORPUS = {N_CORPUS}\n\n")
        f.write("BINARY_GOLDEN = {\n")
        for kind in BINARY_KINDS:
            f.write(f"    {kind!r}: [\n")
            for doc_id, md5_hex, n in golden[kind]:
                f.write(f"        ({doc_id!r}, {md5_hex!r}, {n}),\n")
            f.write("    ],\n")
        f.write("}\n")
        # beyond-the-reference kinds over their own deterministic corpora
        f.write(f"\nN_EXTRA = {N_EXTRA}\n\n")
        f.write("EXTRA_GOLDEN = {\n")
        for kind in EXTRA_KINDS:
            f.write(f"    {kind!r}: [\n")
            for i in range(N_EXTRA):
                doc = make_extra_doc(kind, i)
                row = convert_document(doc["doc_id"], [
                    {"kind": s[0], "text": s[1], "media_ref": s[2],
                     "offset": s[3]} for s in doc["spans"]])
                assert row["status"] == "ok", (kind, i, row["error"])
                h = hashlib.md5(row["markdown"].encode("utf-8")).hexdigest()
                f.write(f"        ({doc['doc_id']!r}, {h!r}, "
                        f"{row['md_chars']}),\n")
            f.write("    ],\n")
        f.write("}\n")
    total = sum(len(v) for v in golden.values())
    print(f"wrote {out_path}: "
          + ", ".join(f"{k}={len(golden[k])}" for k in BINARY_KINDS)
          + f" (total {total})")


if __name__ == "__main__":
    main()
