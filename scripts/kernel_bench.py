"""Single-thread per-kernel microbenchmark (no Spark).

Measures µs/document per span kind over the deterministic synthetic corpus
plus the blended mix rate — the numbers quoted in BENCH/BASELINE.md's
"Single-thread kernel rate" paragraph. Pure-Python timing of
``convert_document`` isolates kernel cost from the Arrow/JVM substrate
(whose scaling is measured by scripts/scaling_bench.py).

Usage: python scripts/kernel_bench.py [n_docs]      (default 20000)
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from marky_spark.convert import convert_document
    from marky_spark.corpus import make_synth_doc

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    by_kind: dict[str, list] = collections.defaultdict(list)
    for i in range(n_docs):
        d = make_synth_doc(i)
        by_kind[d["spans"][0]["kind"]].append(d)

    # warm (interning, regex caches, zip templates)
    for kind, ds in by_kind.items():
        for d in ds[:50]:
            convert_document(d["doc_id"], d["spans"])

    per_kind: dict[str, float] = {}
    tot_t = tot_n = 0.0
    for kind, ds in sorted(by_kind.items()):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for d in ds:
                r = convert_document(d["doc_id"], d["spans"])
                assert r["status"] == "ok", (kind, r["error"])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_kind[kind] = round(best / len(ds) * 1e6, 1)
        tot_t += best
        tot_n += len(ds)
        print(f"{kind:8s} n={len(ds):6d} {per_kind[kind]:8.1f} us/doc",
              file=sys.stderr)
    print(json.dumps({
        "n_docs": int(tot_n),
        "per_kind_us": per_kind,
        "mix_docs_per_sec": round(tot_n / tot_t, 1),
    }))


if __name__ == "__main__":
    main()
