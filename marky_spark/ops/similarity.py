"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk`` — exact cosine top-k: JVM-side ``zip_with`` +
  ``aggregate`` dot product (whole-stage codegen; no Python). The baseline
  and the oracle path.
- ``lsh_buckets`` / ``ann_topk`` — the scale path: random-hyperplane sign
  LSH (Charikar). Hyperplanes are deterministic pseudo-random (seeded
  numpy), computed in an Arrow-vectorized pandas stage as one matmul per
  batch; search probes only the query's bucket (multi-probe by Hamming-1
  neighbors), so the scan is ~corpus/2^bits instead of the full table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PLANES = 8
PLANE_SEED = 0x5EED


def _as_double(col: str = "embedding"):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def brute_force_topk(emb: DataFrame, query_vec: list[float],
                     k: int = 10) -> DataFrame:
    """Exact global top-k by cosine against a constant query vector."""
    q = [float(x) for x in query_vec]
    qnorm = sum(x * x for x in q) ** 0.5
    qlit = F.array(*[F.lit(x) for x in q])
    e = emb.select("vec_id", _as_double().alias("v"))
    dot = F.expr(
        "aggregate(zip_with(v, q, (x, y) -> x * y), 0.0D, (a, p) -> a + p)"
    )
    norm = F.expr("sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x))")
    scored = (
        e.withColumn("q", qlit)
        .select("vec_id", (dot / (norm * F.lit(qnorm))).alias("cosine"))
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _planes(dim: int, n_planes: int = N_PLANES):
    import numpy as np

    rng = np.random.default_rng(PLANE_SEED)
    return rng.standard_normal((dim, n_planes))


def lsh_buckets(emb: DataFrame, dim: int = 64,
                n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign-hash of ``n_planes`` fixed hyperplanes.
    One numpy matmul per Arrow batch — the vectorized slow path."""
    import numpy as np

    planes = _planes(dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            signs = (mat @ planes) > 0
            bucket = (signs.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "bucket": bucket})

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, bucket long"
    )


def ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             dim: int = 64, n_planes: int = N_PLANES,
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (+ Hamming-1
    neighbors) with exact cosine re-ranking inside the probed set."""
    import numpy as np

    planes = _planes(dim, n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    signs = (q @ planes) > 0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    q_bucket = int((signs.astype(np.int64) * weights).sum())
    probes = [q_bucket]
    if multiprobe:
        probes += [q_bucket ^ (1 << b) for b in range(n_planes)]

    buckets = lsh_buckets(emb, dim, n_planes)
    candidates = (
        emb.join(buckets.where(F.col("bucket").isin(probes)), "vec_id")
        .drop("bucket")
    )
    return brute_force_topk(candidates, list(map(float, q)), k)
