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


def _bucket_of(mat, planes):
    """Sign-hash bucket ids for a (n, dim) matrix. The ONE implementation
    shared by assignment (lsh_buckets), query hashing, and probe filtering —
    recall silently dies if these ever diverge."""
    import numpy as np

    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)
    signs = (mat @ planes) > 0
    return (signs.astype(np.int64) * weights).sum(axis=1)


def _cell_of(mat, cent, cnorm):
    """Nearest-centroid cell ids for a (n, dim) matrix (shared by
    ivf_assign and the probe filter; see _bucket_of).
    ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 with ||x||^2 constant per row."""
    return (cnorm[None, :] - 2.0 * (mat @ cent.T)).argmin(axis=1)


def lsh_buckets(emb: DataFrame, dim: int = 64,
                n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign-hash of ``n_planes`` fixed hyperplanes.
    One numpy matmul per Arrow batch — the vectorized slow path."""
    import numpy as np

    planes = _planes(dim, n_planes)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "bucket": _bucket_of(mat, planes)})

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
    q_bucket = int(_bucket_of(q[None, :], planes)[0])
    probes = [q_bucket]
    if multiprobe:
        probes += [q_bucket ^ (1 << b) for b in range(n_planes)]

    # single-pass probe: bucket computed and filtered inside one Arrow stage
    # (a join back onto emb would shuffle the fact table twice at scale)
    candidates = _probe_filter_lsh(emb, planes, probes)
    return brute_force_topk(candidates, list(map(float, q)), k)


def _probe_filter_lsh(emb: DataFrame, planes, probes: list[int]) -> DataFrame:
    import numpy as np

    probe_arr = np.asarray(sorted(set(probes)), dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            mask = np.isin(_bucket_of(mat, planes), probe_arr)
            if mask.any():
                yield pdf.loc[mask, ["vec_id", "embedding"]]

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, embedding array<float>"
    )


def knn_join(emb: DataFrame, k: int = 5,
             max_id: int | None = None) -> DataFrame:
    """Batch k-NN self-join: top-``k`` cosine neighbors for EVERY vector
    (the shape embedding-dedup and hard-negative mining consume), as
    (vec_id, neighbor_id, cos_ppm, rank).

    Exact variant: theta-join + per-vector window — O(n²) compare, one
    shuffle for the join and one for the window. ``max_id`` bounds it (the
    oracle path). At corpus scale the same window runs per LSH bucket /
    IVF cell instead (``lsh_buckets`` / ``ivf_assign`` co-partition both
    sides, making the join bucket-local).

    Similarity is integer parts-per-million (floor) and the window orders
    by (cos_ppm DESC, neighbor_id ASC) — bit-stable across engines, where
    ordering by raw doubles would tie-break nondeterministically.
    """
    from pyspark.sql.window import Window

    e = emb
    if max_id is not None:
        e = e.where(F.col("vec_id") < max_id)
    e = e.select("vec_id", _as_double().alias("v")).withColumn(
        "norm", F.expr("sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x))")
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)"
    )
    cos_ppm = F.floor(
        dot / (F.col("a.norm") * F.col("b.norm")) * 1_000_000
    ).cast("long")
    pairs = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            cos_ppm.alias("cos_ppm"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_ppm"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-bucketed scale path
# ---------------------------------------------------------------------------

IVF_SEED = 0x1FF


def train_ivf_centroids(emb: DataFrame, n_cells: int = 16,
                        sample: int = 2048, iters: int = 10,
                        dim: int = 64):
    """Deterministic mini k-means on a driver-side sample (the coarse
    quantizer is tiny — centroids broadcast to executors; training data is a
    bounded sample, never the full corpus).

    The sample is the ``sample`` rows with the smallest md5(vec_id) — a
    deterministic pseudo-random draw that is independent of storage order
    (a bare ``limit(sample)`` takes the first partitions' rows, so on a
    sorted/clustered corpus the centroids would all come from one region
    and IVF recall would degrade silently). ``orderBy + limit`` compiles to
    TakeOrderedAndProject (per-partition top-K, no global sort shuffle)."""
    import numpy as np

    rows = (
        emb.select(
            "embedding",
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":ivf")))
            .alias("_h"),
        )
        .orderBy("_h")
        .limit(sample)
        .select("embedding")
        .collect()
    )
    x = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(IVF_SEED)
    centroids = x[rng.choice(len(x), size=min(n_cells, len(x)),
                             replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, one numpy matmul per
    Arrow batch (||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row)."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    cnorm = (cent ** 2).sum(axis=1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            cell = _cell_of(mat, cent, cnorm)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "cell": cell.astype("int64")})

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, cell long"
    )


def ivf_assign_multi(emb: DataFrame, centroids, nprobe: int) -> DataFrame:
    """(vec_id, cell) with each vector fanned out to its ``nprobe`` nearest
    cells — the query side of the bucketed k-NN join (see knn_join_ivf)."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    cnorm = (cent ** 2).sum(axis=1)
    p = min(nprobe, len(cent))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            d2 = cnorm[None, :] - 2.0 * (mat @ cent.T)
            near = np.argpartition(d2, p - 1, axis=1)[:, :p]
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, p),
                "cell": near.reshape(-1).astype("int64"),
            })

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, cell long"
    )


def knn_join_ivf(emb: DataFrame, k: int = 5, n_cells: int = 16,
                 nprobe: int = 3, centroids=None) -> DataFrame:
    """Bucketed batch k-NN join — the scale path of :func:`knn_join`.

    Query vectors fan out to their ``nprobe`` nearest IVF cells; corpus
    vectors sit in their primary cell only. The join is cell-local
    (co-partitioned on ``cell``), so compare volume is
    Σ_cell |queries probing cell| × |cell| instead of n² — and at corpus
    scale ``cell`` is the Iceberg partition key, making the probe side a
    partition-pruned scan. Approximate: neighbors outside the probed cells
    are missed (recall vs the exact join is pinned in tests).
    """
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = train_ivf_centroids(emb, n_cells=n_cells)
    e = emb.select(
        "vec_id", "embedding", _as_double().alias("v")
    ).withColumn(
        "norm", F.expr("sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x))")
    )
    qcells = ivf_assign_multi(e, centroids, nprobe)
    ccells = ivf_assign(e, centroids).withColumnRenamed("cell", "ccell")
    q = (qcells.join(e, "vec_id")
         .select("vec_id", "cell", F.col("v").alias("qv"),
                 F.col("norm").alias("qnorm")))
    c = (ccells.join(e, "vec_id")
         .select(F.col("vec_id").alias("neighbor_id"),
                 F.col("ccell").alias("cell"), F.col("v").alias("cv"),
                 F.col("norm").alias("cnorm")))
    dot = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0.0D, (a, p) -> a + p)"
    )
    cos_ppm = F.floor(dot / (F.col("qnorm") * F.col("cnorm")) * 1_000_000
                      ).cast("long")
    pairs = (
        q.join(c, "cell")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", cos_ppm.alias("cos_ppm"))
        .distinct()  # a neighbor reachable through several probed cells
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_ppm"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_cells: int = 16, nprobe: int = 4,
             centroids=None) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest cells, exact cosine re-rank
    inside the probed set. At corpus scale the assignment is precomputed and
    the probed cells are partition-pruned (cell = Iceberg partition key)."""
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(emb, n_cells=n_cells)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in d2.argsort()[:nprobe]]

    # single-pass probe (see _probe_filter_lsh); at corpus scale the
    # assignment is instead precomputed and cell is the Iceberg partition
    # key, so the probe becomes partition pruning on the scan
    candidates = _probe_filter_ivf(emb, centroids, probes)
    return brute_force_topk(candidates, list(map(float, q)), k)


def _probe_filter_ivf(emb: DataFrame, centroids, probes: list[int]) -> DataFrame:
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    cnorm = (cent ** 2).sum(axis=1)
    probe_arr = np.asarray(sorted(set(probes)), dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in pdf["embedding"]])
            mask = np.isin(_cell_of(mat, cent, cnorm).astype(np.int64),
                           probe_arr)
            if mask.any():
                yield pdf.loc[mask, ["vec_id", "embedding"]]

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, embedding array<float>"
    )
