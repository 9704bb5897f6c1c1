"""Deduplication operators for a training-data pipeline.

Scale notes (the 100 TB design point):

- **exact**: one hash-groupBy shuffle on a 32-hex key — the minimum possible.
- **MinHash+LSH**: signatures are computed entirely JVM-side (whole-stage
  codegen: split → shingle transform → md5 per seed → array_min); candidate
  pairs come from a *band-bucket* shuffle (each doc explodes into
  ``n_bands`` rows), so the join is O(docs × bands), never O(docs²).
  Min-hash values are fixed-width lowercase hex strings — lexicographic min
  == numeric min, which keeps the whole operator in string-land and makes it
  reproducible in any ANSI engine (the DuckDB oracle runs the same formula).
- **n-gram Jaccard verify**: exact similarity only on LSH candidates.
- **SimHash**: near-dup by Hamming distance on the 64-bit signature
  (textstats.simhash64), banded on 16-bit chunks for candidate generation.
- **embedding near-dup**: cosine ≥ τ pairs, LSH-bucketed by sign hashes at
  scale (similarity.py); the bounded exact variant here is the oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
BAND_SIZE = 2  # 6 bands × 2 rows
# LSH band-bucket cap: buckets larger than this are dropped from candidate
# generation (with a counted, logged drop metric — never silent). Rationale:
# pair volume is quadratic in bucket size, so one degenerate bucket (template
# boilerplate sharing bands across millions of distinct docs) would otherwise
# concentrate O(n²) pair structs in a single task. 512 ids ⇒ ≤130,816 pairs
# per bucket — bounded work per task at any corpus scale.
MAX_BUCKET = 512


def exact_dupes(df: DataFrame, col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: cluster key, size, keeper id."""
    return df.groupBy(F.md5(col).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_dupes"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


def _shingles_expr(words_col: str, k: int = 3) -> str:
    """SQL expr: array of word k-shingles over an ALREADY-SPLIT word-array
    column. The caller hoists split() into its own column first: placed
    inside the slice lambda it re-splits the whole document once per
    shingle — O(words^2), measured 1.5x slower on the sf0.1 corpus."""
    return (
        f"transform(sequence(1, greatest(size({words_col}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice({words_col}, i, {k})))"
    )


def minhash_signature(df: DataFrame, col: str = "text",
                      n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig array<string>): sig[i] = min over shingles of
    substr(md5(i || ':' || shingle), 1, 8). Pure JVM expressions.

    The shingle array is hoisted into its own projection: inlining the
    split/slice/concat subtree into each of the ``n_hashes`` min
    expressions is NOT common-subexpression-eliminated by Catalyst, so
    the naive form recomputes shingling 12× per document — measured 5.8×
    slower on the sf0.1 corpus for identical output."""
    sig = F.array(*[
        F.expr(
            "array_min(transform(__mh_sh, "
            f"s -> substring(md5(concat('{i}:', s)), 1, 8)))"
        )
        for i in range(n_hashes)
    ])
    return (
        df.withColumn("__w", F.split(F.col(col), " "))
        .withColumn("__mh_sh", F.expr(_shingles_expr("__w")))
        .select("doc_id", sig.alias("sig"))
    )


def minhash_bands(df: DataFrame, col: str = "text",
                  n_hashes: int = N_HASHES,
                  band_size: int = BAND_SIZE) -> DataFrame:
    """Explode signatures into (band_idx, band_key, doc_id) bucket rows."""
    sigs = minhash_signature(df, col, n_hashes)
    n_bands = n_hashes // band_size
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws("|", *[F.col("sig")[b * band_size + j]
                               for j in range(band_size)]).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    return (
        sigs.select("doc_id", F.explode(bands).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_key")
    )


def minhash_candidate_pairs(df: DataFrame, col: str = "text",
                            max_bucket: int | None = MAX_BUCKET,
                            drop_stats: dict | None = None) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH band bucket.

    One signature scan + ONE shuffle: band rows group by (band_idx,
    band_key), each bucket's sorted id set expands to its pairs JVM-side
    (nested transform over the array). The earlier self-join formulation
    shuffled band rows on both sides and — because Spark cannot reuse the
    exchange across the aliased branches — ran the whole signature scan
    twice; measured 2× slower for identical output.

    Pair volume within a bucket is quadratic in bucket size under EITHER
    formulation — that is inherent to LSH banding. Exact-dedup FIRST
    (exact_dupes) collapses the identical-copy mass, but template
    boilerplate (same bands, distinct text) can still create a mega
    bucket, so buckets over ``max_bucket`` ids are DROPPED from candidate
    generation — a recall cap, never silent: pass ``drop_stats={}`` to
    receive ``{'n_dropped_buckets', 'n_dropped_ids'}`` (an extra action
    over the localCheckpointed bucket set), and :func:`minhash_dupes`
    logs a warning whenever the count is nonzero. ``max_bucket=None``
    disables the cap (the bounded oracle path).

    Residual O(bucket) memory note: ``collect_set`` still materializes a
    dropped bucket's id array once before the size filter — linear, spills,
    and is ~5 orders of magnitude smaller than the pair explosion the cap
    prevents.
    """
    bands = minhash_bands(df, col)
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        if drop_stats is not None:
            buckets = buckets.localCheckpoint()
            row = (buckets.where(F.size("ids") > max_bucket)
                   .agg(F.count(F.lit(1)).alias("nb"),
                        F.coalesce(F.sum(F.size("ids")), F.lit(0)).alias("ni"))
                   .collect()[0])
            drop_stats["n_dropped_buckets"] = row["nb"]
            drop_stats["n_dropped_ids"] = row["ni"]
        buckets = buckets.where(F.size("ids") <= max_bucket)
    pair_expr = (
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, greatest(size(ids) - i - 1, 0)), "
        "b -> named_struct('doc_a', a, 'doc_b', b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame,
                  col: str = "text", k: int = 3) -> DataFrame:
    """Exact word-k-gram Jaccard for given (doc_a, doc_b) pairs.

    Shingle sets are only materialized for documents that appear in a
    candidate pair (semi-join first): at corpus scale the verify stage
    touches the candidate slice, never re-shingles and re-shuffles the
    whole table."""
    ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    needed = df.join(ids, "doc_id", "left_semi")
    sh = F.array_distinct(F.expr(_shingles_expr("__w", k)))
    docs = (needed.withColumn("__w", F.split(F.col(col), " "))
            .select("doc_id", sh.alias("sh")))
    a = docs.alias("a")
    b = docs.alias("b")
    joined = (
        pairs.join(a, pairs["doc_a"] == F.col("a.doc_id"))
        .join(b, pairs["doc_b"] == F.col("b.doc_id"))
    )
    inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
    union = F.size(F.array_union("a.sh", "b.sh")).cast("double")
    # parts-per-million via floor: integer output is bit-identical across
    # engines (round() tie-breaking would diverge)
    return joined.select(
        "doc_a", "doc_b",
        F.floor(inter / union * 1_000_000).cast("long").alias("jaccard_ppm"),
    )


def minhash_dupes(df: DataFrame, col: str = "text",
                  threshold: float = 0.7,
                  max_bucket: int | None = MAX_BUCKET) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: bands → candidates → exact
    Jaccard verify → pairs ≥ threshold.

    Buckets over ``max_bucket`` ids are excluded from candidate generation
    (see :func:`minhash_candidate_pairs`); the drop count is computed and
    logged here so a recall-affecting cap is never silent.

    The candidate set is localCheckpointed: the verify stage consumes it
    TWICE (semi-join ids + the pair join), and without materialization each
    use re-derives the band self-join and with it the signature scan —
    measured 2× the whole pipeline's cost on the sf0.1 corpus. Candidates
    are tiny relative to the corpus (that is the point of LSH), so
    materializing them is the cheap side of the trade at any scale."""
    import logging

    stats: dict = {}
    pairs = minhash_candidate_pairs(
        df, col, max_bucket=max_bucket,
        drop_stats=stats if max_bucket is not None else None,
    ).localCheckpoint()
    if stats.get("n_dropped_buckets"):
        logging.getLogger(__name__).warning(
            "minhash_dupes: dropped %d LSH buckets (> %d ids, %d id rows) "
            "from candidate generation — recall is capped for those docs",
            stats["n_dropped_buckets"], max_bucket, stats["n_dropped_ids"])
    verified = ngram_jaccard(df, pairs, col)
    return verified.where(F.col("jaccard_ppm") >= int(threshold * 1_000_000))


def simhash_dupes(df: DataFrame, col: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup: band the 64-bit signature into 4×16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), bucket-join,
    verify exact Hamming distance JVM-side (bit_count of xor)."""
    from .textstats import simhash64

    sigs = simhash64(df, col)
    chunks = F.array(*[
        F.struct(
            F.lit(c).alias("chunk_idx"),
            F.shiftrightunsigned(F.col("simhash"), c * 16)
            .bitwiseAND(F.lit(0xFFFF)).alias("chunk_key"),
        )
        for c in range(4)
    ])
    banded = (
        sigs.select("doc_id", "simhash", F.explode(chunks).alias("c"))
        .select("doc_id", "simhash", "c.chunk_idx", "c.chunk_key")
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(r, (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
               & (F.col("l.chunk_key") == F.col("r.chunk_key"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def dup_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, component).

    The transitive-closure step of dedup: near-dup pairs a~b, b~c must
    collapse into ONE keep-group even when a~c was never emitted. Uses the
    alternating large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): O(log² n) rounds, each
    round two shuffles (a groupBy-min and a join) — no collect_list of
    neighbor sets, so a 10^9-member component cannot blow an executor.
    ``component`` is the minimum doc_id of the component (the canonical
    keeper). Every doc incident to a pair appears exactly once.

    Per-round ``localCheckpoint`` truncates the lineage chain — an iterative
    plan would otherwise grow exponentially and re-run every prior round at
    each action.
    """
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # canonical directed representation: u > v
    edges = (
        pairs.where(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )

    def _digest(d: DataFrame) -> tuple:
        # one action: count + order-insensitive content hash of the edge set
        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # convergence = this round's edge digest equals the previous round's;
    # caching the previous digest halves the actions (the naive form
    # re-digests BOTH edge sets every round — 2×O(log² n) full passes)
    prev = _digest(edges)
    converged = False
    for _ in range(max_iter):
        # large-star: m = min(Γ(u) ∪ {u}); emit (w, m) for neighbors w > u
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on larger→smaller edges: m = min(N(u));
        # emit (u, m) and (w, m) for w ∈ N(u) \ {m}
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        # converged when every edge points at its component root: the edge
        # set is a star forest iff small-star changed nothing
        cur = _digest(small)
        edges = small
        if cur == prev:
            converged = True
            break
        prev = cur

    if not converged:
        # an unconverged star forest yields WRONG components (nodes pointing
        # at non-roots); refuse rather than silently under-merge — the
        # caller raises max_iter (rounds needed grow ~log² of the largest
        # component's diameter)
        raise RuntimeError(
            f"dup_components did not converge in {max_iter} rounds; "
            "raise max_iter")

    member = edges.select(F.col("u").alias("doc_id"),
                          F.col("v").alias("component"))
    return (
        nodes.join(member, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )


def embedding_dupes(emb: DataFrame, threshold: float = 0.95,
                    max_id: int | None = None) -> DataFrame:
    """Exact cosine near-dup pairs over an embedding table
    (vec_id, embedding array<float>). ``max_id`` bounds the O(n²) exact
    variant (the oracle path); the scale path buckets by hyperplane sign
    hashes first (similarity.lsh_buckets)."""
    e = emb
    if max_id is not None:
        e = e.where(F.col("vec_id") < max_id)
    e = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "norm", F.expr("sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x))")
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)"
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
