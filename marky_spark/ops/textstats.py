"""Text-analysis operators for a training-data pipeline.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (whole-stage
codegen; no Python) except ``simhash64``, which is an Arrow-vectorized pandas
transform (bit-parallel numpy) — the documented slow path.

Every operator is deterministic and (except simhash) mirrored 1:1 in ANSI SQL
by the driver oracles in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword slices per language — deliberately tiny and fixed: the operator
# contract is the *formula*, not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den"),
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace tokens + regex (BPE-ish) tokens + char count."""
    return df.select(
        "doc_id",
        F.size(F.split(F.col(col), " ")).cast("long").alias("ws_tokens"),
        # pattern as a literal Column — dodges SQL-string backslash escaping
        F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))
        .cast("long").alias("re_tokens"),
        F.length(col).cast("long").alias("n_chars"),
    )


def _stopword_hits(col: str, words: tuple[str, ...]) -> Column:
    """Count of whitespace tokens that are in the stopword list (JVM-side
    filter over the split array — no Python)."""
    arr = ",".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split({col}, ' '), t -> array_contains(array({arr}), t)))"
    ).cast("long")


def _bp(col) -> Column:
    # basis points via floor: integer outputs are bit-identical across
    # engines (round() half-up vs half-even would diverge at boundaries)
    return F.floor(col * 10000).cast("long")


def quality_feature_cols(col: str) -> dict[str, Column]:
    """The shallow-quality feature Columns, reusable as expressions so a
    composed pipeline (ops/curate.py) can compute them inline without a join
    back onto its main frame."""
    n_chars = F.length(col).cast("double")
    words = F.split(F.col(col), " ")
    n_words = F.size(words).cast("double")
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # chars minus separators
    stop = _stopword_hits(col, LANG_STOPWORDS["en"]).cast("double")
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")

    stop_ratio = stop / n_words  # n_words >= 1 always: split('') -> ['']
    # n_chars = 0 would make these 0.0/0.0 = NaN, and NaN sorts above every
    # double, so least(1.0, NaN) = 1.0 — empty text would score a perfect
    # 10000 bp and sail through curate()'s quality filter. Guard to 0.
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    # composite: reward stopword presence + alphabetic mass, punish
    # punctuation soup; clamp to [0,1]
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            stop_ratio * 2.0 + alpha_ratio - punct_ratio * 5.0,
        ),
    )
    return {
        "mean_word_len_bp": _bp(mean_wlen),
        "stopword_ratio_bp": _bp(stop_ratio),
        "punct_ratio_bp": _bp(punct_ratio),
        "alpha_ratio_bp": _bp(alpha_ratio),
        "quality_score_bp": _bp(score),
    }


def quality_scores(df: DataFrame, col: str = "text") -> DataFrame:
    """Shallow quality features (Kohlschütter-style shallow text features):
    length, mean word length, stopword ratio, punctuation ratio, alpha ratio,
    and a composite [0,1] score."""
    feats = quality_feature_cols(col)
    return df.select("doc_id", *[c.alias(n) for n, c in feats.items()])


def lang_pred_col(col: str) -> Column:
    """Stopword-vote predicted language as a reusable expression (see
    quality_feature_cols)."""
    scores = {lang: _stopword_hits(col, words)
              for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first language reaching the max wins
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-vote language ID over the fixed language set; ties break by
    language-key order (en < es < de by first-win)."""
    scores = {lang: _stopword_hits(col, words)
              for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    out = df.select("doc_id", lang_pred_col(col).alias("pred_lang"),
                    *[scores[lang].alias(f"hits_{lang}") for lang in langs])
    return out


def fingerprint_col(col: str) -> Column:
    """md5 of the whitespace-normalized, lowercased text as a reusable
    expression (content-defined identity for exact-ish dedup and lineage)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return F.md5(normalized)


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (content-defined identity for exact-ish dedup and lineage)."""
    return df.select("doc_id", fingerprint_col(col).alias("fingerprint"))


def simhash64(df: DataFrame, col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): per-token
    64-bit hash (md5 low 8 bytes), bit-parallel vote, sign → bits.

    Arrow-vectorized pandas path (numpy bit ops); no SQL oracle — verified by
    pure-Python re-implementation in tests (rows-only driver check).
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                tokens = (text or "").split()
                if not tokens:
                    out.append((doc_id, 0))
                    continue
                hashes = np.frombuffer(
                    b"".join(hashlib.md5(t.encode()).digest()[:8]
                             for t in tokens),
                    dtype=">u8",
                )
                bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64))
                        & np.uint64(1))
                # signed: unsigned *2 - n would wrap below zero
                votes = bits.sum(axis=0).astype(np.int64) * 2 - len(tokens)
                sig = int(
                    ((votes > 0).astype(np.uint64)
                     << np.arange(64, dtype=np.uint64)).sum()
                )
                out.append((doc_id, sig - (1 << 64) if sig >= (1 << 63) else sig))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return df.select("doc_id", col).mapInPandas(
        batches, schema="doc_id long, simhash long"
    )


def winnow_fingerprints(df: DataFrame, col: str = "text",
                        k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS rolling-hash scheme): hash every char k-gram, slide a window
    of ``w`` consecutive k-gram hashes, keep the minimum of each window;
    the distinct selected hashes are the document's fingerprints. Guarantees
    any shared substring of length >= k + w - 1 yields a shared fingerprint.

    Fully JVM-side (transform/slice/array_min — whole-stage codegen); the
    k-gram hash is the first 8 md5 hex chars, so the construction is
    reproducible in ANSI SQL for the driver oracle. Returns one row per
    (doc_id, fingerprint).
    """
    grams = (
        f"transform(sequence(1, greatest(length({col}) - {k - 1}, 1)), "
        f"i -> substring(md5(substring({col}, i, {k})), 1, 8))"
    )
    sel = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(_grams) - {w - 1}, 1)), "
        f"j -> array_min(slice(_grams, j, {w}))))"
    )
    return (
        df.select("doc_id", F.expr(grams).alias("_grams"))
        .select("doc_id", F.explode(F.expr(sel)).alias("fingerprint"))
    )


# Character-trigram profiles per language (tiny, fixed; the operator
# contract is the formula — a production system swaps in learned profiles)
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ing", "ng ", "and", "nd ", " an", " of",
           "of ", "ion", "ed ", "er ", " in", "ent", "is ", " is"),
    "es": (" de", "de ", "os ", " la", "la ", "es ", "ar ", " es", "que",
           " qu", "el ", " el", "ado", " co", "ien", "nte", "cio"),
    "de": ("der", " de", "ein", "ich", "sch", "die", "und", "ung", "en ",
           "ch ", "gen", " ge", "ber", "ten", "ie ", "ne ", " di"),
}


def _trigram_grams_expr(lc_col: str) -> str:
    """SQL expr: overlapping trigrams of an ALREADY-LOWERCASED column.

    The caller hoists lower() into its own column first: placed inside the
    transform lambda, lower() re-lowers the whole document once per gram —
    O(n^2) chars per document, measured 2.6x slower on the sf0.1 corpus."""
    return (
        f"transform(sequence(1, greatest(length({lc_col}) - 2, 1)), "
        f"i -> substring({lc_col}, i, 3))"
    )


def _trigram_hits(grams_col: str) -> dict[str, Column]:
    """Per-language hit counts over an ALREADY-HOISTED trigram array column.

    Hoisting matters: Catalyst does not common-subexpression-eliminate a
    repeated transform() subtree, and the argmax/tie-break expression tree
    references each score several times (greatest + one WHEN per language)
    — inlining the extraction into the scores re-ran it ~18x per row,
    measured ~20x slower than this staged form for identical output."""
    scores: dict[str, Column] = {}
    for lang, tris in LANG_TRIGRAMS.items():
        arr = ",".join("'" + t.replace("'", "\\'") + "'" for t in tris)
        scores[lang] = F.expr(
            f"size(filter({grams_col}, t -> array_contains(array({arr}), t)))"
        ).cast("long")
    return scores


def _pred_from_scores(scores: dict[str, Column]) -> Column:
    """argmax language from plain score Columns; ties break in language
    order, all-zero -> 'und'. Feed it materialized columns, not expression
    trees (see _trigram_hits)."""
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred


def with_lang_pred_ngram(df: DataFrame, col: str,
                         out: str = "pred_lang") -> DataFrame:
    """Append a character-trigram predicted-language column via narrow
    staged projections (hoisted grams -> hoisted scores -> argmax). The
    composition hook curate() uses — the trigram model beats the 3-language
    stopword vote on short/markup-heavy text, so a production 100 TB
    curation run prefers it. Adds no shuffle."""
    langs = list(LANG_TRIGRAMS)
    staged = (
        df.withColumn("__lc", F.lower(F.col(col)))
        .withColumn("__tri", F.expr(_trigram_grams_expr("__lc")))
    )
    for lang, c in _trigram_hits("__tri").items():
        staged = staged.withColumn(f"__tri_{lang}", c)
    pred = _pred_from_scores({lang: F.col(f"__tri_{lang}") for lang in langs})
    return staged.withColumn(out, pred).drop(
        "__lc", "__tri", *[f"__tri_{lang}" for lang in langs])


def lang_id_ngram(df: DataFrame, col: str = "text") -> DataFrame:
    """Character-trigram language ID: count how many of the document's
    trigrams (lowercased, overlapping) appear in each language's fixed
    profile; argmax wins, ties break by language order, zero hits -> 'und'.
    One trigram extraction + one JVM-side filter per language (no Python);
    grams and scores are hoisted into staged columns (see _trigram_hits)."""
    langs = list(LANG_TRIGRAMS)
    staged = (
        df.withColumn("__lc", F.lower(F.col(col)))
        .withColumn("__tri", F.expr(_trigram_grams_expr("__lc")))
        .select(
            "doc_id",
            *[c.alias(f"tri_{lang}")
              for lang, c in _trigram_hits("__tri").items()],
        )
    )
    return staged.select(
        "doc_id",
        _pred_from_scores({lang: F.col(f"tri_{lang}") for lang in langs})
        .alias("pred_lang"),
        *[f"tri_{lang}" for lang in langs],
    )


def lang_id_full(df: DataFrame, col: str = "text") -> DataFrame:
    """Both language-ID models in ONE narrow projection: the stopword vote
    (``pred_lang`` + ``hits_*``) and the character-trigram profile
    (``pred_lang_tri`` + ``tri_*``). One text scan, no join — the shape a
    production pipeline wants when it records both signals per document.
    Scores are hoisted into materialized columns before the argmax
    expressions reference them (see _trigram_hits)."""
    langs = list(LANG_STOPWORDS)
    sw = {lang: _stopword_hits(col, words)
          for lang, words in LANG_STOPWORDS.items()}
    tri = _trigram_hits("__tri")
    staged = (
        df.withColumn("__lc", F.lower(F.col(col)))
        .withColumn("__tri", F.expr(_trigram_grams_expr("__lc")))
        .select(
            "doc_id",
            *[sw[lang].alias(f"hits_{lang}") for lang in langs],
            *[tri[lang].alias(f"tri_{lang}") for lang in langs],
        )
    )
    return staged.select(
        "doc_id",
        _pred_from_scores({lang: F.col(f"hits_{lang}") for lang in langs})
        .alias("pred_lang"),
        *[f"hits_{lang}" for lang in langs],
        _pred_from_scores({lang: F.col(f"tri_{lang}") for lang in langs})
        .alias("pred_lang_tri"),
        *[f"tri_{lang}" for lang in langs],
    )


# Karp-Rabin rolling-hash parameters: base/modulus sized so every
# intermediate fits signed 64-bit in BOTH engines (term < 2^31 * 2^31 is
# avoided by reducing each term mod M; the k-term sum < 16 * 2^31 < 2^36)
RH_BASE = 257
RH_MOD = (1 << 31) - 1
RH_K = 16


def rolling_hashes(df: DataFrame, col: str = "text",
                   k: int = RH_K) -> DataFrame:
    """Karp-Rabin rolling-hash document fingerprints: the polynomial hash
    Σ cp(i+j)·B^(k-1-j) mod M of every overlapping ``k``-char gram, distinct
    per document → (doc_id, gram_hash).

    Vectorized numpy path (Arrow batches): codepoint array + k shifted
    multiply-adds — O(n·k) elementwise ops, no Python per character. The
    per-gram value equals the mathematically identical direct polynomial,
    which is what the ANSI-SQL oracle computes; a production pipeline feeds
    these into winnowing / LSH banding instead of re-hashing substrings.
    Documents shorter than ``k`` contribute no rows.
    """
    import numpy as np

    powers = np.array(
        [pow(RH_BASE, k - 1 - j, RH_MOD) for j in range(k)], dtype=np.int64
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids: list = []
            out_hash: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                s = text or ""
                n = len(s)
                if n < k:
                    continue
                cp = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                acc = np.zeros(n - k + 1, dtype=np.int64)
                for j in range(k):
                    acc += (cp[j:n - k + 1 + j] * powers[j]) % RH_MOD
                hashes = np.unique(acc % RH_MOD)
                out_ids.extend([doc_id] * len(hashes))
                out_hash.extend(hashes.tolist())
            yield pd.DataFrame({"doc_id": out_ids, "gram_hash": out_hash})

    return df.select("doc_id", col).mapInPandas(
        batches, schema="doc_id long, gram_hash long"
    )


# Redaction patterns — deliberately simple fixed regexes (the operator
# contract is the formula; production swaps in audited patterns). Order is
# load-bearing: emails first (their hostnames would otherwise half-match
# the URL pattern), then URLs, then long digit runs.
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{7,}\b", "<NUM>"),
)


def redact_cols(col: str) -> tuple[Column, Column]:
    """(redacted, n_redactions) as reusable expressions — see :func:`redact`
    for the counting and ordering contract."""
    out = F.col(col)
    counts = []
    for pat, token in REDACT_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(out, F.lit(pat), 0)).cast("long"))
        out = F.regexp_replace(out, pat, token)
    n_redacted = counts[0]
    for c in counts[1:]:
        n_redacted = n_redacted + c
    return out, n_redacted


def redact(df: DataFrame, col: str = "text") -> DataFrame:
    """PII/noise redaction for training text: emails, URLs, and long digit
    runs become placeholder tokens. A chain of JVM-side regexp_replace
    (whole-stage codegen, no shuffle, no Python).

    ``n_redactions`` counts the matches each pattern actually replaced (the
    match count on the text that pattern ran against — i.e. after the
    *previous* replacements), so documents that already contain literal
    '<EMAIL>'/'<URL>'/'<NUM>' tokens do not inflate the count.

    Pattern-order note (documented contract): emails redact before URLs, so
    a URL with userinfo ('https://user@host.com/x') has its authority
    rewritten to '<EMAIL>' and the remainder then matches the URL pattern.
    """
    redacted, n_redacted = redact_cols(col)
    return df.select(
        "doc_id",
        redacted.alias("redacted"),
        n_redacted.alias("n_redactions"),
    )
