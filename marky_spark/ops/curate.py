"""End-to-end training-data curation: convert → score → filter → dedup →
sample, composed from the engine's operators as ONE Spark plan.

This is the job a 100 TB corpus actually runs after extraction, and the
composition is shaped for that scale:

- conversion, quality scoring, language ID, and sampling are all *narrow*
  (the scores are computed inline as expressions via
  ``textstats.quality_feature_cols`` / ``lang_pred_col`` — never as a
  separate DataFrame joined back, which would shuffle the corpus twice);
- exact dedup is the ONE shuffle: a window over the content fingerprint,
  keeping the smallest ``doc_id`` per identical normalized text;
- stratified sampling is the deterministic hash-threshold filter
  (ops/sampling.py) — retry-safe and reproducible, applied LAST so the
  kept-rate applies to the clean pool.

Filters run before the dedup shuffle, so junk documents never pay shuffle
I/O. The whole pipeline is resumable by feeding it through
``pipeline.run_convert_job``'s committed output instead of raw spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..convert import convert
from .sampling import sample_stratified
from .textstats import lang_pred_col, quality_feature_cols, with_lang_pred_ngram


def curate(docs: DataFrame, rates: dict[str, float],
           default_rate: float = 0.0, min_quality_bp: int = 1500,
           keep_langs: tuple[str, ...] | None = None,
           salt: str = "v1", lang_model: str = "stopword",
           input_is_converted: bool = False) -> DataFrame:
    """Span documents → curated Markdown training rows.

    Returns (doc_id, pred_lang, quality_score_bp, markdown): converted OK,
    quality ≥ ``min_quality_bp`` basis points, language in ``keep_langs``
    (None = all, incl. 'und'), exact-dup collapsed to the smallest doc_id,
    stratified-sampled by predicted language at ``rates``.

    ``lang_model`` selects the language-ID expression: ``"stopword"``
    (3-language stopword vote) or ``"ngram"`` (character-trigram profiles —
    the model a production run prefers; markup-heavy or short documents
    rarely hit the tiny stopword lists). Either way it is an inline JVM
    expression: no extra stage, no join, no Python.

    ``input_is_converted=True`` skips the conversion kernel: ``docs`` must
    already hold (doc_id, markdown) of OK conversions — the seam for a
    caller that runs several curation configurations over ONE materialized
    conversion (e.g. ``pipeline.run_convert_job``'s committed output, or a
    localCheckpointed convert) instead of re-running the heaviest stage
    per configuration.
    """
    if lang_model not in ("stopword", "ngram"):
        raise ValueError(f"unknown lang_model {lang_model!r}")
    if input_is_converted:
        converted = docs.select("doc_id", "markdown")
    else:
        converted = (
            convert(docs)
            .where(F.col("status") == "ok")
            .select("doc_id", "markdown")
        )
    if lang_model == "ngram":
        # staged narrow projections (hoisted grams/scores — textstats
        # _trigram_hits explains why inlining is ~20x slower); no shuffle
        converted = with_lang_pred_ngram(converted, "markdown")
        pred = F.col("pred_lang")
    else:
        pred = lang_pred_col("markdown").alias("pred_lang")
    scored = converted.select(
        "doc_id",
        "markdown",
        pred,
        quality_feature_cols("markdown")["quality_score_bp"]
        .alias("quality_score_bp"),
    )
    filtered = scored.where(F.col("quality_score_bp") >= min_quality_bp)
    if keep_langs is not None:
        filtered = filtered.where(F.col("pred_lang").isin(list(keep_langs)))

    # exact dedup: one shuffle on the content fingerprint; smallest doc_id
    # wins deterministically
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("markdown")),
                                        r"\s+", " ")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    sampled = sample_stratified(
        deduped, rates, default_rate=default_rate,
        key="doc_id", stratum="pred_lang", salt=salt,
    )
    return sampled.select(
        "doc_id", "pred_lang", "quality_score_bp", "markdown")
