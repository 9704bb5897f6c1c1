"""Deterministic stratified sampling for training-data curation.

The 100 TB design point: sampling must be (a) a pure narrow filter — no
shuffle, no state, no driver round-trip — so it composes with the scan and
pushes work to zero for filtered-out strata; (b) deterministic across
retries/resumes (a task re-run MUST select the same rows, or exactly-once
output breaks); (c) reproducible outside Spark for audit.

Construction: per-row uniform u = first 8 hex chars of md5(key || ':' ||
salt), kept iff u < threshold(stratum). Fixed-width lowercase hex compares
lexicographically == numerically, so the whole operator stays in string-land
and any ANSI engine reproduces it bit-for-bit (the driver's DuckDB oracle
runs the same formula). ``rand(seed)`` is NOT suitable here: it is seeded
per-partition, so the kept set changes with the partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """rate ∈ [0,1] → 8-hex-digit exclusive upper bound ('g' sorts above
    every hex digit, so rate ≥ 1 keeps everything)."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 16 ** 8), 0), "08x")


def sample_uniform(col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(col.cast("string"), F.lit(":" + salt))),
                       1, 8)


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0, key: str = "doc_id",
                      stratum: str = "lang",
                      salt: str = "v1") -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]``
    (``default_rate`` for unlisted strata), deterministically in the row key.

    Changing ``salt`` draws an independent sample; keeping it fixed makes
    rates monotone (rate 0.1 selects a subset of rate 0.2's rows — handy for
    growing a training mix without resampling the corpus).
    """
    thresh: Column = F.lit(_hex_threshold(default_rate))
    for s, r in sorted(rates.items()):
        thresh = F.when(F.col(stratum) == s,
                        F.lit(_hex_threshold(r))).otherwise(thresh)
    return df.where(sample_uniform(F.col(key), salt) < thresh)


def sample_oracle_sql(rates: dict[str, float], default_rate: float = 0.0,
                      key: str = "doc_id", stratum: str = "lang",
                      salt: str = "v1", table: str = "documents",
                      select: str = "doc_id, lang") -> str:
    """The ANSI-SQL twin of :func:`sample_stratified` (driver oracle)."""
    cases = " ".join(
        f"WHEN {stratum} = '{s}' THEN '{_hex_threshold(r)}'"
        for s, r in sorted(rates.items())
    )
    return f"""
        SELECT {select} FROM {table}
        WHERE substr(md5({key}::VARCHAR || ':{salt}'), 1, 8)
              < CASE {cases} ELSE '{_hex_threshold(default_rate)}' END
    """
