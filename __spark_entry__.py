"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship conversion at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator checks at sf0.01 against a
DuckDB oracle (row-count + schema + order-insensitive value-hash).

The conversion queries are genuinely oracle-able because the span templates
(marky_spark/entry_helpers.py) are reconstructible in ANSI SQL, so DuckDB can
pin the *converted markdown* byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved span corpus from sf0.001 documents → ordered
    Markdown spans. Driver checks rows>0 and a stable schema."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, SF0001)
    return out.select(
        "doc_id", "conv_kind", "status", "n_in_spans", "n_out_spans",
        "md_chars", "markdown",
    )


# ---------------------------------------------------------------------------
# queries — one entry per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------


def _q_convert_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+O5: CSV scan → uniform markdown-table render (csv.go, markdown.go)."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, sf_dir)
    return out.where(F.col("conv_kind") == "csv").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("markdown").alias("markdown"),
    )


def _q_convert_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: HTML→Markdown kernel (html.go:26-38 semantics, from scratch)."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, sf_dir)
    return out.where(F.col("conv_kind") == "html").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("markdown").alias("markdown"),
    )


def _q_convert_ipynb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8+O9: ipynb parse/emit + title inference (ipynb.go:61-109)."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, sf_dir)
    return out.where(F.col("conv_kind") == "ipynb").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("markdown").alias("markdown"),
    )


def _q_media_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave invariant: media_ref survives conversion verbatim
    (FIXTURES.md §1; reference ![]() emission docx.go:196-204)."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, sf_dir)
    return (
        out.select(F.col("doc_id").cast("long").alias("doc_id"),
                   F.explode("out_spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )


def _q_convert_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics side-table agg over conversion output (SURVEY.md §2.2 aggs)."""
    from marky_spark.entry_helpers import converted

    out = converted(spark, sf_dir)
    return out.groupBy("conv_kind", "status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("md_chars").alias("total_md_chars"),
        F.sum("n_out_spans").alias("total_out_spans"),
    )


def _q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume primitive: left_anti against committed doc_ids
    (SURVEY.md §2.2 set ops; committed = doc_id % 10 < 3)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    committed = docs.where(F.pmod("doc_id", F.lit(10)) < 3).select("doc_id")
    return (
        docs.join(F.broadcast(committed), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token count + char count per doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("text_chars"),
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keep cluster size + keeper id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_dupes"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


def _q_events_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substrate agg demo over the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function (span-ordering analogue: partitionBy + orderBy)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("user_id", "event_id", "event_type", "rn")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "convert_csv": _q_convert_csv,
        "convert_html": _q_convert_html,
        "convert_ipynb": _q_convert_ipynb,
        "media_passthrough": _q_media_passthrough,
        "convert_metrics": _q_convert_metrics,
        "resume_anti_join": _q_resume_anti_join,
        "token_stats": _q_token_stats,
        "dedup_exact": _q_dedup_exact,
        "events_metrics": _q_events_metrics,
        "events_window": _q_events_window,
    }


# ---------------------------------------------------------------------------
# oracles — ANSI SQL equivalents for DuckDB over the same parquet views
# ---------------------------------------------------------------------------

_NL = "chr(10)"

# expected markdown per template kind, reconstructed in SQL
_CSV_MD = (
    "'| doc_id | lang | n_chars |' || chr(10) || "
    "'| --- | --- | --- |' || chr(10) || "
    "'| ' || doc_id || ' | ' || lang || ' | ' || n_chars || ' |' || chr(10)"
)
_HTML_MD = (
    "'## Doc ' || doc_id || chr(10) || chr(10) || "
    "text || ' *' || lang || '*.'"
)
_IPYNB_MD = (
    "'# Doc ' || doc_id || chr(10) || chr(10) || "
    "'```python' || chr(10) || 'n = ' || n_chars || chr(10) || '```'"
)
_TEXT_MD = "text || chr(10) || chr(10) || '![](media://' || doc_id || ')'"


def oracle_sql() -> dict[str, str]:
    return {
        "convert_csv": f"""
            SELECT doc_id, {_CSV_MD} AS markdown
            FROM documents WHERE doc_id % 4 = 1
        """,
        "convert_html": f"""
            SELECT doc_id, {_HTML_MD} AS markdown
            FROM documents WHERE doc_id % 4 = 0
        """,
        "convert_ipynb": f"""
            SELECT doc_id, {_IPYNB_MD} AS markdown
            FROM documents WHERE doc_id % 4 = 2
        """,
        "media_passthrough": """
            SELECT doc_id, 'media://' || doc_id AS media_ref
            FROM documents WHERE doc_id % 4 = 3
        """,
        "convert_metrics": f"""
            WITH md AS (
                SELECT CASE doc_id % 4
                         WHEN 0 THEN 'html' WHEN 1 THEN 'csv'
                         WHEN 2 THEN 'ipynb' ELSE 'text' END AS conv_kind,
                       'ok' AS status,
                       CASE doc_id % 4
                         WHEN 0 THEN length({_HTML_MD})
                         WHEN 1 THEN length({_CSV_MD})
                         WHEN 2 THEN length({_IPYNB_MD})
                         ELSE length({_TEXT_MD}) END AS md_chars,
                       CASE doc_id % 4 WHEN 3 THEN 2 ELSE 1 END AS n_out
                FROM documents)
            SELECT conv_kind, status, count(*) AS n_docs,
                   CAST(sum(md_chars) AS BIGINT) AS total_md_chars,
                   CAST(sum(n_out) AS BIGINT) AS total_out_spans
            FROM md GROUP BY conv_kind, status
        """,
        "resume_anti_join": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id % 10 >= 3
        """,
        "token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS text_chars
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_dupes,
                   min(doc_id) AS keeper_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "events_metrics": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY event_type
        """,
        "events_window": """
            SELECT user_id, event_id, event_type, rn FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn <= 2
        """,
    }
