"""Span-table construction used by the driver contract (__spark_entry__.py).

Builds the BASELINE.json input_hint span table deterministically from the
driver-provided ``documents`` parquet (doc_id, text, lang, source, n_chars)
— JVM-side (pure Column expressions, no Python) so the only Python stage in
the flagship job is the conversion kernel itself.

Template routing by ``doc_id % 4``: 0→html, 1→csv, 2→ipynb, 3→text+media
interleave. The templates are deliberately reconstructible in ANSI SQL so
DuckDB oracles can pin the *converted markdown* byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _span(kind, text, media_ref, offset: int):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


def docs_to_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,n_chars) → (doc_id, spans) span table."""
    sid = F.col("doc_id").cast("string")
    empty = F.lit("")

    html_payload = F.concat(
        F.lit("<h2>Doc "), sid, F.lit("</h2><p>"), F.col("text"),
        F.lit(" <em>"), F.col("lang"), F.lit("</em>.</p>"),
    )
    csv_payload = F.concat(
        F.lit("doc_id,lang,n_chars\n"),
        sid, F.lit(","), F.col("lang"), F.lit(","),
        F.col("n_chars").cast("string"),
    )
    ipynb_payload = F.concat(
        F.lit('{"nbformat":4,"metadata":{"title":"Doc '), sid,
        F.lit('"},"cells":[{"cell_type":"code","source":["n = '),
        F.col("n_chars").cast("string"), F.lit('"]}]}'),
    )

    mod = F.pmod(F.col("doc_id"), F.lit(4))
    spans = (
        F.when(mod == 0, F.array(_span(F.lit("html"), html_payload, empty, 0)))
        .when(mod == 1, F.array(_span(F.lit("csv"), csv_payload, empty, 0)))
        .when(mod == 2, F.array(_span(F.lit("ipynb"), ipynb_payload, empty, 0)))
        .otherwise(
            F.array(
                _span(F.lit("text"), F.col("text"), empty, 0),
                _span(F.lit("image"), empty,
                      F.concat(F.lit("media://"), sid), 1),
            )
        )
    )
    return docs.select(sid.alias("doc_id"), spans.alias("spans"))


def converted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full flagship conversion over the sf documents table."""
    from .convert import convert

    return convert(docs_to_spans(load_documents(spark, sf_dir)))
