"""Driver contract for the spark-graft builder (PySpark target).

Queries run the extraction engine over a *deterministically derived* pages
table: each row of the driver-provided ``documents`` parquet is rendered
into a boilerplate-wrapped Common-Crawl-style HTML page
(tesseract_rs_spark/corpus.py), then the engine decodes, segments,
strips boilerplate, and re-assembles the text.  Because the render is a
pure function of (doc_id, text, lang), the byte-exact expected output is
expressible in ANSI SQL over ``documents`` — giving the DuckDB oracle a
true end-to-end check of the whole pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.operators.extract import extract_text, extract_words
from tesseract_rs_spark.sources.pages import pages_from_documents

PARA_WORDS = 25
_SINGLE_PARA = 1_000_000_000  # one paragraph holding the whole document


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction (with failure spans) over sf0.001."""
    pages = pages_from_documents(_docs(spark, "/root/testdata/sf0.001"))
    return extract_text(pages, ExtractConfig(), id_cols=("doc_id", "url"), spans=True)


# ---------------------------------------------------------------------------
# correctness queries (driver runs these at sf0.01 vs the DuckDB oracles)
# ---------------------------------------------------------------------------


def _q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(_docs(spark, sf_dir), para_words=PARA_WORDS)
    return extract_text(pages, id_cols=("doc_id",)).select("doc_id", "text", "status")


def _q_extract_text_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(_docs(spark, sf_dir), para_words=_SINGLE_PARA)
    return extract_text(pages, id_cols=("doc_id",)).select("doc_id", "text")


def _q_extract_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(_docs(spark, sf_dir), para_words=PARA_WORDS)
    return extract_words(pages, id_cols=("doc_id",)).select(
        "doc_id", "block_id", "line_id", "word_id", "word"
    )


def _q_extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(_docs(spark, sf_dir), para_words=PARA_WORDS)
    return extract_text(pages, id_cols=("doc_id",)).select(
        "doc_id", "status", "n_words", "n_chars"
    )


def _q_extract_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(_docs(spark, sf_dir), para_words=PARA_WORDS)
    return (
        extract_text(pages, id_cols=("doc_id", "lang"))
        .groupBy("lang", "status")
        .agg(F.count("*").alias("n"))
    )


def _q_extract_mean_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed template variant 0 (<main><article>) -> every content block is a
    # hard keep at confidence 95 (kernels/html.py CONF_HARD_KEEP)
    pages = pages_from_documents(
        _docs(spark, sf_dir), para_words=PARA_WORDS, variant=0
    )
    return extract_text(pages, id_cols=("doc_id",)).select("doc_id", "mean_conf")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_text": _q_extract_text,
        "extract_text_single": _q_extract_text_single,
        "extract_words": _q_extract_words,
        "extract_metrics": _q_extract_metrics,
        "extract_status_counts": _q_extract_status_counts,
        "extract_mean_conf": _q_extract_mean_conf,
    }


# Shared CTE: explode documents into (doc_id, wid, w) word rows.
_WORDS_CTE = """
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS wid,
         unnest(string_split(text, ' ')) AS w
  FROM documents
)
"""


def oracle_sql() -> dict[str, str]:
    nl = "chr(10)"
    para_sep = f"{nl} || {nl}"
    return {
        "extract_text": _WORDS_CTE
        + f"""
        , paras AS (
          SELECT doc_id, CAST((wid - 1) // {PARA_WORDS} AS BIGINT) AS pid,
                 string_agg(w, ' ' ORDER BY wid) AS para
          FROM words GROUP BY doc_id, pid
        )
        SELECT doc_id,
               string_agg(para, {para_sep} ORDER BY pid) || {nl} AS text,
               'ok' AS status
        FROM paras GROUP BY doc_id
        """,
        "extract_text_single": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, text || {nl} AS text
        FROM documents
        """,
        "extract_words": _WORDS_CTE
        + f"""
        SELECT doc_id,
               CAST((wid - 1) // {PARA_WORDS} AS BIGINT) AS block_id,
               CAST(0 AS BIGINT) AS line_id,
               CAST((wid - 1) % {PARA_WORDS} AS BIGINT) AS word_id,
               w AS word
        FROM words
        """,
        "extract_metrics": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               'ok' AS status,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(length(text)
                    + CEIL(len(string_split(text, ' ')) / {PARA_WORDS}.0)
                    AS BIGINT) AS n_chars
        FROM documents
        """,
        "extract_status_counts": """
        SELECT lang, 'ok' AS status, count(*) AS n
        FROM documents GROUP BY lang
        """,
        "extract_mean_conf": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(95 AS BIGINT) AS mean_conf
        FROM documents
        """,
    }
