"""Renderer contracts — the reference's renderer suite altitude
(/root/reference/tests/test_renderer.rs, tests/test_e2e.rs:36-49: one
recognition pass feeds many output formats)."""

import pyspark.sql.functions as F
import pytest

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.corpus import make_corpus
from tesseract_rs_spark.operators.extract import extract_words
from tesseract_rs_spark.operators.renderers import (
    render_alto,
    render_box,
    render_hocr,
    render_tsv,
    render_unlv,
)


@pytest.fixture(scope="module")
def words(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rnd")
    pages, _ = make_corpus("smoke")
    spark.createDataFrame(pages).write.parquet(str(d / "pages.parquet"))
    w = extract_words(spark.read.parquet(str(d / "pages.parquet")), ExtractConfig())
    w.cache().count()
    return w


def test_tsv_contains_tabs_and_all_words(words):
    # TSV contains tab separators (tests/test_api.rs:164-173)
    tsv = render_tsv(words)
    row = tsv.filter(F.length("tsv") > 0).limit(1).collect()[0]
    lines = row["tsv"].split("\n")
    assert all(line.count("\t") == 8 for line in lines)
    assert all(line.startswith("5\t") for line in lines)
    n_words = words.filter(F.col("url") == row["url"]).count()
    assert len(lines) == n_words


def test_hocr_markup(words):
    # hOCR output contains ocr_page markup (tests/test_e2e.rs:46)
    row = render_hocr(words).limit(1).collect()[0]
    assert "ocr_page" in row["hocr"] and "ocrx_word" in row["hocr"]
    assert "x_wconf" in row["hocr"]


def test_box_lines_match_word_count(words):
    row = render_box(words).limit(1).collect()[0]
    n_words = words.filter(F.col("url") == row["url"]).count()
    assert len(row["box"].split("\n")) == n_words


def test_alto_wellformed_markers(words):
    row = render_alto(words).limit(1).collect()[0]
    assert row["alto"].startswith("<alto>") and row["alto"].endswith("</alto>")
    assert "<String CONTENT=" in row["alto"]


def test_unlv_equals_assembly_without_line_breaks(spark, words):
    """UNLV text is the assembly with block separators '\\n' — consistent
    with the word table (one recognition pass, many formats)."""
    from tesseract_rs_spark.operators.assemble import reassemble_text

    unlv = render_unlv(words)
    full = reassemble_text(words)
    j = unlv.join(full, "url")
    # strip the single trailing '\n' (rtrim only strips spaces), then
    # collapse block separators
    expected = F.regexp_replace(
        F.expr("substring(text, 1, length(text) - 1)"), r"\n\n", "\n"
    )
    mismatch = j.filter(F.col("unlv") != expected).count()
    # blocks with internal <br> lines differ (unlv joins lines with space);
    # the smoke corpus has none, so the transform must match exactly
    assert mismatch == 0


def test_hocr_bbox_variant(spark):
    from tesseract_rs_spark.kernels.raster import render_page
    from tesseract_rs_spark.operators.ocr import ocr_words
    from tesseract_rs_spark.operators.renderers import render_hocr_bbox

    pages = spark.createDataFrame(
        [("u", render_page("ab cd"))], "url string, html binary"
    )
    h = render_hocr_bbox(ocr_words(pages)).collect()[0]["hocr"]
    assert "title='bbox 16 16 50 40; x_wconf 100'>ab</span>" in h


def test_spans_present_and_ordered(words):
    bad = words.filter(
        (F.col("span_start") < 0) | (F.col("span_end") <= F.col("span_start"))
    ).count()
    assert bad == 0
