"""Deadline / progress monitor tests (TessMonitor analog,
/root/reference/src/monitor.rs:18-50, process_pages timeout
api.rs:844-875)."""

import pandas as pd
import pyspark.sql.functions as F

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.corpus import render_html
from tesseract_rs_spark.kernels.html import STATUS_TIMEOUT, extract_doc
from tesseract_rs_spark.monitor import ProgressMonitor
from tesseract_rs_spark.operators.extract import extract_text
from tesseract_rs_spark.operators.multipage import process_pages


def _pathological_page() -> bytes:
    # tens of thousands of tokens: the cooperative deadline check fires
    # long before the page finishes segmenting
    return ("<div>" + "<b>word</b> " * 30000 + "</div>").encode()


def test_page_timeout_yields_timeout_row_not_failure():
    cfg = ExtractConfig().with_variable("page_timeout_ms", "0")
    r = extract_doc(_pathological_page(), cfg)
    assert r.status == STATUS_TIMEOUT
    assert r.text == "" and r.failure_spans == [(0, len(_pathological_page().decode()))]
    # generous deadline -> normal extraction
    ok = extract_doc(_pathological_page(), ExtractConfig().with_variable("page_timeout_ms", "60000"))
    assert ok.status == "ok" and ok.n_words == 30000


def test_timeout_row_in_distributed_job(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u0", "u1"],
            "html": [render_html("fine page words here", 0, "en").encode(), _pathological_page()],
        }
    )
    pages = spark.createDataFrame(pdf)
    cfg = ExtractConfig().with_variable("page_timeout_ms", "0")
    rows = {r["url"]: r["status"] for r in extract_text(pages, cfg).collect()}
    # the small page segments in under a stride (no deadline check fires);
    # the pathological one times out -- and the job COMPLETES
    assert rows["u1"] == "timeout"


def test_process_pages_timeout_counts_failed_pages(spark):
    pdf = pd.DataFrame(
        {
            "url": ["d", "d"],
            "page_num": [0, 1],
            "html": [render_html("good page", 0, "en").encode(), _pathological_page()],
        }
    )
    pages = spark.createDataFrame(pdf)
    row = process_pages(pages, key="url", timeout_ms=0).collect()[0]
    assert row["n_pages"] == 2 and row["n_failed_pages"] == 1


def test_progress_monitor_counts_pages(spark):
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(40)],
            "html": [render_html(f"page {i} words", i, "en").encode() for i in range(40)],
        }
    )
    pages = spark.createDataFrame(pdf).repartition(4)
    mon = ProgressMonitor(spark)
    extract_text(pages, ExtractConfig(), monitor=mon).count()
    assert mon.pages == 40
    assert mon.batches >= 1


def test_raster_page_timeout_row():
    from tesseract_rs_spark.kernels.raster import extract_raster_doc, render_page

    page = render_page("many words here rendered onto a page " * 20)
    r = extract_raster_doc(page, timeout_ms=0)
    assert r.status == "timeout"
    ok = extract_raster_doc(page, timeout_ms=60000)
    assert ok.status == "ok"
