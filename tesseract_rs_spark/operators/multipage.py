"""Multi-page document processing — the ``process_pages`` / renderer
document-lifecycle analog (/root/reference/src/api.rs:844-875,
src/result_renderer.rs:93-134).

A multi-page document is rows ``(doc key, page_num, html)``.  The pipeline
extracts every page independently (one fused vectorized stage — pages of
the same document do NOT need co-location), then reassembles per document
with an ordered aggregation, pages joined by form-feed ``'\\f'`` (the
engine's page separator).  The retry knob re-runs failed pages once with a
fallback config before giving up (api.rs:844-875 retry semantics); rows
that still fail surface in ``n_failed_pages`` rather than killing the job.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.operators.extract import extract_text

PAGE_SEP = "\f"


def process_pages(
    pages: DataFrame,
    cfg: ExtractConfig | None = None,
    retry_cfg: ExtractConfig | None = None,
    key: str = "url",
    page_col: str = "page_num",
    timeout_ms: int | None = None,
) -> DataFrame:
    """(key, text, n_pages, n_failed_pages, mean_conf): per-document text
    with pages joined by '\\f' in page order.

    ``timeout_ms`` is the reference's ``process_pages`` timeout parameter
    (/root/reference/src/api.rs:844-875): a per-page wall-clock budget;
    expired pages surface as status='timeout' rows counted in
    ``n_failed_pages``."""
    cfg = cfg or ExtractConfig()
    if timeout_ms is not None:
        cfg = cfg.with_variable("page_timeout_ms", str(timeout_ms))
    per_page = extract_text(pages, cfg, id_cols=(key, page_col))
    if retry_cfg is not None:
        failed = per_page.filter(F.col("status") != "ok").select(key, page_col)
        retried = extract_text(
            pages.join(failed, [key, page_col], "left_semi"),
            retry_cfg,
            id_cols=(key, page_col),
        )
        per_page = per_page.filter(F.col("status") == "ok").unionByName(retried)
    return per_page.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(page_col, "text"))),
                lambda s: s["text"],
            ),
            PAGE_SEP,
        ).alias("text"),
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_failed_pages"),
        F.round(
            F.sum(F.col("mean_conf") * F.col("n_words"))
            / F.greatest(F.sum("n_words"), F.lit(1))
        )
        .cast("long")
        .alias("mean_conf"),
    )
