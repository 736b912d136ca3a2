"""Distributed extraction operators — fused mapInPandas stages.

The reference runs decode -> threshold -> segment -> recognize -> assemble
inside one ``recognize`` call (/root/reference/src/api.rs:287-298); we fuse
decode -> segment -> classify -> assemble inside ONE ``mapInPandas``
generator so intermediate page structures never cross the Arrow boundary
or shuffle (SURVEY.md §4.2 "Pipelining").

Error model: a corrupt page yields a ``status != 'ok'`` row with failure
spans — the job never dies on one bad document
(/root/reference/src/error.rs:6-41, SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.kernels.html import extract_doc, word_columns

TEXT_RESULT_FIELDS = (
    "text string, status string, n_blocks long, n_words long, "
    "mean_conf long, n_chars long"
)
FULL_RESULT_FIELDS = (
    TEXT_RESULT_FIELDS + ", failure_spans array<struct<start: long, end: long>>"
)
WORD_RESULT_FIELDS = (
    "block_id long, para_id long, line_id long, word_id long, "
    "word string, conf double, span_start long, span_end long"
)


def _id_schema(pages: DataFrame, id_cols: Sequence[str]) -> str:
    by_name = {f.name: f for f in pages.schema.fields}
    return ", ".join(f"{c} {by_name[c].dataType.simpleString()}" for c in id_cols)


def extract_text_batch(
    pdf: pd.DataFrame, cfg: ExtractConfig, id_cols: Sequence[str], spans: bool = False
) -> pd.DataFrame:
    """Extract one Arrow batch -> one result row per page."""
    results = [extract_doc(h, cfg) for h in pdf["html"].to_numpy()]
    out = {c: pdf[c].to_numpy() for c in id_cols}
    out["text"] = [r.text for r in results]
    out["status"] = [r.status for r in results]
    out["n_blocks"] = pd.array([r.n_blocks_kept for r in results], dtype="int64")
    out["n_words"] = pd.array([r.n_words for r in results], dtype="int64")
    out["mean_conf"] = pd.array([r.mean_conf for r in results], dtype="int64")
    out["n_chars"] = pd.array([r.n_chars for r in results], dtype="int64")
    if spans:
        out["failure_spans"] = [
            [{"start": s, "end": e} for (s, e) in r.failure_spans]
            for r in results
        ]
    return pd.DataFrame(out)


def extract_words_batch(
    pdf: pd.DataFrame, cfg: ExtractConfig, id_cols: Sequence[str]
) -> pd.DataFrame:
    """Extract one batch -> exploded word-level rows (ResultIterator analog,
    /root/reference/src/result_iterator.rs:41-71).  Vectorized explode: the
    kernel returns columnar arrays per doc, id columns are ``np.repeat``
    over per-doc counts, and each output column is ONE ``np.concatenate`` —
    no itertuples, no per-word appends."""
    per_doc = [word_columns(extract_doc(h, cfg)) for h in pdf["html"].to_numpy()]
    counts = np.fromiter((len(p[0]) for p in per_doc), dtype=np.int64, count=len(per_doc))
    out: dict = {c: np.repeat(pdf[c].to_numpy(), counts) for c in id_cols}
    words: list = []
    for p in per_doc:
        words.extend(p[0])
    names = ("block_id", "para_id", "line_id", "word_id", "conf",
             "span_start", "span_end")
    for i, name in enumerate(names, start=1):
        out[name] = np.concatenate([p[i] for p in per_doc]) if per_doc else []
    out["word"] = words
    order = list(id_cols) + [
        "block_id", "para_id", "line_id", "word_id", "word", "conf",
        "span_start", "span_end",
    ]
    return pd.DataFrame(out)[order]


def extract_text(
    pages: DataFrame,
    cfg: ExtractConfig | None = None,
    id_cols: Sequence[str] = ("url",),
    spans: bool = False,
    monitor=None,
) -> DataFrame:
    """pages -> (id_cols..., text, status, n_blocks, n_words, mean_conf,
    n_chars[, failure_spans]) in ONE fused vectorized stage.

    ``monitor`` (a :class:`tesseract_rs_spark.monitor.ProgressMonitor`)
    receives one accumulator add per Arrow batch — the TessMonitor
    progress channel; the deadline channel is ``cfg.page_timeout_ms``."""
    cfg = cfg or ExtractConfig()
    schema = _id_schema(pages, id_cols) + ", " + (
        FULL_RESULT_FIELDS if spans else TEXT_RESULT_FIELDS
    )
    id_cols = tuple(id_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield extract_text_batch(pdf, cfg, id_cols, spans=spans)
                if monitor is not None:
                    monitor.add_batch(len(pdf))

    return pages.select(*id_cols, "html").mapInPandas(gen, schema=schema)


def extract_words(
    pages: DataFrame,
    cfg: ExtractConfig | None = None,
    id_cols: Sequence[str] = ("url",),
) -> DataFrame:
    """pages -> exploded word table (id_cols..., block_id, para_id, line_id,
    word_id, word, conf) in one vectorized stage.  Reading order is encoded
    in the id columns, not in row order (SURVEY.md §3.2)."""
    cfg = cfg or ExtractConfig()
    schema = _id_schema(pages, id_cols) + ", " + WORD_RESULT_FIELDS
    id_cols = tuple(id_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield extract_words_batch(pdf, cfg, id_cols)

    return pages.select(*id_cols, "html").mapInPandas(gen, schema=schema)
