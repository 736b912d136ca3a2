"""Sequential adaptive OCR — the reference's in-place adaptation API
expressed in Spark's native idiom for ordered state evolution.

``TessBaseAPIAdaptToWordStr`` (/root/reference/src/api.rs:584-592)
mutates the engine's classifier as pages are processed, so every later
page decodes with state learned from every earlier one — an
order-dependent sequential API with no place inside a deterministic
data-parallel batch pass (SURVEY §7d).  Batch-side we ship the
order-independent re-expression (``operators/adaptive.py``); THIS module
is the faithful sequential analog: a Structured-Streaming stateful
operator (``applyInPandasWithState``) whose per-engine state IS the
evolving classifier.

Semantics per micro-batch (the granularity at which a stream orders
work): first every labeled page in the trigger folds into the glyph
accumulator, then the WHOLE trigger decodes with the updated atlas —
pages that arrive before the first labeled example decode with the
embedded models alone, later pages benefit from everything learned
before them, exactly the reference's adapt-then-recognize lifecycle.
With one page per trigger (``maxFilesPerTrigger=1``) this reproduces the
reference's page-sequential behavior precisely.

Scale shape: state is one glyph accumulator per engine key — bounded by
charset x cell x 8 bytes (~200 KB), the streaming twin of the batch
pass's (char, pos, cnt) partial table; page payloads never enter state.
When every page has arrived, the accumulated state equals
``learn_glyphs`` over the same labeled set (both fold the SAME
commutative per-page accumulation), so the final trigger's decodes match
``ocr_text_adapted`` — asserted in tests, the equivalence idiom every
streaming operator here follows.
"""

from __future__ import annotations

import pickle
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tesseract_rs_spark.config import ExtractConfig

OUTPUT_SCHEMA = (
    "engine string, doc_id long, text string, status string, "
    "mean_conf long, n_words long, adapted_chars long"
)
STATE_SCHEMA = "acc binary"


def stream_adaptive_ocr(
    pages_stream: DataFrame,
    cfg: ExtractConfig | None = None,
    name: str = "stream_adapted",
) -> DataFrame:
    """(engine, doc_id, html, truth?) stream -> per-page decodes with a
    classifier that adapts as labeled pages arrive.  ``truth`` is the
    caller-confirmed word string (the reference API's second argument);
    NULL marks an unlabeled page that only decodes.  ``adapted_chars``
    reports the atlas size in force for that page's decode — 0 until
    the first labeled page, monotone afterwards."""
    cfg = cfg or ExtractConfig()

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from tesseract_rs_spark.kernels.raster import register_atlas
        from tesseract_rs_spark.operators.adaptive import (
            accumulate_page_glyphs,
            atlas_from_acc,
        )
        from tesseract_rs_spark.operators.ocr import raster_batch_results

        (engine,) = key
        # per-key registration name: all engine groups of one query used
        # to share the single ``name`` slot, which was only correct
        # because applyInPandasWithState fully drains one group's
        # generator before the next runs in that worker — interleaving
        # would have decoded one engine's pages with another's atlas
        # (ADVICE r6)
        reg_name = f"{name}:{engine}"
        acc: dict = pickle.loads(bytes(state.get[0])) if state.exists else {}
        # learn-then-decode needs two passes over the trigger's rows, so
        # the micro-batch materializes (pages live in the trigger anyway;
        # only the ~200 KB accumulator persists across triggers)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        for pdf in chunks:
            for payload, truth in zip(pdf["html"], pdf["truth"]):
                if truth is not None and truth == truth:  # non-null
                    accumulate_page_glyphs(acc, payload, truth)
        atlas = atlas_from_acc(acc)
        if atlas:
            register_atlas(reg_name, atlas)  # overwrites this worker's prior
            langs = (*cfg.langs, reg_name)
        else:
            langs = cfg.langs
        for pdf in chunks:
            pdf = pdf.sort_values("doc_id")
            results = raster_batch_results(pdf, cfg, "html", langs=langs)
            yield pd.DataFrame(
                {
                    "engine": [engine] * len(pdf),
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "text": [r.text for r in results],
                    "status": [r.status for r in results],
                    "mean_conf": pd.array(
                        [r.mean_conf for r in results], dtype="int64"
                    ),
                    "n_words": pd.array(
                        [len(r.words) for r in results], dtype="int64"
                    ),
                    "adapted_chars": pd.array(
                        [len(atlas)] * len(pdf), dtype="int64"
                    ),
                }
            )
        state.update((pickle.dumps(acc),))

    return (
        pages_stream.select(
            pages_stream["engine"].cast("string").alias("engine"),
            pages_stream["doc_id"].cast("long").alias("doc_id"),
            "html",
            "truth",
        )
        .groupBy("engine")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
