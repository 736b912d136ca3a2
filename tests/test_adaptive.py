"""adapt_to_word_str re-expressed (operators/adaptive.py): learn glyph
templates from labeled pages by distributed majority vote, then decode an
unknown font exactly — the deterministic, order-independent form of the
reference's in-place classifier adaptation
(/root/reference/src/api.rs:584-592)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.kernels.raster import (
    ATLAS_TUR,
    extract_raster_doc,
    golden_raster_text,
    register_atlas,
    render_page,
)
from tesseract_rs_spark.operators.adaptive import learn_glyphs, ocr_text_adapted

# every word rendered with the tur atlas = an "unknown font" for an
# eng-only decoder; the charset coverage below spans all test glyphs
_TEXTS = [
    "abc def ghi jkl mno pqr stu vwx",
    "yzb cde fgh ijk lmn opq rst uvw",
    "bad cab fed hig key lot mix new",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (f"u{i}", bytearray(render_page(t, tur_every=1)), t)
        for i, t in enumerate(_TEXTS)
    ]
    return spark.createDataFrame(
        rows, "url string, html binary, truth string"
    ).repartition(3)


def test_learned_templates_match_the_true_font(labeled):
    """Majority vote over labeled examples recovers the rendering atlas
    BIT-EXACTLY for every character that appears in the labels."""
    atlas = learn_glyphs(labeled)
    seen = {ch for t in _TEXTS for ch in t if ch != " "}
    assert set(atlas) == seen
    for ch in seen:
        assert np.array_equal(atlas[ch], ATLAS_TUR[ch]), ch


def test_learning_is_partition_order_independent(labeled):
    """The aggregation is commutative: a different partitioning yields
    the identical atlas (the property the reference's in-place
    adaptation cannot have)."""
    a1 = learn_glyphs(labeled.repartition(1))
    a2 = learn_glyphs(labeled.repartition(7))
    assert set(a1) == set(a2)
    assert all(np.array_equal(a1[c], a2[c]) for c in a1)


def test_adapted_decode_recovers_unknown_font(spark, labeled):
    """Before adaptation the eng-only decode cannot reach conf 100 on the
    unknown font (every glyph is >= 48 Hamming from every eng template);
    with the learned atlas registered, the joint-language vote decodes
    the held-out page byte-exactly at conf 100."""
    heldout = "fox jug zip quw bem dyn"
    page = render_page(heldout, tur_every=1)
    base = extract_raster_doc(page)  # eng only
    assert base.mean_conf < 100
    atlas = learn_glyphs(labeled)
    # the held-out page only uses chars covered by the training labels?
    # no — it deliberately includes every char it needs via _TEXTS
    # coverage; chars outside the learned set would fall back to eng
    test_df = spark.createDataFrame(
        [("held", bytearray(page))], "url string, html binary"
    )
    out = ocr_text_adapted(test_df, atlas, ExtractConfig()).collect()[0]
    assert out["status"] == "ok"
    assert out["mean_conf"] == 100
    assert out["text"] == golden_raster_text(heldout)


def test_register_atlas_validates(spark):
    with pytest.raises(ValueError, match="not in the charset"):
        register_atlas("bad", {"@": np.zeros((24, 16), dtype=bool)})
    with pytest.raises(ValueError, match="shape"):
        register_atlas("bad", {"a": np.zeros((3, 3), dtype=bool)})
    # embedded models are protected: overwriting "eng" in a reused
    # worker would corrupt later plain decodes (review r5)
    with pytest.raises(ValueError, match="embedded"):
        register_atlas("eng", {"a": np.zeros((24, 16), dtype=bool)})


class TestStreamingSequentialAdaptation:
    """The sequential in-place adaptation API (adapt_to_word_str,
    api.rs:584-592) as a stateful stream (streaming/adaptive.py): pages
    arriving BEFORE any labeled example decode with the embedded models;
    pages after adaptation decode with everything learned so far; the
    final state equals the batch operator's atlas."""

    def test_order_dependence_and_batch_equivalence(self, spark, tmp_path):
        import os
        import time

        from tesseract_rs_spark.streaming.adaptive import stream_adaptive_ocr
        from tesseract_rs_spark.kernels.raster import golden_raster_text

        heldout = "fox jug zip quw bem dyn"
        held_page = bytearray(render_page(heldout, tur_every=1))
        schema = "engine string, doc_id long, html binary, truth string"
        in_dir = tmp_path / "in"
        # trigger 1: the held-out page arrives UNLABELED, pre-adaptation
        spark.createDataFrame(
            [("e1", 0, held_page, None)], schema
        ).coalesce(1).write.parquet(str(in_dir / "f=0"))
        # trigger 2: the labeled corpus + the same page again
        rows = [
            ("e1", 10 + i, bytearray(render_page(t, tur_every=1)), t)
            for i, t in enumerate(_TEXTS)
        ] + [("e1", 99, held_page, None)]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(in_dir / "f=1")
        )
        # pin trigger order by file mtime (FileStreamSource sorts on it)
        now = time.time()
        for sub, ts in (("f=0", now - 100), ("f=1", now)):
            for f in (in_dir / sub).iterdir():
                os.utime(f, (ts, ts))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(in_dir) + "/*")
        )
        q = (
            stream_adaptive_ocr(stream)
            .writeStream.format("memory")
            .queryName("adapt_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["doc_id"]: r
            for r in spark.sql("SELECT * FROM adapt_stream").collect()
        }
        assert set(got) == {0, 10, 11, 12, 99}
        golden = golden_raster_text(heldout)
        # pre-adaptation: embedded models only — no atlas, imperfect conf
        assert got[0]["adapted_chars"] == 0
        assert got[0]["mean_conf"] < 100
        # post-adaptation: the SAME page decodes exactly at conf 100
        seen = {ch for t in _TEXTS for ch in t if ch != " "}
        assert got[99]["adapted_chars"] == len(seen)
        assert got[99]["mean_conf"] == 100
        assert got[99]["text"] == golden
        # the labeled pages themselves decode adapted in their trigger
        for i, t in enumerate(_TEXTS):
            assert got[10 + i]["mean_conf"] == 100
            assert got[10 + i]["text"] == golden_raster_text(t)
        # batch equivalence: the stream's final decode == ocr_text_adapted
        # with learn_glyphs over the same labeled set
        labeled_df = spark.createDataFrame(
            [
                (f"u{i}", bytearray(render_page(t, tur_every=1)), t)
                for i, t in enumerate(_TEXTS)
            ],
            "url string, html binary, truth string",
        )
        batch = ocr_text_adapted(
            spark.createDataFrame(
                [("held", held_page)], "url string, html binary"
            ),
            learn_glyphs(labeled_df),
            ExtractConfig(),
        ).collect()[0]
        assert (batch["text"], batch["mean_conf"]) == (
            got[99]["text"],
            got[99]["mean_conf"],
        )
