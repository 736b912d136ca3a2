"""Corpus generator determinism + golden integrity (FIXTURES.md)."""

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.corpus import (
    DECOYS,
    golden_text,
    make_corpus,
    render_html,
    sha256_hex,
)
from tesseract_rs_spark.kernels.html import extract_doc


def test_corpus_deterministic():
    p1, g1 = make_corpus("smoke")
    p2, g2 = make_corpus("smoke")
    assert p1["html"].equals(p2["html"])
    assert g1["sha256"].equals(g2["sha256"])


def test_all_variants_roundtrip():
    text = "one two three four five six seven eight nine ten"
    for variant in range(3):
        html = render_html(text, doc_id=7, variant=variant, para_words=4)
        r = extract_doc(html.encode(), ExtractConfig())
        assert r.text == golden_text(text, para_words=4), f"variant {variant}"


def test_smoke_corpus_byte_identical():
    pages, golden = make_corpus("smoke")
    cfg = ExtractConfig()
    for p, g in zip(pages.itertuples(), golden.itertuples()):
        r = extract_doc(p.html, cfg)
        assert r.status == g.expected_status, p.url
        assert r.text == g.text, p.url
        assert sha256_hex(r.text) == g.sha256, p.url
        for d in DECOYS:
            assert d not in r.text


def test_golden_contract():
    assert golden_text("a b c", para_words=2) == "a b\n\nc\n"
    assert golden_text("") == ""
