"""Unit tests for the extraction kernel — the reference's per-method API
test altitude (/root/reference/tests/test_api.rs, SURVEY.md §5.2)."""

import pytest

from tesseract_rs_spark.config import (
    MODE_AUTO,
    MODE_RAW,
    MODE_SINGLE_BLOCK,
    ExtractConfig,
    mode_from_int,
)
from tesseract_rs_spark.kernels.html import (
    STATUS_EMPTY,
    STATUS_NOT_HTML,
    STATUS_OK,
    STATUS_UTF8,
    extract_doc,
    word_rows,
)

CFG = ExtractConfig()


def wrap(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode()


class TestErrorModel:
    """Error rows, never exceptions (reference error model,
    /root/reference/src/error.rs:6-41, tests/test_e2e.rs:262-289)."""

    def test_empty_input(self):
        r = extract_doc(b"", CFG)
        assert r.status == STATUS_EMPTY and r.text == ""

    def test_none_input(self):
        assert extract_doc(None, CFG).status == STATUS_EMPTY

    def test_invalid_utf8(self):
        r = extract_doc(b"<p>ab\xc3\x28cd</p>", CFG)
        assert r.status == STATUS_UTF8
        assert r.failure_spans and r.failure_spans[0][0] >= 0

    def test_not_html(self):
        r = extract_doc(b"just plain words no markup", CFG)
        assert r.status == STATUS_NOT_HTML and r.text == ""

    def test_usable_after_error(self):
        # API stays usable after errors (tests/test_e2e.rs:262-289)
        extract_doc(b"\xff\xfe", CFG)
        r = extract_doc(wrap("<p>one two three four five six</p>"), CFG)
        assert r.status == STATUS_OK and "one two" in r.text


class TestAssembly:
    """The byte-identical assembly contract (SURVEY.md §2.4)."""

    def test_words_lines_blocks(self):
        html = wrap(
            "<article><p>alpha beta gamma delta epsilon</p>"
            "<p>first line words here now<br>second line words here now</p></article>"
        )
        r = extract_doc(html, CFG)
        assert r.text == (
            "alpha beta gamma delta epsilon\n\n"
            "first line words here now\nsecond line words here now\n"
        )

    def test_trailing_newline_only_when_nonempty(self):
        assert extract_doc(wrap(""), CFG).text == ""

    def test_whitespace_collapse(self):
        html = wrap("<article><p>a   b\t\tc\n\nd e f</p></article>")
        assert extract_doc(html, CFG).text == "a b c d e f\n"

    def test_entity_unescape(self):
        html = wrap("<article><p>fish &amp; chips &lt;tag&gt; caf&eacute; ok</p></article>")
        assert extract_doc(html, CFG).text == "fish & chips <tag> café ok\n"

    def test_inline_tags_do_not_split_words(self):
        html = wrap("<article><p>hel<b>lo</b> wor<i>ld</i> again three more</p></article>")
        assert extract_doc(html, CFG).text == "hello world again three more\n"

    def test_determinism(self):
        html = wrap("<article><p>one two three four five</p></article>")
        assert extract_doc(html, CFG).text == extract_doc(html, CFG).text


class TestBoilerplate:
    def test_nav_header_footer_aside_dropped(self):
        html = wrap(
            '<header><h1>Site</h1></header><nav><a href="/">Home</a> <a href="/x">X</a></nav>'
            "<article><p>real content words go here today</p></article>"
            '<aside>ad words</aside><footer>copyright words</footer>'
        )
        r = extract_doc(html, CFG)
        assert r.text == "real content words go here today\n"

    def test_negative_class_dropped(self):
        html = wrap(
            '<div class="cookie-banner">We use cookies accept now please</div>'
            "<article><p>real content words go here today</p></article>"
        )
        assert extract_doc(html, CFG).text == "real content words go here today\n"

    def test_positive_class_kept(self):
        html = wrap('<div class="post-body">short text</div>')
        assert extract_doc(html, CFG).text == "short text\n"

    def test_link_density_drop(self):
        links = " ".join(f'<a href="/{i}">link number {i} here</a>' for i in range(8))
        html = wrap(f"<div>{links}</div><div>plain prose with many genuine words</div>")
        r = extract_doc(html, CFG)
        assert r.text == "plain prose with many genuine words\n"

    def test_script_style_comment_never_leak(self):
        html = wrap(
            "<script>var x = 'LEAK1';</script><style>.a{content:'LEAK2'}</style>"
            "<!-- LEAK3 --><article><p>visible words one two three</p></article>"
        )
        r = extract_doc(html, CFG)
        for leak in ("LEAK1", "LEAK2", "LEAK3"):
            assert leak not in r.text

    def test_heading_kept_before_content(self):
        html = wrap(
            "<h2>Title Words</h2><p>body content words go here today fine</p>"
        )
        r = extract_doc(html, CFG)
        assert r.text.startswith("Title Words\n\n")

    def test_failure_spans_cover_dropped_blocks(self):
        html = wrap(
            '<nav><a href="/">Home Page Link</a></nav>'
            "<article><p>content words here one two three</p></article>"
        )
        r = extract_doc(html, CFG)
        assert r.failure_spans, "dropped nav must produce a failure span"
        s, e = r.failure_spans[0]
        assert 0 <= s < e


class TestConfigSurface:
    """set_variable / PSM / ROI analogs (SURVEY.md §2.2)."""

    def test_whitelist(self):
        # tessedit_char_whitelist analog (tests/integration_test.rs:129-130)
        cfg = ExtractConfig().with_variable("tessedit_char_whitelist", "0123456789 ")
        html = wrap("<article><p>call 555 0123 now or 911 today</p></article>")
        r = extract_doc(html, cfg)
        assert set(r.text) <= set("0123456789 \n")
        assert "555 0123 911" in r.text

    def test_blacklist(self):
        cfg = ExtractConfig().with_variable("tessedit_char_blacklist", "aeiou")
        html = wrap("<article><p>banana split yes ok go</p></article>")
        r = extract_doc(html, cfg)
        assert "a" not in r.text and "bnn" in r.text

    def test_preserve_interword_spaces(self):
        cfg = ExtractConfig().with_variable("preserve_interword_spaces", "1")
        html = wrap("<article><p>col1   col2   col3</p></article>")
        assert "col1   col2   col3" in extract_doc(html, cfg).text

    def test_variable_roundtrip_and_unknown_errors(self):
        cfg = ExtractConfig().with_variable("custom_knob", "42")
        assert cfg.get_variable("custom_knob") == "42"
        with pytest.raises(KeyError):
            cfg.get_variable("nonexistent_variable")  # tests/test_api.rs:1083

    def test_mode_default_on_invalid(self):
        # out-of-range PSM decodes to AUTO (enums.rs:23-42)
        assert mode_from_int(99) == MODE_AUTO
        assert mode_from_int(MODE_RAW) == MODE_RAW

    def test_single_block_mode_keeps_boilerplate(self):
        cfg = ExtractConfig(mode=MODE_SINGLE_BLOCK)
        html = wrap('<nav><a href="/">HomeLink</a></nav><p>words</p>')
        r = extract_doc(html, cfg)
        assert "HomeLink" in r.text and "words" in r.text
        assert r.n_blocks_kept == 1

    def test_roi(self):
        # set_rectangle analog (/root/reference/src/api.rs:1289-1296)
        html = b"<p>first part words</p><p>second part words</p>"
        cut = html.index(b"<p>second")
        cfg = ExtractConfig(mode=MODE_SINGLE_BLOCK, roi_start=cut)
        r = extract_doc(html, cfg)
        assert "second part words" in r.text and "first" not in r.text


class TestHierarchy:
    """Iterator-behavior altitude (/root/reference/tests/test_iterators.rs)."""

    def test_word_rows_reading_order(self):
        html = wrap(
            "<article><p>aa bb<br>cc</p><p>dd</p></article>"
        )
        r = extract_doc(html, CFG)
        rows = word_rows(r)
        assert [(b, l, w, t) for b, _, l, w, t, *_ in rows] == [
            (0, 0, 0, "aa"),
            (0, 0, 1, "bb"),
            (0, 1, 0, "cc"),
            (1, 0, 0, "dd"),
        ]

    def test_confidences_in_domain(self):
        # all confidences in [0,100] (tests/test_api.rs:221-238)
        html = wrap("<article><p>some words here for conf</p></article>")
        r = extract_doc(html, CFG)
        for _b, _p, _l, _w, _word, conf, s, e in word_rows(r):
            assert 0.0 <= conf <= 100.0
            assert 0 <= s < e  # span invariant (bbox l<r analog,
            # tests/test_iterators.rs:179-193)
        assert 0 <= r.mean_conf <= 100


def test_word_columns_matches_word_rows():
    """The vectorized columnar explode must agree with the row explode."""
    import numpy as np

    from tesseract_rs_spark.corpus import render_html
    from tesseract_rs_spark.kernels.html import word_columns

    r = extract_doc(render_html("alpha beta gamma " * 30, 7, "en").encode(), ExtractConfig())
    rows = word_rows(r)
    words, block, para, line, wid, conf, s, e = word_columns(r)
    assert words == [x[4] for x in rows]
    assert block.tolist() == [x[0] for x in rows]
    assert para.tolist() == [x[1] for x in rows]
    assert line.tolist() == [x[2] for x in rows]
    assert wid.tolist() == [x[3] for x in rows]
    assert np.allclose(conf, [x[5] for x in rows])
    assert s.tolist() == [x[6] for x in rows]
    assert e.tolist() == [x[7] for x in rows]
    # empty doc -> empty arrays, no crash
    empty = extract_doc(b"<html><body></body></html>", ExtractConfig())
    w2, *cols2 = word_columns(empty)
    assert w2 == [] and all(len(c) == 0 for c in cols2)
