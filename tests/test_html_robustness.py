"""Real-world HTML shapes: unclosed tags, tag soup, tables, case
variance, attribute edge cases.  Pins the DOM-heuristic behavior the
north rule cares about — these are the structures Common-Crawl actually
contains."""

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.kernels.html import extract_doc

CFG = ExtractConfig()


def wrap(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode()


def test_unclosed_p_chain():
    # the classic pre-HTML5 idiom: <p> never closed
    html = wrap("<article><p>first paragraph words here<p>second paragraph words here</article>")
    r = extract_doc(html, CFG)
    assert r.text == "first paragraph words here\n\nsecond paragraph words here\n"


def test_table_cells_become_blocks():
    html = wrap(
        "<article><table><tr><td>cell one words here now</td>"
        "<td>cell two words here now</td></tr></table></article>"
    )
    r = extract_doc(html, CFG)
    assert "cell one words here now" in r.text
    assert "cell two words here now" in r.text
    assert r.text.count("\n\n") == 1  # cells are separate blocks


def test_uppercase_tags_and_attrs():
    html = wrap(
        '<ARTICLE><P CLASS="LEAD">upper case tags still work fine</P></ARTICLE>'
        '<NAV><A HREF="/">Home</A></NAV>'
    )
    r = extract_doc(html, CFG)
    assert r.text == "upper case tags still work fine\n"


def test_attr_value_containing_gt():
    # '>' inside a quoted attribute must not end the tag
    html = wrap(
        "<article><p data-x=\"a>b\">quoted attr words here now</p></article>"
    )
    r = extract_doc(html, CFG)
    assert r.text == "quoted attr words here now\n"


def test_misnested_inline_tags():
    html = wrap("<article><p><b>bold <i>both</b> italic</i> tail words here</p></article>")
    r = extract_doc(html, CFG)
    assert r.text == "bold both italic tail words here\n"


def test_definition_list():
    html = wrap(
        "<article><dl><dt>term words here now yes</dt>"
        "<dd>definition words here now yes</dd></dl></article>"
    )
    r = extract_doc(html, CFG)
    assert "term words here now yes" in r.text
    assert "definition words here now yes" in r.text


def test_nested_div_soup_with_content_class():
    html = wrap(
        '<div><div><div class="entry-content"><div>'
        "deeply nested content words survive</div></div></div></div>"
        '<div class="widget-area"><div>widget junk words here now</div></div>'
    )
    r = extract_doc(html, CFG)
    assert "deeply nested content words survive" in r.text
    assert "widget junk" not in r.text


def test_script_with_angle_brackets_in_string():
    html = wrap(
        "<script>if (a < b && c > d) { x = '</div>'; }</script>"
        "<article><p>after tricky script words here</p></article>"
    )
    r = extract_doc(html, CFG)
    assert "after tricky script words here" in r.text


def test_void_hr_between_paragraphs():
    html = wrap(
        "<article><p>before the rule words here</p><hr>"
        "<p>after the rule words here</p></article>"
    )
    r = extract_doc(html, CFG)
    assert r.text == "before the rule words here\n\nafter the rule words here\n"


def test_blockquote_and_pre_kept_in_article():
    html = wrap(
        "<article><p>intro paragraph words here now</p>"
        "<blockquote>quoted words here now yes</blockquote></article>"
    )
    r = extract_doc(html, CFG)
    assert "quoted words here now yes" in r.text


def test_duplicate_negative_and_positive_class():
    # negative signal wins when both appear on the same element
    html = wrap(
        '<div class="content sidebar">ambiguous classed words here now</div>'
        "<article><p>clean article words here now</p></article>"
    )
    r = extract_doc(html, CFG)
    assert "ambiguous" not in r.text
    assert "clean article words here now" in r.text


def test_entities_in_attributes_do_not_leak():
    html = wrap(
        '<article><p title="&quot;decoy&quot;">attribute entity words here</p></article>'
    )
    r = extract_doc(html, CFG)
    assert r.text == "attribute entity words here\n"
