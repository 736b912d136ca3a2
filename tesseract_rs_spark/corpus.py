"""Deterministic synthetic page corpus (FIXTURES.md).

Mirrors the reference's fixture idiom — render known content, assert the
pipeline recovers exactly that content (the "draw a 9, expect 9" pattern:
/root/reference/README.md:231-263, tests/integration_test.rs:445-513) —
scaled up to Common-Crawl-style HTML pages.

``render_html(text, doc_id, ...)`` wraps source text in a full page with
realistic boilerplate (nav, header, cookie banner, sidebar ads, footer,
script/style/comment decoys).  ``golden_text(text, ...)`` computes, by
construction, the byte-exact text the extraction kernel must produce.
Everything is seeded and pure — running twice yields identical bytes.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
DEFAULT_PARA_WORDS = 25
N_VARIANTS = 3

# Decoy strings that must NEVER leak into extracted text (asserted in tests).
DECOYS = ("SCRIPTDECOY", "STYLEDECOY", "COMMENTDECOY", "TEMPLATEDECOY")

_VOCAB = (
    "data spark table query join merge scan filter window batch stream row "
    "column value key hash sort group agg part order line text page word "
    "block vector fast slow big small the a customer supplier index cache "
    "shuffle broadcast partition skew salt plan stage task executor driver"
).split()


def paras_from_text(text: str, para_words: int = DEFAULT_PARA_WORDS) -> list:
    """Chunk single-line space-separated text into paragraphs of
    ``para_words`` words (the renderer's layout rule; also the golden's)."""
    words = text.split(" ")
    return [
        " ".join(words[i : i + para_words]) for i in range(0, len(words), para_words)
    ]


def golden_text(text: str, para_words: int = DEFAULT_PARA_WORDS) -> str:
    """Expected extracted text by construction: paragraphs joined '\\n\\n',
    trailing '\\n' (assembly contract, SURVEY.md §2.4)."""
    paras = paras_from_text(text, para_words)
    return "\n\n".join(paras) + "\n" if text else ""


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def page_url(doc_id: int, lang: str) -> str:
    return f"https://example.org/{lang}/{doc_id:06d}"


def page_ts(doc_id: int) -> datetime:
    return EPOCH + timedelta(hours=int(doc_id))


_HEAD = (
    '<!DOCTYPE html>\n<html lang="{lang}">\n<head>\n<meta charset="utf-8">\n'
    "<title>Example Site page {doc_id}</title>\n"
    "<style>body{{font:16px serif;margin:0}} .x{{color:#333}} /* STYLEDECOY */</style>\n"
    '<script type="text/javascript">var decoy="SCRIPTDECOY"; if (1<2) {{ console.log(decoy); }}</script>\n'
    "</head>\n<body>\n"
    '<header class="site-header"><h1><a href="/">Example Site</a></h1>'
    '<form action="/search"><input name="q"><button>Search</button></form></header>\n'
    '<nav class="main-nav"><ul><li><a href="/home">Home</a></li>'
    '<li><a href="/news">News</a></li><li><a href="/archive">Archive</a></li>'
    '<li><a href="/about">About</a></li><li><a href="/contact">Contact</a></li></ul></nav>\n'
    '<div class="cookie-banner">We use cookies to improve your experience '
    '<a href="/privacy">Learn more</a> <a href="#">Accept</a></div>\n'
    "<!-- COMMENTDECOY rendered {doc_id} -->\n"
)

_TAIL = (
    '<aside class="sidebar"><h3>Sponsored</h3><ul>'
    '<li><a href="/ad1">Buy now great deals today</a></li>'
    '<li><a href="/ad2">Subscribe to our newsletter now</a></li>'
    '<li><a href="/ad3">Hot singles in your area</a></li></ul></aside>\n'
    '<template><p>TEMPLATEDECOY hidden content</p></template>\n'
    "<footer><p>&copy; 2026 Example Site &middot; <a href=\"/terms\">Terms</a> "
    '&middot; <a href="/contact">Contact</a></p></footer>\n</body>\n</html>\n'
)


def head_template_len() -> int:
    """Character length of ``_HEAD`` with empty lang/doc_id — the span-oracle
    constant: full head length = this + len(lang) + 2*len(str(doc_id))
    (``{doc_id}`` appears twice: title + comment)."""
    return len(_HEAD.format(lang="", doc_id=""))


VARIANT_PREFIX_LEN = (
    len("<main>\n<article>\n"),
    len('<div class="post-body">\n'),
    0,
)


def render_html(
    text: str,
    doc_id: int,
    lang: str = "en",
    para_words: int = DEFAULT_PARA_WORDS,
    variant: int | None = None,
) -> str:
    """Render source text into a boilerplate-wrapped HTML page.

    Variants exercise different main-content markers the classifier must
    handle: 0 = semantic ``<main><article>``, 1 = ``<div class="post-body">``
    (positive class signal), 2 = bare body-level ``<p>`` runs (densitometric
    rule only).  The extracted text is identical across variants.
    """
    if variant is None:
        variant = doc_id % N_VARIANTS
    paras = ["<p>" + _htmllib.escape(p) + "</p>" for p in paras_from_text(text, para_words)]
    body = "\n".join(paras)
    if variant == 0:
        content = "<main>\n<article>\n" + body + "\n</article>\n</main>"
    elif variant == 1:
        content = '<div class="post-body">\n' + body + "\n</div>"
    else:
        content = body
    return (
        _HEAD.format(lang=lang, doc_id=doc_id) + content + "\n" + _TAIL
    )


# ---------------------------------------------------------------------------
# pytest corpus (independent of /root/testdata)
# ---------------------------------------------------------------------------

TIER_SIZES = {"smoke": 64, "correctness": 2000, "bench": 20000}


def _gen_text(rng: np.random.RandomState, n_words: int) -> str:
    idx = rng.randint(0, len(_VOCAB), size=n_words)
    return " ".join(_VOCAB[i] for i in idx)


def make_corpus(tier: str = "smoke", seed: int = 42):
    """Build (pages, golden) pandas DataFrames for a tier (FIXTURES.md §4).

    pages: (url, warc_ts, html:bytes, text, lang); golden adds
    (text, sha256, expected_status).  Fixture classes: normal pages across
    all template variants, oversized-document tail (skew tests), and
    corrupt rows (invalid UTF-8 / empty / non-HTML / boilerplate-only)
    that must yield error-status rows, never job failures
    (reference error-path tests: tests/integration_test.rs:151-235).
    """
    n = TIER_SIZES[tier] if isinstance(tier, str) else int(tier)
    rng = np.random.RandomState(seed)
    langs = ["en", "de", "fr", "es", "tr"]
    pages, golden = [], []
    for doc_id in range(n):
        lang = langs[int(rng.randint(0, len(langs)))]
        url = page_url(doc_id, lang)
        ts = page_ts(doc_id)
        kind = doc_id % 16
        if kind == 13 and doc_id > 0:  # corrupt: invalid utf-8
            html_bytes = b"\xff\xfe<html><p>broken" + bytes([0xC3, 0x28])
            text, gold, status = "", "", "utf8_error"
        elif kind == 14 and doc_id > 0:  # corrupt: empty payload
            html_bytes, text, gold, status = b"", "", "", "empty_input"
        elif kind == 15 and doc_id > 0:  # corrupt: not html
            text = _gen_text(rng, 12)
            html_bytes = text.encode("utf-8")
            gold, status = "", "not_html"
        else:
            n_words = int(rng.randint(30, 120))
            if doc_id % 29 == 7:  # oversized tail: 8-32x median (skew fixture)
                n_words *= int(rng.choice([8, 16, 32]))
            text = _gen_text(rng, n_words)
            if doc_id % 11 == 3:  # boilerplate-only page -> empty extraction
                html_bytes = render_html("", doc_id, lang).replace(
                    "<p></p>", ""
                ).encode("utf-8")
                text, gold, status = "", "", "ok"
            else:
                html_bytes = render_html(text, doc_id, lang).encode("utf-8")
                gold, status = golden_text(text), "ok"
        pages.append((url, ts, html_bytes, text, lang))
        golden.append((url, gold, sha256_hex(gold), status))
    pages_df = pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"])
    golden_df = pd.DataFrame(
        golden, columns=["url", "text", "sha256", "expected_status"]
    )
    return pages_df, golden_df
