"""Main-content extraction tests: DOM boilerplate heuristics (jusText /
Readability-family, functions/html.py) + PDF layout parse round-trip
(functions/pdf_parse.py inverse of sinks.build_pdf_page)."""

from tesseract_spark.functions.html import (
    boilerplate_stats,
    dom_blocks,
    strip_boilerplate,
)
from tesseract_spark.functions.pdf_parse import extract_pdf_text, extract_pdf_words
from tesseract_spark.operators.sinks import build_pdf_page

ARTICLE = """<html><head><title>T</title><style>p{color:red}</style>
<script>var x=1;</script></head><body>
<header><h1>Site Name</h1></header>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Contact</a></nav>
<article><p>First real paragraph with enough text to count as content.</p>
<p>Second paragraph of the article body, also long enough to keep.</p>
<ul><li><a href="/l1">link one</a></li><li><a href="/l2">link two</a></li></ul>
</article>
<aside>Related <a href="/r">stories</a></aside>
<footer>&copy; 2026 Example</footer></body></html>"""


def test_strip_keeps_article_drops_chrome():
    out = strip_boilerplate(ARTICLE)
    assert "First real paragraph" in out and "Second paragraph" in out
    for chrome in ("Home", "About", "Site Name", "Related", "Example", "var x"):
        assert chrome not in out


def test_link_dense_list_inside_article_dropped():
    # the <ul> of links is inside <article> but 100% link density
    out = strip_boilerplate(ARTICLE)
    assert "link one" not in out


def test_script_style_contents_never_leak():
    html = "<body><p>Long enough content paragraph to keep here.</p>" \
           "<script>secret()</script><style>.x{}</style></body>"
    out = strip_boilerplate(html)
    assert "secret" not in out and ".x" not in out


def test_entity_decoding_and_whitespace_normalization():
    html = "<main><p>a &amp; b\n   c&nbsp;d and some more padding text</p></main>"
    out = strip_boilerplate(html)
    assert "a & b c" in out and "\n " not in out


def test_short_block_kept_only_in_semantic_container():
    assert strip_boilerplate("<main><p>tiny</p></main>") == "tiny"
    assert strip_boilerplate("<div>tiny</div>") == ""


def test_stats_account_all_blocks():
    content, boiler, n = boilerplate_stats(ARTICLE)
    blocks = dom_blocks(ARTICLE)
    assert n == len(blocks)
    assert content + boiler == sum(len(b.text) for b in blocks)
    assert content > 0 and boiler > 0


def _wrec(text, left, top, block=1, line=1, word=1):
    return dict(doc_id="d", media_ref="m", block_num=block, par_num=1,
                line_num=line, word_num=word, left=left, top=top,
                width=8 * len(text), height=16, conf=90.0, text=text)


def test_pdf_roundtrip_reading_order():
    words = [
        _wrec("second", 10, 60, block=2),
        _wrec("hello", 10, 20, word=1),
        _wrec("world", 80, 20, word=2),
    ]
    blob = build_pdf_page(words, 300, 120, 300)
    assert extract_pdf_text(blob) == "hello world\nsecond"


def test_pdf_roundtrip_escapes_and_positions():
    words = [_wrec("café (x)\\", 12, 30)]
    blob = build_pdf_page(words, 200, 100, 300)
    got = extract_pdf_words(blob)
    assert len(got) == 1
    x, _y, t = got[0]
    assert t == "café (x)\\"
    assert abs(x - 12 * 72 / 300) < 0.02  # px->pt placement preserved


def test_pdf_roundtrip_non_latin_scripts():
    """CID text layer (Identity-H + identity ToUnicode, pdfrenderer.cpp:
    503-690) must round-trip ANY script — the Helvetica/WinAnsi layer the
    sink used to write could not encode these at all."""
    words = [
        _wrec("שלום", 10, 20, word=1),          # Hebrew
        _wrec("עולם", 60, 20, word=2),
        _wrec("नमस्ते", 10, 60, block=2),         # Devanagari (w/ combining)
        _wrec("你好世界", 10, 100, block=3),      # CJK
        _wrec("\U0001d49c\U0001f600", 10, 140, block=4),  # supplementary
    ]
    blob = build_pdf_page(words, 400, 200, 300)
    assert extract_pdf_text(blob) == (
        "שלום עולם\nनमस्ते\n你好世界\n\U0001d49c\U0001f600"
    )
    # surrogate-pair codepoints still count once for the Tz stretch
    # (pdf_word_len, pdfrenderer.cpp:470-475)
    from tesseract_spark.operators.sinks import _word_to_utf16be_hex

    hexstr, n = _word_to_utf16be_hex("\U0001d49c\U0001f600")
    assert n == 2 and len(hexstr) == 16


def test_pdf_glyphless_font_wellformed():
    """The embedded TrueType program: sfnt header, required tables, and
    the whole-file checksum invariant (head.checkSumAdjustment makes the
    file sum to 0xB1B0AFBA per the OpenType spec)."""
    import struct

    from tesseract_spark.functions.glyphless_font import (
        GLYPHLESS_FONT as f,
        _checksum,
    )

    assert f[:4] == b"\x00\x01\x00\x00"
    num_tables = struct.unpack(">H", f[4:6])[0]
    tags = [f[12 + 16 * i : 16 + 16 * i] for i in range(num_tables)]
    for required in (b"glyf", b"head", b"hhea", b"hmtx", b"loca", b"maxp"):
        assert required in tags
    assert tags == sorted(tags)  # directory must be tag-sorted
    assert _checksum(f) == 0xB1B0AFBA


def test_pdf_parse_rejects_non_pdf():
    import pytest

    with pytest.raises(ValueError):
        extract_pdf_words(b"not a pdf")


# ---------------------------------------------------------------------------
# jusText two-pass (Pomikálek 2011) — every classification branch
# ---------------------------------------------------------------------------

EN_STOP = frozenset(
    "the a of and to in is on for it was as with his her they".split()
)
# stopword-rich filler: sd well above 0.32
GOOD_SENT = (
    "it was the best of the times and it was the worst of the times "
    "for they were all in it together and the end of it was near "
    "and the story goes on and on as it was told in the old days "
    "and they kept it alive for the rest of the winter in the town"
)
LOW_SENT = (
    "quantum chromodynamics lattice simulation requires careful "
    "renormalization procedures across gauge field configurations "
    "spanning multiple coupling regimes during thermalization sweeps"
)


def _jt(html):
    from tesseract_spark.functions.html import justext_blocks

    return justext_blocks(html, EN_STOP)


def test_justext_ctx_free_classes():
    from tesseract_spark.functions.html import justext_classify, dom_blocks

    html = (
        f"<p><a href='/'>all of this text lives entirely inside a link "
        f"element here</a></p>"
        f"<p>© 2024 somebody</p>"
        f"<p>short note</p>"
        f"<p>{GOOD_SENT}</p>"
        f"<p>{GOOD_SENT[:150]}</p>"
        f"<p>{LOW_SENT}</p>"
    )
    cls = [justext_classify(b, EN_STOP) for b in dom_blocks(html)]
    assert cls == ["bad", "bad", "short", "good", "neargood", "bad"]


def test_justext_short_promoted_between_goods():
    html = f"<p>{GOOD_SENT}</p><p>figure 1</p><p>{GOOD_SENT}</p>"
    final = [f for _t, _c, f in _jt(html)]
    assert final == ["good", "good", "good"]


def test_justext_short_between_bads_dies():
    html = f"<p>{LOW_SENT}</p><p>figure 1</p><p>{LOW_SENT}</p>"
    final = [f for _t, _c, f in _jt(html)]
    assert final == ["bad", "bad", "bad"]


def test_justext_neargood_rescue_chain():
    """Mixed neighbourhood + adjacent neargood on the bad side -> the
    published rescue promotes the short block, and the neargood then
    survives via the revised-good prev (in-place propagation)."""
    near = GOOD_SENT[:150]
    html = (
        f"<p>{GOOD_SENT}</p><p>figure 1</p><p>{near}</p>"
        f"<p>© footer co</p>"
    )
    got = _jt(html)
    assert [c for _t, c, _f in got] == ["good", "short", "neargood", "bad"]
    assert [f for _t, _c, f in got] == ["good", "good", "good", "bad"]


def test_justext_isolated_neargood_dies():
    html = f"<p>© x</p><p>{GOOD_SENT[:150]}</p><p>© y</p>"
    assert [f for _t, _c, f in _jt(html)] == ["bad", "bad", "bad"]


def test_justext_neargood_next_to_good_survives():
    html = f"<p>{GOOD_SENT}</p><p>{GOOD_SENT[:150]}</p>"
    assert [f for _t, _c, f in _jt(html)] == ["good", "good"]


def test_justext_extract_joins_good_blocks():
    from tesseract_spark.functions.html import justext_extract

    html = f"<p>{GOOD_SENT}</p><p>figure 1</p><p>{GOOD_SENT}</p>"
    out = justext_extract(html, EN_STOP)
    assert out.split("\n")[1] == "figure 1"
    assert out.count(GOOD_SENT) == 2


def test_justext_document_edges_default_bad():
    # a lone short block has bad neighbours on both document edges
    assert [f for _t, _c, f in _jt("<p>short note</p>")] == ["bad"]


def test_justext_heading_promotion():
    """The published heading rule: a short <h2> with a good block
    within MAX_HEADING_DISTANCE below it is promoted (neargood ->
    good); the same heading above only boilerplate dies."""
    html = f"<h2>the story</h2><p>{GOOD_SENT}</p>"
    got = _jt(html)
    assert [c for _t, c, _f in got] == ["short", "good"]
    assert [f for _t, _c, f in got] == ["good", "good"]
    # non-heading short in the same position still needs the edge rule
    html2 = f"<p>the story</p><p>{GOOD_SENT}</p>"
    assert [f for _t, _c, f in _jt(html2)][0] == "bad"
    # heading with no good block below: no promotion
    html3 = f"<h2>the story</h2><p>{LOW_SENT}</p>"
    assert [f for _t, _c, f in _jt(html3)] == ["bad", "bad"]
