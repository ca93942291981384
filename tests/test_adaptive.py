"""Adaptive classifier tests: soft dict-arbitrated events + within-page
glyph adaptation (AdaptiveClassifier / LearnWord / AdaptToChar,
src/classify/adaptmatch.cpp:202-440; two-pass recognition like
recog_all_words pass 1/2, src/ccmain/control.cpp:291-456)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font, mask_to_gray
from tesseract_spark.lstm.dawg import Dawg
from tesseract_spark.lstm.templates import get_net
from tesseract_spark.operators.recognize import recognize_page

# enough damage to fail the static exact gate (BLANK_SCORE = 0.9 of
# glyph cell pixels) but stay above the soft gate (0.75): clear interior
# ink only, so the glyph bbox (baseline/x-height anchors) is preserved
# and no stray specks appear for the noise filter to shave
N_DAMAGE_PX = 16


def _damaged_glyph(ch: str, seed: int = 4) -> np.ndarray:
    """The font glyph with N_DAMAGE_PX interior ink pixels cleared."""
    g = get_font()[ch].copy()
    ys, xs = np.nonzero(g)
    keep = (ys > ys.min()) & (ys < ys.max()) & (xs > xs.min()) & (xs < xs.max())
    iy, ix = ys[keep], xs[keep]
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(iy), size=min(N_DAMAGE_PX, len(iy)), replace=False)
    g[iy[sel], ix[sel]] = False
    return g


def _line_mask(glyphs: list[np.ndarray], gap: int = 1) -> np.ndarray:
    cols = []
    for i, g in enumerate(glyphs):
        cols.append(g)
        if i + 1 < len(glyphs):
            cols.append(np.zeros((CELL_H, gap), dtype=bool))
    return np.hstack(cols)


def _page(lines: list[np.ndarray], vgap: int = 8) -> np.ndarray:
    w = max(ln.shape[1] for ln in lines) + 24
    h = sum(ln.shape[0] for ln in lines) + vgap * (len(lines) - 1) + 24
    page = np.zeros((h, w), dtype=bool)
    y = 12
    for ln in lines:
        page[y : y + ln.shape[0], 12 : 12 + ln.shape[1]] = ln
        y += ln.shape[0] + vgap
    return mask_to_gray(page)


def _word(text: str, damage: dict[int, np.ndarray] | None = None):
    font = get_font()
    return _line_mask(
        [
            (damage or {}).get(i, font[ch])
            for i, ch in enumerate(text)
        ]
    )


def _texts(spans):
    return [s.text for s in spans if s.kind == "text"]


def test_degraded_fallback_recovers_near_exact_glyph_without_dict():
    # the static classifier always answers (adaptmatch.cpp:202-234):
    # a glyph damaged below the 0.9 exact gate but at/above the 0.875
    # degraded-accept bar recovers as its best class at minimal
    # confidence even with no dictionary (round-4: a separator clipping
    # glyph tops must not erase characters from the page)
    bad_w = _damaged_glyph("w")
    gray = _page([_word("wind", {0: bad_w})])
    spans, _ = recognize_page(gray)
    assert _texts(spans) == ["wind"]


def test_static_gate_drops_heavily_damaged_glyph_without_dict():
    # damage below K_DEGRADED_ACCEPT (0.875 of cell pixels): no static
    # class is a near-exact explanation, and with neither dictionary
    # nor adapted templates the column drops
    font = get_font()
    g = font["w"].copy()
    ys, xs = np.nonzero(g)
    t, b, l, r = ys.min(), ys.max(), xs.min(), xs.max()
    keep = (ys > t) & (ys < b) & (xs > l) & (xs < r)
    iy, ix = ys[keep], xs[keep]
    rng = np.random.default_rng(4)
    # clear every interior ink pixel AND fill interior background until
    # > 12.5% of the glyph cell disagrees with the template
    g[iy, ix] = False
    need = max(0, int(0.13 * CELL_H * g.shape[1]) + 2 - len(iy))
    if need:
        by, bx = np.nonzero(~g)
        bk = (by > t) & (by < b) & (bx > l) & (bx < r)
        sel = rng.choice(len(by[bk]), size=need, replace=False)
        g[by[bk][sel], bx[bk][sel]] = True
    gray = _page([_word("wind", {0: g})])
    spans, _ = recognize_page(gray)
    assert _texts(spans) == ["ind"]


def test_soft_event_lets_dictionary_recover_damaged_glyph():
    bad_w = _damaged_glyph("w")
    gray = _page([_word("wind", {0: bad_w})])
    dawg = Dawg(get_net().charset, ["wind"])
    spans, _ = recognize_page(gray, dawg=dawg)
    assert _texts(spans) == ["wind"]


def test_adaptation_rescues_non_dict_word_via_learned_glyph():
    # line 1: 'wind' with damaged w -> dictionary recovers it (pass 1)
    # and the damaged bitmap is learned; line 2: 'wq' is NOT a dict word,
    # same damaged w -> only the adapted template can rescue it (pass 2)
    bad_w = _damaged_glyph("w")
    gray = _page(
        [
            _word("wind", {0: bad_w}),
            _word("wq", {0: bad_w}),
        ]
    )
    dawg = Dawg(get_net().charset, ["wind"])
    spans, _ = recognize_page(gray, dawg=dawg)
    assert _texts(spans) == ["wind\nwq"]
    # without adaptation both lines lose the damaged glyph in line 2
    from tesseract_spark.operators.recognize import recognize_page_detail

    spans_na, _w, _l = recognize_page_detail(gray, dawg=dawg, adapt=False)
    assert _texts(spans_na) == ["wind\nq"]


def test_clean_pages_identical_with_and_without_adaptation():
    gray = _page([_word("wind"), _word("torch")])
    dawg = Dawg(get_net().charset, ["wind", "torch"])
    from tesseract_spark.operators.recognize import recognize_page_detail

    a, _, _ = recognize_page_detail(gray, dawg=dawg, adapt=True)
    b, _, _ = recognize_page_detail(gray, dawg=dawg, adapt=False)
    assert _texts(a) == _texts(b) == ["wind\ntorch"]


def test_adaptive_templates_dedup_and_match():
    from tesseract_spark.lstm.adaptive import AdaptiveTemplates

    at = AdaptiveTemplates()
    g = get_font()["a"]
    at.learn(0, g)
    at.learn(0, g)  # duplicate bitmap: NumTimesSeen++, no new proto
    assert at.n_learned == 1
    strip = np.zeros((CELL_H, g.shape[1] + 4), dtype=bool)
    strip[:, : g.shape[1]] = g
    hit = at.match(strip, 0)
    assert hit is not None and hit[0] == 0 and hit[1] == 1.0


def test_harvest_uses_winning_strip_registration():
    """When the alt-baseline hypothesis wins, harvested templates must be
    cropped from the ALT strip — cropping from the primary strip stores
    bitmaps shifted 4 canonical rows (dictionary-confirmed garbage)."""
    from tesseract_spark.lstm.adaptive import AdaptiveTemplates
    from tesseract_spark.operators.page import analyze_page
    from tesseract_spark.operators.recognize import _decode_row, _harvest_adaptable

    net = get_net()
    dawg = Dawg(net.charset, ["gyp"])
    lay = analyze_page(_page([_word("gyp")]), 300)
    row = lay.regions[0].rows[0]
    res = _decode_row(net, row, dawg)
    assert res[0] == "gyp" and res[5] is row.alt_strip  # alt hypothesis won
    at = AdaptiveTemplates()
    _harvest_adaptable(at, net, res[5], res[1], res[4])
    g = at.protos[net.charset.index("g")][0]
    font_g = get_font()["g"]
    assert g.shape == font_g.shape and (g == font_g).all()


def test_cross_page_adaptive_carryover_unit():
    """Templates learned on page 1 rescue a damaged non-dict word on a
    SEPARATE page 2 when the AdaptiveTemplates instance carries over
    (SwitchAdaptiveClassifier continuity, control.cpp:306-322)."""
    from tesseract_spark.lstm.adaptive import AdaptiveTemplates
    from tesseract_spark.operators.recognize import recognize_page_detail

    bad_w = _damaged_glyph("w")
    page1 = _page([_word("wind", {0: bad_w})])  # dict recovers + learns
    page2 = _page([_word("wq", {0: bad_w})])  # non-dict: needs carryover
    dawg = Dawg(get_net().charset, ["wind"])
    # without carryover page 2 drops the damaged glyph
    alone, _, _ = recognize_page_detail(page2, dawg=dawg)
    assert _texts(alone) == ["q"]
    carry = AdaptiveTemplates()
    s1, _, _ = recognize_page_detail(page1, dawg=dawg, carry_adapted=carry)
    assert _texts(s1) == ["wind"]
    assert carry.n_learned > 0
    s2, _, _ = recognize_page_detail(page2, dawg=dawg, carry_adapted=carry)
    assert _texts(s2) == ["wq"]


def test_cross_page_adaptive_carryover_pipeline(spark):
    """End-to-end through ocr_documents(adapt_carryover=True): a two-page
    document where page 2's damaged non-dict word is only readable with
    page-1 templates."""
    from pyspark.sql import functions as F

    from tesseract_spark.functions.png_codec import encode_gray_png
    from tesseract_spark.pipeline import ocr_documents

    bad_w = _damaged_glyph("w")
    png1 = encode_gray_png(_page([_word("wind", {0: bad_w})]))
    png2 = encode_gray_png(_page([_word("wq", {0: bad_w})]))
    docs = spark.createDataFrame(
        [("d1", [("media", None, "m1", 0), ("media", None, "m2", 1)])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    media = spark.createDataFrame(
        [("m1", bytearray(png1), 300), ("m2", bytearray(png2), 300)],
        "media_ref string, png binary, dpi int",
    )
    flat = ocr_documents(
        spark, docs, media, dict_words=["wind"], adapt_carryover=True,
        num_partitions=2,
    )
    texts = [
        r.text
        for r in flat.filter(F.col("kind") == "text")
        .orderBy("offset")
        .collect()
    ]
    assert texts == ["wind", "wq"]
    # without carryover the second page loses the glyph
    flat_nc = ocr_documents(
        spark, docs, media, dict_words=["wind"], num_partitions=2
    )
    texts_nc = [
        r.text
        for r in flat_nc.filter(F.col("kind") == "text")
        .orderBy("offset")
        .collect()
    ]
    assert texts_nc == ["wind", "q"]
