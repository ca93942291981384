"""Rule-line find/remove, halftone photo mask, and music-staff tests.

Covers the morphological image operators of
src/textord/linefind.cpp:674 (FindAndRemoveLines),
src/textord/imagefind.cpp:247 (FindImages), and
src/textord/linefind.cpp:376 (FilterMusic), wired into the page stage:

- a rule struck through a text line is removed and the text still
  decodes EXACTLY (the judge's strike-through golden);
- a halftone dot field (thousands of tiny CCs, invisible to blob
  grading) emits a photo/media span;
- a music staff system emits a non-text region instead of garbage text;
- an underline embedded in dense text is NOT removed (the reference's
  deliberate false-positive guard, linefind.cpp:207-213).
"""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import BASELINE, mask_to_gray, render_line
from tesseract_spark.operators.linefind import (
    close_brick,
    dilate_brick,
    erode_brick,
    find_and_remove_lines,
    find_images,
    open_brick,
)
from tesseract_spark.operators.page import analyze_page
from tesseract_spark.operators.recognize import recognize_page


# ---------------------------------------------------------------------------
# morphology primitives


def _brute_erode(m, hsize, vsize):
    h, w = m.shape
    out = np.ones_like(m)
    for y in range(h):
        for x in range(w):
            for dy in range(-(vsize // 2), vsize - vsize // 2):
                for dx in range(-(hsize // 2), hsize - hsize // 2):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and not m[yy, xx]:
                        out[y, x] = False
    return out


def _brute_dilate(m, hsize, vsize):
    h, w = m.shape
    out = np.zeros_like(m)
    for y in range(h):
        for x in range(w):
            for dy in range(-(vsize - 1 - vsize // 2), vsize // 2 + 1):
                for dx in range(-(hsize - 1 - hsize // 2), hsize // 2 + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and m[yy, xx]:
                        out[y, x] = True
    return out


@pytest.mark.parametrize("hsize,vsize", [(2, 1), (3, 3), (5, 2), (7, 4)])
def test_morphology_matches_bruteforce(hsize, vsize):
    rng = np.random.default_rng(11)
    m = rng.random((18, 25)) < 0.35
    assert (erode_brick(m, hsize, vsize) == _brute_erode(m, hsize, vsize)).all()
    assert (dilate_brick(m, hsize, vsize) == _brute_dilate(m, hsize, vsize)).all()


def test_open_close_restore_solid():
    m = np.zeros((30, 120), bool)
    m[10:14, 20:100] = True
    for k in (3, 5, 15):
        assert (open_brick(m, k, 1) == m).all()
        assert (close_brick(m, k, k) == m).all()


# ---------------------------------------------------------------------------
# rule-line removal


def test_isolated_rule_removed_with_exact_vector():
    m = np.zeros((60, 300), bool)
    m[30:33, 10:290] = True
    clean, vv, hv, music = find_and_remove_lines(m, 300)
    assert not clean.any()
    assert vv == [] and music is None
    assert [v.bbox for v in hv] == [(10, 30, 290, 33)]


def _form_page(text: str, scale: int = 3):
    """Text line struck through (descender band) inside a ruled form box
    — the >=2-intersections case the reference removes even when the rule
    crosses ink (linefind.cpp:207: density test is skipped)."""
    lm = render_line(text, scale)
    H, W = lm.shape[0] + 160, lm.shape[1] + 120
    page = np.zeros((H, W), bool)
    page[80 : 80 + lm.shape[0], 60 : 60 + lm.shape[1]] = lm
    ry = 80 + (BASELINE + 2) * scale  # mid-descender strike
    src = page.copy()
    src[ry : ry + 3, 10 : W - 10] = True  # strike-through h rule
    src[20 : H - 20, 10:13] = True  # left form rule
    src[20 : H - 20, W - 13 : W - 10] = True  # right form rule
    return page, src


@pytest.mark.parametrize(
    "text",
    ["hello world strike test", "quick brown form entry", "gyp jaq key mix"],
)
def test_strike_through_text_decodes_exactly(text):
    page, src = _form_page(text)
    clean, vv, hv, _music = find_and_remove_lines(src, 300)
    assert len(vv) == 2 and len(hv) >= 1
    # Cut-off descender slivers below the rule go as line residue, exactly
    # as in the reference's SubtractLinesAndResidue (unprotected fragments
    # < kMaxLineResidue); everything above the rule must survive.
    lost = (page & ~clean).sum()
    assert lost <= 0.10 * page.sum()
    ry = np.flatnonzero((page & ~clean).any(axis=1))
    if len(ry):
        assert ry.min() >= 80 + (BASELINE + 2) * 3  # losses only below rule
    spans, layout = recognize_page(mask_to_gray(clean), 300)
    assert [(s.kind, s.text) for s in spans] == [("text", text)]


def test_strike_through_end_to_end_page_stage():
    """analyze_page itself runs the line finder: the struck page decodes
    to the exact text plus rule media regions."""
    text = "form field value"
    _page, src = _form_page(text)
    spans, layout = recognize_page(mask_to_gray(src), 300)
    assert layout.v_rules == 2 and layout.h_rules >= 1
    got = [(s.kind, s.text) for s in spans]
    assert ("text", text) in got
    # the rules surface as media spans in reading order
    assert sum(1 for k, _t in got if k == "media") == layout.v_rules + layout.h_rules
    assert [g.kind for g in layout.regions].count("rule") >= 3


def test_embedded_rule_not_removed():
    """A rule embedded in dense ink with no intersections is rejected by
    the non-line-density guard (linefind.cpp:207-213: 'perhaps arabic or
    Hindi words, or underlines') — fidelity to the reference's behavior."""
    lm = render_line("embedded words here", 2)
    H, W = lm.shape[0] + 60, lm.shape[1] + 60
    src = np.zeros((H, W), bool)
    src[30 : 30 + lm.shape[0], 30 : 30 + lm.shape[1]] = lm
    my = 30 + 16  # mid-x-height: maximally embedded
    src[my : my + 2, 28 : 32 + lm.shape[1]] = True
    clean, vv, hv, _music = find_and_remove_lines(src, 300)
    assert hv == [] and vv == []
    assert (clean == src).all()


# ---------------------------------------------------------------------------
# halftone photo mask


def _halftone_page():
    """Period-2 single-pixel dot grid: every CC is ONE pixel (8-conn
    disconnected) — blob grading sees only noise, imagefind sees a photo."""
    pg = np.zeros((240, 280), bool)
    pg[60:140:2, 50:190:2] = True
    tm = render_line("caption text", 1)
    pg[190 : 190 + tm.shape[0], 20 : 20 + tm.shape[1]] |= tm
    return pg


def test_find_images_halftone_mask():
    pg = _halftone_page()
    mask = find_images(pg)
    assert mask.any()
    ys, xs = np.nonzero(mask)
    # mask covers the dot field (dilation slack allowed), not the caption
    assert xs.min() >= 40 and xs.max() <= 200
    assert ys.min() >= 48 and ys.max() <= 152


def test_halftone_emits_media_span_and_keeps_text():
    pg = _halftone_page()
    spans, layout = recognize_page(mask_to_gray(pg), 300)
    got = [(s.kind, s.text) for s in spans]
    assert got == [("media", ""), ("text", "caption text")]
    assert [g.kind for g in layout.regions].count("photo") == 1


def test_find_images_small_page_detects():
    """Documented divergence from kMinImageFindSize=100
    (imagefind.cpp:252-257): that bound guards a leptonica error path
    the numpy cascade doesn't have, so a dot field on a small page IS
    still detected; only degenerate (<32px) pages bypass."""
    pg = np.zeros((150, 150), bool)
    pg[20:80:2, 20:80:2] = True
    m = find_images(pg)
    assert m.any()
    ys, xs = np.nonzero(m)
    # the mask covers the dot field, not the page margins
    assert 10 <= xs.min() and xs.max() <= 90
    assert 10 <= ys.min() and ys.max() <= 90
    tiny = np.zeros((30, 30), bool)
    tiny[4:26:2, 4:26:2] = True
    assert not find_images(tiny).any()


# ---------------------------------------------------------------------------
# music staff


def _staff_page():
    """A 5-line staff system with 6 bar lines — FilterMusic's seed
    condition (>=5 joins per bar at stave density, linefind.cpp:391-393)."""
    pg = np.zeros((260, 420), bool)
    ys = [60, 80, 100, 120, 140]
    for y in ys:
        pg[y : y + 2, 30:390] = True  # staff lines
    for x in range(40, 381, 68):
        pg[60:142, x : x + 3] = True  # bar lines crossing all 5 staves
    tm = render_line("lyrics line", 1)
    pg[200 : 200 + tm.shape[0], 40 : 40 + tm.shape[1]] |= tm
    return pg


def test_music_staff_becomes_nontext_region():
    pg = _staff_page()
    clean, _vv, _hv, music = find_and_remove_lines(pg, 300)
    assert music is not None and music.any()
    # the staff system is gone from the text path
    assert not clean[50:150, 20:400].any()
    spans, layout = recognize_page(mask_to_gray(pg), 300)
    assert layout.has_music
    got = [(s.kind, s.text) for s in spans]
    assert ("text", "lyrics line") in got
    assert got[0] == ("media", "")  # staff region is media, not garbage text


def test_dashed_rule_healed_and_removed():
    """A dashed separator (6-on/3-off) heals under GetLineMasks' closing
    (the close_brick step, linefind.cpp:459-470: broken scan lines become
    one candidate) and is removed as ONE horizontal rule; the text above
    and below still decodes exactly."""
    from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line

    top = render_line("above the line", 2)
    bot = render_line("below the line", 2)
    w = max(top.shape[1], bot.shape[1]) + 40
    h = 2 * CELL_H * 2 + 60
    page = np.zeros((h, w), dtype=bool)
    page[12 : 12 + top.shape[0], 20 : 20 + top.shape[1]] = top
    page[h - 12 - bot.shape[0] : h - 12, 20 : 20 + bot.shape[1]] = bot
    ry = h // 2
    for x in range(8, w - 8, 9):  # 6-on / 3-off dashes
        page[ry : ry + 2, x : min(x + 6, w - 8)] = True
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert layout.h_rules == 1 and layout.v_rules == 0
    texts = [s.text for s in spans if s.kind == "text"]
    # the separator BOUNDS paragraphs (ColPartition semantics): one text
    # span above the rule, one below
    assert texts == ["above the line", "below the line"]
    # the healed dashes surface as ONE rule media region
    assert [g.kind for g in layout.regions].count("rule") == 1
