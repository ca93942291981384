"""Underline/overline separation and character restore.

Covers src/textord/makerow.cpp:1771-1831 (separate_underlines),
src/textord/blkocc.cpp:47-103 (test_underline band occupancy) and
src/underlin.cpp:33-190 (restore_underlined_blobs), wired into the page
stage (operators/underline.py via analyze_page):

- a full-line underline MERGED with every descender still decodes
  exactly (the one-giant-blob failure mode the pass exists for);
- a short per-word underline — below the line finder's length reach —
  is separated and the word decodes;
- an abutting (non-merged) underline bar leaves the text stream as an
  underline, not a separator;
- the line finder's underline guard (linefind.cpp:207-213 'perhaps ...
  underlines') rejects bars flush under text so this pass sees them;
- a dense glyph body row is never mistaken for a bar (flat-core gate);
- pages without wide components are untouched (n_underlines == 0).
"""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import BASELINE, mask_to_gray, render_line
from tesseract_spark.operators.linefind import find_and_remove_lines
from tesseract_spark.operators.page import analyze_page, label_and_stats
from tesseract_spark.operators.recognize import recognize_page
from tesseract_spark.operators.underline import separate_underlines_page


def _underlined_page(text, scale=3, gap=1, thick=2):
    """Text line with a full-width underline ``gap`` px below baseline —
    gap<=1 merges the bar into every descender's component."""
    lm = render_line(text, scale)
    H, W = lm.shape[0] + 80, lm.shape[1] + 80
    page = np.zeros((H, W), bool)
    y0, x0 = 40, 40
    page[y0 : y0 + lm.shape[0], x0 : x0 + lm.shape[1]] = lm
    th = thick * scale // 2 + 1
    uy = y0 + BASELINE * scale + gap
    page[uy : uy + th, x0 - 2 : x0 + lm.shape[1] + 2] = True
    return page


@pytest.mark.parametrize(
    "text,gap",
    [
        ("gyp jog quay", 1),  # all-descender line: one giant merged blob
        ("justify gap", 1),  # mixed merged + free letters
        ("hello world", 1),  # no descenders: abutting free bar
        ("wider spacing", 4),  # offset bar still merged via p/g
        ("plain text", 2),
    ],
)
def test_underlined_line_decodes_exactly(text, gap):
    page = _underlined_page(text, gap=gap)
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert [(s.kind, s.text) for s in spans] == [("text", text)]
    assert layout.n_underlines == 1
    assert layout.h_rules == 0  # the guard kept it off the separator path


def _word_bar_page(text, uword, scale=3, gap=1, thick=2, over=False):
    """Only ``uword`` inside ``text`` carries the bar — too short for the
    line finder, exactly separate_underlines' per-word territory."""
    lm = render_line(text, scale)
    H, W = lm.shape[0] + 80, lm.shape[1] + 80
    page = np.zeros((H, W), bool)
    y0, x0 = 40, 40
    page[y0 : y0 + lm.shape[0], x0 : x0 + lm.shape[1]] = lm
    pre = text[: text.index(uword)]
    xs = render_line(pre, scale).shape[1] if pre else 0
    xe = render_line(text[: text.index(uword) + len(uword)], scale).shape[1]
    th = thick * scale // 2 + 1
    uy = (y0 - gap - th) if over else (y0 + BASELINE * scale + gap)
    page[uy : uy + th, x0 + xs : x0 + xe] = True
    return page


@pytest.mark.parametrize(
    "text,uword,gap",
    [
        ("see the gypsy word here", "gypsy", 1),  # merged via descenders
        ("see the plain word here", "plain", 2),  # abutting pure bar
    ],
)
def test_short_word_underline(text, uword, gap):
    page = _word_bar_page(text, uword, gap=gap)
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert [(s.kind, s.text) for s in spans] == [("text", text)]
    assert layout.n_underlines == 1


def test_overline_merged_component_unit():
    """The overline branch at the operator level: a bar merged with
    ascender tops is erased and the talls restored (blkocc.cpp's
    mirrored top-band case)."""
    page = _word_bar_page(
        "the title word follows", "title", gap=0, thick=2, over=True
    )
    labels, n, stats = label_and_stats(page)
    before = page.sum()
    nf = separate_underlines_page(page, labels, n, stats)
    assert nf == 1
    assert page.sum() < before
    # the restored page still decodes exactly
    spans, _layout = recognize_page(mask_to_gray(page), 300)
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "the title word follows")
    ]


def test_free_overline_goes_to_rule_path():
    """A free-standing overline ABOVE sparse ascender tops is a separator
    by the reference's own density test (CountPixelsAdjacentToLine sees
    almost no adjacent ink) — it is removed as an h-rule and the text
    below still decodes exactly.  Fidelity to linefind, not a miss."""
    text = "overline top"
    lm = render_line(text, 3)
    H, W = lm.shape[0] + 80, lm.shape[1] + 80
    page = np.zeros((H, W), bool)
    page[40 : 40 + lm.shape[0], 40 : 40 + lm.shape[1]] = lm
    page[31:35, 38 : 42 + lm.shape[1]] = True
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert ("text", text) in [(s.kind, s.text) for s in spans]
    assert layout.h_rules == 1 and layout.n_underlines == 0


def test_linefind_guard_rejects_flush_underline():
    """find_and_remove_lines itself must NOT claim a bar flush under a
    text line (linefind.cpp:207-213): it stays in the ink for the
    underline pass."""
    page = _underlined_page("hello world", gap=1)
    clean, vv, hv, _music = find_and_remove_lines(page, 300)
    assert hv == [] and vv == []
    assert (clean == page).all()


def test_body_row_not_a_bar():
    """A plain line (every glyph carries a dense mid-body row) produces
    zero underlines — the flat-core gate rejects kerning-broken rows."""
    lm = render_line("no bars anywhere at all", 3)
    H, W = lm.shape[0] + 80, lm.shape[1] + 80
    page = np.zeros((H, W), bool)
    page[40 : 40 + lm.shape[0], 40 : 40 + lm.shape[1]] = lm
    res = analyze_page(mask_to_gray(page), 300)
    assert res.n_underlines == 0
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "no bars anywhere at all")
    ]


def test_underline_restore_pixel_budget():
    """The restore loses only band-row stubs under descenders — under 2%
    of the original glyph ink (underlin.cpp keeps chopped cells)."""
    text = "justify gap"
    lm = render_line(text, 3)
    orig = np.zeros((lm.shape[0] + 80, lm.shape[1] + 80), bool)
    orig[40 : 40 + lm.shape[0], 40 : 40 + lm.shape[1]] = lm
    page = _underlined_page(text, gap=1)
    labels, n, stats = label_and_stats(page)
    assert separate_underlines_page(page, labels, n, stats) == 1
    lost = (orig & ~page).sum()
    assert lost <= 0.02 * orig.sum()
    # and no bar residue survives outside the glyphs
    extra = (page & ~orig).sum()
    assert extra <= 0.02 * orig.sum()


def _shear(page, skew):
    H, W = page.shape
    shifts = np.round(skew * np.arange(W)).astype(np.int64)
    pad = int(abs(shifts).max()) + 1
    out = np.zeros((H + 2 * pad, W), bool)
    for x in range(W):
        out[pad + shifts[x] : pad + shifts[x] + H, x] = page[:, x]
    return out


@pytest.mark.parametrize("skew", [0.02, -0.03])
def test_sloped_merged_underline_decodes(skew):
    """A merged full-line underline on a SKEWED page: the flat band test
    fails in the page frame, the quantized-shear retry (underlin.cpp's
    sloped-baseline power) recovers it — exact decode, bar counted."""
    page = _shear(_underlined_page("justify gap", gap=1), skew)
    spans, layout = recognize_page(mask_to_gray(page), 300)
    assert [(s.kind, s.text) for s in spans] == [("text", "justify gap")]
    assert layout.n_underlines == 1
    assert layout.h_rules == 0


def test_sloped_merged_overline_matches_flat():
    """The mirrored case under skew is CONSISTENT with the flat page and
    the text underneath restores exactly either way.  Since the round-5
    own-width coverage bar (a word-hugging bar reaches 0.35 of its OWN
    width easily), the overline path claims it on both frames — the
    right reading for a decoration: no phantom media region."""
    flat = _word_bar_page("the title word follows", "title", gap=0, over=True)
    got = []
    for page in (flat, _shear(flat, 0.02)):
        spans, layout = recognize_page(mask_to_gray(page), 300)
        got.append(
            ([(s.kind, s.text) for s in spans], layout.h_rules,
             layout.n_underlines)
        )
    assert got[0] == got[1]
    assert got[0] == (
        [("text", "the title word follows")], 0, 1
    )
