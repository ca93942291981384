"""Vertical-text layout groundwork (pagesegmain.cpp:272-413 vertical
check; cjkpitch.cpp fixed-pitch cell segmentation)."""

import numpy as np

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.functions.fonts import get_font, mask_to_gray
from tesseract_spark.functions.image_ops import binarize_otsu, label_and_stats
from tesseract_spark.operators.vertical import (
    cjk_pitch_cells,
    is_vertical_page,
    recognize_page_auto,
    recognize_vertical_page,
)


def compose_vertical(columns, pitch=18, colspace=26):
    """Upright glyphs stacked top-to-bottom, columns right-to-left —
    the CJK vertical layout rendered with the fixture font."""
    font = get_font()
    H = 24 + pitch * max(len(c) for c in columns)
    W = 24 + colspace * len(columns)
    mask = np.zeros((H, W), dtype=bool)
    for ci, text in enumerate(columns):
        x = W - 12 - 10 - ci * colspace
        y = 12
        for ch in text:
            g = font[ch]
            mask[y : y + g.shape[0], x : x + g.shape[1]] |= g
            y += pitch
    return mask_to_gray(mask)


def test_vertical_detection_and_decode():
    for cols in (["table", "sort", "key"], ["query", "band"], ["jump", "dog"]):
        gray = compose_vertical(cols)
        stats = label_and_stats(binarize_otsu(gray))[2]
        assert is_vertical_page(stats), cols
        assert recognize_vertical_page(gray) == cols


def test_horizontal_pages_not_misdetected():
    for spec in (
        PageSpec(paragraphs=[["hello world", "more text"]]),
        PageSpec(paragraphs=[["a b c"]]),
        PageSpec(paragraphs=[["left col", "two lines"]], column2=[["right col", "here too"]]),
    ):
        page = compose_page(spec)
        stats = label_and_stats(binarize_otsu(page.image))[2]
        assert not is_vertical_page(stats)


def test_cjk_pitch_cells_merge_multi_component_glyphs():
    """Components inside one pitch slot merge into a single cell (the
    FPChar grid snap of cjkpitch.cpp): an 'i'-like dot+body pair stays
    one glyph."""
    tops = np.array([10, 12, 28, 46, 47])  # cells at 10, 28, 46 + strays
    bottoms = tops + 8
    pitch, cells = cjk_pitch_cells(tops, bottoms)
    assert 16 <= pitch <= 20
    assert [sorted(c) for c in cells] == [[0, 1], [2], [3, 4]]


def test_vertical_with_dotted_glyphs():
    """'i'/'j' split into dot+body components; the pitch grid keeps each
    in one cell so the column decodes exactly."""
    cols = [["inn", "jig"], ["win", "fix"]]
    for c in cols:
        gray = compose_vertical(c)
        assert recognize_vertical_page(gray) == c


def test_recognize_page_auto_routes_both_ways():
    gray_v = compose_vertical(["table", "key"])
    spans_v, layout_v = recognize_page_auto(gray_v)
    assert layout_v is None
    assert [s.text for s in spans_v] == ["table", "key"]
    page = compose_page(PageSpec(paragraphs=[["hello world", "more text"]]))
    spans_h, layout_h = recognize_page_auto(page.image)
    assert layout_h is not None
    assert [(s.kind, s.text) for s in spans_h] == page.golden


def test_cjk_pitch_ignores_same_cell_fragment_pitches():
    """FPRow::EstimatePitch (cjkpitch.cpp:615-684): center advances
    closer than half the 87.5%ile character height are same-cell
    fragments and must not vote for the pitch — a column where every
    glyph carries a low fragment 6px below its top would otherwise
    report the fragment spacing as the pitch."""
    tops, bottoms = [], []
    for cell in (0, 20, 40, 60):
        tops += [cell, cell + 6]
        bottoms += [cell + 16, cell + 9]  # body h=16, fragment h=3
    tops, bottoms = np.array(tops), np.array(bottoms)
    pitch, cells = cjk_pitch_cells(tops, bottoms)
    assert 18 <= pitch <= 22, pitch
    assert [sorted(c) for c in cells] == [[0, 1], [2, 3], [4, 5], [6, 7]]


def test_vertical_survives_noise_specks():
    # dust pixels must neither spawn phantom columns nor flip the
    # flow-direction verdict (the speck filter mirrors the page
    # stage's noise grading; glyph dots are 4+ px and stay)
    gray = compose_vertical(["table", "sort", "key"])
    rng = np.random.RandomState(3)
    g = gray.copy()
    ys = rng.randint(0, g.shape[0], 5)
    xs = rng.randint(0, g.shape[1], 5)
    g[ys, xs] = 0
    stats = label_and_stats(binarize_otsu(g))[2]
    assert is_vertical_page(stats)
    assert recognize_vertical_page(g) == ["table", "sort", "key"]


def test_vertical_with_separator_rule():
    """A full-height vertical rule between two vertical text columns:
    the reference removes lines BEFORE the page-segmentation vertical
    check (pagesegmain.cpp:204-270), so the page still routes vertical,
    both columns decode, and the rule surfaces as a media span."""
    gray = compose_vertical(["table", "sort"], colspace=60)
    mask = gray < 128
    H, _W = mask.shape
    xs = np.flatnonzero(mask.any(axis=0))
    gaps, run = [], None
    for x in range(xs.min(), xs.max()):
        if not mask[:, x].any():
            run = run or [x, x]
            run[1] = x
        elif run:
            gaps.append(tuple(run))
            run = None
    gl, gr = max(gaps, key=lambda g: g[1] - g[0])
    mask[4 : H - 4, (gl + gr) // 2 : (gl + gr) // 2 + 3] = True
    spans, _layout = recognize_page_auto(mask_to_gray(mask))
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "table"),
        ("text", "sort"),
        ("media", ""),
    ]
