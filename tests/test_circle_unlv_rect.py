"""PSM_CIRCLE_WORD, UNLV sink, and sub-rect OCR tests.

Reference analogues: RemoveEnclosingCircle (pagesegmain.cpp:56-94),
GetUNLVText (baseapi.cpp:1546-1625), SetRectangle (baseapi.cpp:619)."""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line
from tesseract_spark.operators.circle import (
    recognize_circle_word,
    remove_enclosing_circle,
)
from tesseract_spark.sources.zones import recognize_rect


def _circled_word(text: str, thickness: int = 2) -> np.ndarray:
    word = render_line(text)
    h, w = word.shape
    r = max(h, w) // 2 + 14
    size = 2 * r + 8
    page = np.zeros((size, size), dtype=bool)
    cy = cx = size // 2
    page[cy - h // 2 : cy - h // 2 + h, cx - w // 2 : cx - w // 2 + w] = word
    yy, xx = np.mgrid[0:size, 0:size]
    dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    ring = (dist >= r - thickness) & (dist <= r)
    return mask_to_gray(page | ring)


def test_circle_removal_recovers_word():
    gray = _circled_word("coin")
    spans, _ = recognize_circle_word(gray)
    assert [s.text for s in spans if s.kind == "text"] == ["coin"]


def test_without_removal_the_ring_corrupts_recognition():
    from tesseract_spark.operators.recognize import recognize_page

    gray = _circled_word("coin")
    spans, _ = recognize_page(gray)
    assert [s.text for s in spans if s.kind == "text"] != ["coin"]


def test_no_circle_returns_none_and_falls_back():
    from tesseract_spark.functions.image_ops import binarize_otsu

    word = render_line("plain")
    page = np.zeros((CELL_H + 24, word.shape[1] + 24), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + word.shape[1]] = word
    gray = mask_to_gray(page)
    # fallback path still recognizes
    spans, _ = recognize_circle_word(gray)
    assert [s.text for s in spans if s.kind == "text"] == ["plain"]


def test_recognize_rect_matches_zone_crop():
    l1, l2 = render_line("top line"), render_line("low line")
    w = max(l1.shape[1], l2.shape[1]) + 24
    page = np.zeros((2 * CELL_H + 48, w), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + l1.shape[1]] = l1
    page[36 + CELL_H : 36 + 2 * CELL_H, 12 : 12 + l2.shape[1]] = l2
    gray = mask_to_gray(page)
    spans, words = recognize_rect(gray, 0, 0, w, CELL_H + 24)
    assert [s.text for s in spans if s.kind == "text"] == ["top line"]
    assert all(wd.block_num == 1 for wd in words)


def test_unlv_sink_marks_rejects_and_suspects(spark):
    from tesseract_spark.operators.sinks import to_unlv

    rows = [
        ("d", "m", 1, 1, 1, 1, 0, 0, 10, 10, 95.0, "good"),
        ("d", "m", 1, 1, 1, 2, 20, 0, 10, 10, 70.0, "meh"),
        ("d", "m", 1, 1, 1, 3, 40, 0, 10, 10, 30.0, "bad"),
        ("d", "m", 1, 1, 2, 1, 0, 20, 10, 10, 99.0, "next"),
    ]
    words = spark.createDataFrame(
        rows,
        "doc_id string, media_ref string, block_num int, par_num int,"
        " line_num int, word_num int, left int, top int, width int,"
        " height int, conf double, text string",
    )
    out = to_unlv(words).collect()
    assert len(out) == 1
    assert out[0].unlv == "good ^meh ~\nnext"


@pytest.mark.parametrize("thickness", [1, 2, 5])
def test_circle_removal_thickness_range(thickness):
    spans, _ = recognize_circle_word(_circled_word("coin", thickness=thickness))
    assert [s.text for s in spans if s.kind == "text"] == ["coin"]


def test_double_ring_removed():
    from tesseract_spark.functions.image_ops import binarize_otsu

    gray = _circled_word("coin", thickness=2)
    ink = binarize_otsu(gray)
    size = ink.shape[0]
    yy, xx = np.mgrid[0:size, 0:size]
    c = size // 2
    dist = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    r2 = size // 2 - 2
    gray2 = mask_to_gray(ink | ((dist >= r2 - 2) & (dist <= r2)))
    spans, _ = recognize_circle_word(gray2)
    assert [s.text for s in spans if s.kind == "text"] == ["coin"]
