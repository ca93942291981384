"""Box-file source + ApplyBoxes alignment tests
(boxread.cpp ReadAllBoxes/MakeBoxFileStr, applybox.cpp ApplyBoxes)."""

import numpy as np

from tesseract_spark.functions.fonts import (
    CELL_H,
    KERN,
    get_font,
    glyph_width,
    mask_to_gray,
    render_line,
)
from tesseract_spark.sources.boxfile import (
    TruthBox,
    align_boxes_to_blobs,
    make_box_file,
    parse_box_file,
)


def _page_with_truth(text: str, margin: int = 12):
    """Rendered page + ground-truth char boxes in top-down coords."""
    line = render_line(text)
    page = np.zeros((CELL_H + 2 * margin, line.shape[1] + 2 * margin), bool)
    page[margin : margin + CELL_H, margin : margin + line.shape[1]] = line
    boxes, x = [], margin
    for ch in text:
        w = glyph_width(ch)
        boxes.append(TruthBox(ch, x, margin, x + w, margin + CELL_H))
        x += w + KERN
    return mask_to_gray(page), boxes, page.shape[0]


def test_box_file_roundtrip_flips_y():
    _gray, boxes, H = _page_with_truth("abc")
    text = make_box_file(boxes, H)
    # file stores bottom-up: first record's bottom = H - box.bottom
    first = text.splitlines()[0].split()
    assert first[0] == "a" and int(first[2]) == H - boxes[0].bottom
    back = parse_box_file(text, H)
    assert [(b.ch, b.left, b.top, b.right, b.bottom) for b in back] == [
        (b.ch, b.left, b.top, b.right, b.bottom) for b in boxes
    ]


def test_malformed_lines_skipped():
    assert parse_box_file("garbage\nx 1 2\n", 100) == []
    got = parse_box_file("a 1 2 3 4 0\nnonsense line here\nb 5 6 7 8 0", 100)
    assert [b.ch for b in got] == ["a", "b"]


def test_apply_boxes_claims_each_glyph():
    gray, boxes, _H = _page_with_truth("wind")
    samples, failed, strays = align_boxes_to_blobs(gray, boxes)
    assert failed == [] and strays == 0
    assert [s.ch for s in samples] == ["w", "i", "n", "d"]
    font = get_font()
    for s in samples:
        g = font[s.ch]
        ys, xs = np.nonzero(g)
        trimmed = g[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
        assert (s.bitmap == trimmed).all(), s.ch


def test_apply_boxes_reports_failures_and_strays():
    gray, boxes, _H = _page_with_truth("ab")
    # a box over empty space fails; the 'b' glyph becomes a stray
    bad = [boxes[0], TruthBox("z", 0, 0, 5, 5)]
    samples, failed, strays = align_boxes_to_blobs(gray, bad)
    assert [s.ch for s in samples] == ["a"]
    assert [b.ch for b in failed] == ["z"]
    assert strays >= 1  # the unclaimed 'b'
