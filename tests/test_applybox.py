"""Port of unittest/applybox_test.cc.

The reference renders Times New Roman pages and verifies ApplyBoxes via
the full API (truth text match + per-symbol major_overlap against the
.box file).  The sandbox has no Times raster, so the page is rendered
with the fixture font and the truth .box records are derived from the
SAME advance model the renderer uses — the assertions are the
reference's own (VerifyBoxesAndText, applybox_test.cc:60-100):

* recognized text equals the truth string exactly;
* every recognized symbol's box major-overlaps its truth box;
* every symbol's text equals the truth box's character;
* line mode: a single line-level box claims the whole line's blobs
  (tessedit_resegment_from_line_boxes merges each line into one word,
  which is why the reference's line-mode truth is the unspaced
  kTruthTextLine).
"""

import numpy as np

from tesseract_spark.functions.fonts import (
    CELL_H,
    KERN,
    WORD_GAP,
    glyph_width,
    mask_to_gray,
    render_line,
)
from tesseract_spark.functions.rect import TBOX
from tesseract_spark.operators.recognize import recognize_page_detail
from tesseract_spark.sources.boxfile import (
    TruthBox,
    align_boxes_to_blobs,
    make_box_file,
    parse_box_file,
)

K_TRUTH_TEXT_WORDS = "to simple burn running of goods lately"
K_TRUTH_TEXT_LINE = K_TRUTH_TEXT_WORDS.replace(" ", "")
MARGIN = 12


def _page_and_truth(text: str):
    """Render one line and derive char-level truth boxes (top-down page
    coords) from the renderer's advance model."""
    mask = render_line(text, 1)
    h = mask.shape[0] + 2 * MARGIN
    w = mask.shape[1] + 2 * MARGIN
    page = np.zeros((h, w), dtype=bool)
    page[MARGIN:MARGIN + mask.shape[0], MARGIN:MARGIN + mask.shape[1]] = mask
    boxes = []
    x = MARGIN
    for i, ch in enumerate(text):
        if ch == " ":
            x += WORD_GAP
            continue
        gw = glyph_width(ch)
        boxes.append(TruthBox(ch, x, MARGIN, x + gw, MARGIN + CELL_H))
        x += gw + (KERN if i + 1 < len(text) and text[i + 1] != " " else 0)
    return mask_to_gray(page), boxes, h


def _symbol_boxes(words):
    """Split recognized word boxes into per-symbol boxes with the engine
    advance model — the scalar form of the to_box_chars sink."""
    out = []
    for wrec in words:
        advances = [glyph_width(c) for c in wrec.text]
        total = sum(advances) + KERN * (len(advances) - 1)
        scale = wrec.width / max(total, 1)
        run = 0
        for c, adv in zip(wrec.text, advances):
            left = wrec.left + run * scale
            right = wrec.left + (run + adv) * scale
            out.append((c, TBOX(int(left), wrec.top,
                                int(right), wrec.top + wrec.height)))
            run += adv + KERN
    return out


def test_char_level_boxes_and_text():
    """TimesCharLevel (applybox_test.cc:103-105): truth text + per-symbol
    major_overlap + symbol/box text equality."""
    gray, truth, _h = _page_and_truth(K_TRUTH_TEXT_WORDS)
    spans, words, _layout = recognize_page_detail(gray)
    text = " ".join(w.text for w in words)
    assert text == K_TRUTH_TEXT_WORDS
    symbols = _symbol_boxes(words)
    assert len(symbols) == len(truth)
    for (ch, box), tb in zip(symbols, truth):
        assert ch == tb.ch
        truth_box = TBOX(tb.left, tb.top, tb.right, tb.bottom)
        assert box.major_overlap(truth_box), (ch, box, truth_box)


def test_box_file_roundtrip_preserves_truth():
    """The truth boxes survive MakeBoxFileStr -> ReadAllBoxes
    (boxread.cpp round trip used by the reference test's box reader)."""
    _gray, truth, h = _page_and_truth(K_TRUTH_TEXT_WORDS)
    text = make_box_file(truth, page_height=h)
    back = parse_box_file(text, page_height=h)
    assert [(b.ch, b.left, b.top, b.right, b.bottom) for b in back] == [
        (b.ch, b.left, b.top, b.right, b.bottom) for b in truth
    ]


def test_line_level_box_claims_whole_line():
    """TimesLineLevel: one line-spanning truth box claims every blob —
    the merged single word whose text is the unspaced truth string."""
    gray, truth, _h = _page_and_truth(K_TRUTH_TEXT_WORDS)
    line_box = TruthBox(
        K_TRUTH_TEXT_LINE,
        min(b.left for b in truth),
        min(b.top for b in truth),
        max(b.right for b in truth),
        max(b.bottom for b in truth),
    )
    samples, failed, strays = align_boxes_to_blobs(gray, [line_box])
    assert failed == [] and strays == 0
    assert len(samples) == 1
    assert samples[0].ch == K_TRUTH_TEXT_LINE
    # the claimed blob count equals the page's non-space glyph count
    # (every glyph in this font is one connected component)
    assert samples[0].n_blobs == len(truth)


def test_char_level_alignment_claims_each_glyph():
    """ItalicCharLevel's skeleton at fixture scale: per-char truth boxes
    each claim exactly their glyph, none fail, none stray."""
    gray, truth, _h = _page_and_truth("burn goods")
    samples, failed, strays = align_boxes_to_blobs(gray, truth)
    assert failed == [] and strays == 0
    assert [s.ch for s in samples] == [b.ch for b in truth]
    assert all(s.n_blobs == 1 for s in samples)
