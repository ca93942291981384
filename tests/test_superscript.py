"""Sub/superscript correction pass (src/ccmain/superscript.cpp).

Fixtures paste a scaled-down raised (or lowered) digit run against a word
edge — the footnote-marker shape of superscript.cpp's own motivating
example ("speaker.^{21}", :130) — and expect the split/re-recognize/paste
pipeline to decode the marker and flag it, while normal punctuation and
plain pages stay untouched.
"""

import numpy as np

from tesseract_spark.functions.fonts import mask_to_gray, render_line
from tesseract_spark.operators.recognize import (
    recognize_page,
    recognize_page_detail,
)


def _paste(canvas: np.ndarray, mask: np.ndarray, y: int, x: int) -> None:
    h, w = mask.shape
    canvas[y : y + h, x : x + w] |= mask


def _marker_page(kind: str) -> np.ndarray:
    """'the speaker<marker> said' at scale 2 with a scale-1 digit marker.

    super: marker bottom 8 px above the baseline (>= 0.3 * x_height = 4.8,
    superscript_min_y_bottom).  sub: marker top 6 px above the baseline
    (<= 0.5 * x_height = 8, subscript_max_y_top) extending below it.
    """
    canvas = np.zeros((72, 640), dtype=bool)
    part1 = render_line("the speaker", scale=2)
    marker = render_line("21" if kind == "super" else "34", scale=1)
    part2 = render_line("said", scale=2)
    x0, y0 = 10, 10  # main-row baseline at page y = 10 + 24 = 34
    _paste(canvas, part1, y0, x0)
    xm = x0 + part1.shape[1] + 2  # 2 px kern: marker joins the word box
    if kind == "super":
        _paste(canvas, marker, 14, xm)  # digit ink rows 14..25, bottom 26
    else:
        _paste(canvas, marker, 28, xm)  # ink rows 28..39: 6 below baseline
    _paste(canvas, part2, y0, xm + marker.shape[1] + 12)
    return mask_to_gray(canvas)


def test_superscript_footnote_marker_decodes_and_flags():
    spans, words, _layout = recognize_page_detail(_marker_page("super"))
    texts = [s.text for s in spans if s.kind == "text"]
    assert texts == ["the speaker21 said"]
    target = [w for w in words if w.text == "speaker21"]
    assert len(target) == 1
    assert target[0].script_pos == "trail:super:2"
    # the other words carry no flags
    assert all(w.script_pos == "" for w in words if w.text != "speaker21")


def test_subscript_marker_decodes_and_flags():
    spans, words, _layout = recognize_page_detail(_marker_page("sub"))
    texts = [s.text for s in spans if s.kind == "text"]
    assert texts == ["the speaker34 said"]
    target = [w for w in words if w.text == "speaker34"]
    assert len(target) == 1
    assert target[0].script_pos == "trail:sub:2"


def test_word_box_shrinks_to_normal_glyphs():
    """split_word chops the outlier blobs off the WERD: the flagged
    word's layout box must not extend over the marker ink."""
    _spans, words, layout = recognize_page_detail(_marker_page("super"))
    target = [w for w in words if w.text == "speaker21"][0]
    part1_w = render_line("the speaker", scale=2).shape[1]
    assert target.left + target.width <= 10 + part1_w  # box ends at 'r'


def test_punctuation_and_plain_pages_unaffected():
    """Normal baseline punctuation must not be mistaken for a subscript
    (BelievableSuperscript rejects punctuation; geometrically the run's
    own scale equals the row scale so it is never a candidate)."""
    page = mask_to_gray(
        np.pad(render_line("he said hello, then left.", scale=2),
               ((10, 10), (10, 10)))
    )
    spans, _layout = recognize_page(page)
    assert [s.text for s in spans] == ["he said hello, then left."]

    spans2, words2, _l = recognize_page_detail(_marker_page("super"))
    # leading word and trailing word survive with exact text
    assert [w.text for w in words2] == ["the", "speaker21", "said"]


def test_markers_on_both_edges_of_one_word():
    """Lead AND trail markers on the same word: the second edge's box
    shrink must exclude the FIRST run's already-split glyphs, or the
    word box re-expands over erased columns (wrong bbox/blank counts)."""
    import numpy as np

    from tesseract_spark.functions.fonts import mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page_detail

    def paste(c, m, y, x):
        c[y : y + m.shape[0], x : x + m.shape[1]] |= m

    canvas = np.zeros((120, 760), dtype=bool)
    lead, core, trail = (
        render_line("12", 1),
        render_line("speaker", 2),
        render_line("34", 1),
    )
    pre, post = render_line("the", 2), render_line("said", 2)
    x0, y0 = 40, 40
    paste(canvas, pre, y0, x0)
    x = x0 + pre.shape[1] + 14
    paste(canvas, lead, y0 + 4, x)
    x += lead.shape[1] + 2
    paste(canvas, core, y0, x)
    core_l, core_r = x, x + core.shape[1]
    x += core.shape[1] + 2
    paste(canvas, trail, y0 + 4, x)
    x += trail.shape[1] + 14
    paste(canvas, post, y0, x)
    spans, words, _l = recognize_page_detail(mask_to_gray(canvas))
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "the 12speaker34 said")
    ]
    w = next(w for w in words if "speaker" in w.text)
    assert w.script_pos == "lead:super:2,trail:super:2"
    # word box = exactly the normal-glyph extent, neither marker run
    assert (w.left, w.left + w.width) == (core_l, core_r)
