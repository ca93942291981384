"""Legacy chop-and-search slice (src/wordrec/chopper.cpp:385,
src/wordrec/segsearch.cpp:33).

Two glyphs rendered with no kern gap fuse into one ink run; the template
path's maximal munch matches the left glyph and never evaluates the right
one (its start column has an inked left neighbour, so it is never a
candidate glyph start).  The chop pass re-segments the run against the
static bank and decodes both.
"""

import numpy as np

from tesseract_spark.functions.fonts import get_font, mask_to_gray
from tesseract_spark.lstm.ctc import ctc_beam_decode
from tesseract_spark.lstm.templates import get_net
from tesseract_spark.operators.recognize import recognize_page


def _joined(chars: str) -> np.ndarray:
    """Render chars with zero kern: one fused ink run (every glyph has
    ink on its mid-band edge columns, so adjacent glyphs touch)."""
    font = get_font()
    return np.concatenate([font[c] for c in chars], axis=1)


def _strip_of(mask: np.ndarray, width: int = None) -> np.ndarray:
    out = np.zeros((16, mask.shape[1] + 8), dtype=bool)
    out[:, 4 : 4 + mask.shape[1]] = mask
    return out


def test_template_path_alone_misses_joined_glyph():
    """Baseline behavior the chop exists to fix: maximal munch over
    candidate starts sees only the first glyph of a fused pair."""
    net = get_net()
    strip = _strip_of(_joined("rn"))
    cand_xs, _sc = net.match_scores(strip)
    assert len(cand_xs) == 1  # 'n' start is not a candidate: no blank gap


def test_chop_decodes_fused_pair():
    net = get_net()
    strip = _strip_of(_joined("rn"))
    log_probs, _c, _f, dropped = net.forward(strip)
    text, _w, _cert = ctc_beam_decode(
        log_probs, net.charset, net.blank, net.space_code, None
    )
    assert text == "rn"
    assert len(dropped) == 0


def test_chop_run_returns_believable_segmentation_only():
    net = get_net()
    # a single intact glyph must NOT be chopped into pieces
    strip = _strip_of(get_font()["m"])
    assert net.chop_run(strip, 4, 4 + get_font()["m"].shape[1]) is None
    # a fused triple tiles into three pieces
    strip3 = _strip_of(_joined("rnm"))
    pieces = net.chop_run(strip3, 4, 4 + strip3[:, 4:].any(axis=0).sum())
    assert pieces is not None and len(pieces) == 3
    codes = [net.charset[c] for _x, c, _f, _w in pieces]
    assert codes == ["r", "n", "m"]


def test_page_with_fused_word_decodes():
    """End-to-end: a page whose word contains a fused glyph pair reads
    exactly (the OEM_TESSERACT_ONLY joined-blob scenario)."""
    from tesseract_spark.functions.fonts import render_line

    font = get_font()
    lead = render_line("the big ", scale=1)
    fused = _joined("rn")  # 'rn' fused: looks like one wide blob
    canvas = np.zeros((40, lead.shape[1] + fused.shape[1] + 40), dtype=bool)
    canvas[12:28, 10 : 10 + lead.shape[1]] |= lead
    canvas[12:28, 10 + lead.shape[1] :][:, : fused.shape[1]] |= fused
    spans, _layout = recognize_page(mask_to_gray(canvas))
    assert [s.text for s in spans] == ["the big rn"]


def test_one_row_glyph_jitter_tolerated():
    """A glyph sitting one row off the strip baseline (residual
    quantized-shear jitter the page deskew cannot always remove) still
    decodes: failed static candidates retry on ±1-row-shifted windows —
    the integer matcher's quantized displacement tolerance."""
    import numpy as np

    from tesseract_spark.functions.fonts import render_line
    from tesseract_spark.lstm.ctc import greedy_decode
    from tesseract_spark.lstm.templates import get_net

    lm = render_line("brown fox", 1)
    strip = np.zeros((16, lm.shape[1]), dtype=bool)
    strip[: lm.shape[0]] = lm
    net = get_net()
    col_ink = strip.any(axis=0)
    starts = np.flatnonzero(col_ink & np.r_[True, ~col_ink[:-1]])
    ends = np.flatnonzero(col_ink & np.r_[~col_ink[1:], True]) + 1
    for direction in (1, -1):
        jit = strip.copy()
        l, r = int(starts[1]), int(ends[1])  # second glyph only
        if direction == 1:
            jit[:, l:r] = np.vstack(
                [np.zeros((1, r - l), bool), strip[:-1, l:r]]
            )
        else:
            jit[:, l:r] = np.vstack(
                [strip[1:, l:r], np.zeros((1, r - l), bool)]
            )
        lp, *_ = net.forward(jit)
        assert greedy_decode(lp, net.charset, net.blank) == "brown fox"
