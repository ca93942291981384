"""Fuzzy-space tests: gaps in the fuzzy band (tosp_fuzzy_space_factor,
src/textord/textord.cpp:98) are resolved against the dictionary post-decode,
the analogue of fix_fuzzy_spaces (src/ccmain/fixspace.cpp:74-214)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line
from tesseract_spark.lstm.dawg import Dawg
from tesseract_spark.lstm.templates import get_net
from tesseract_spark.operators.recognize import recognize_page

# canonical space threshold is WORD_GAP-1 = 5; fuzzy lower edge is
# max(2, round(0.6*5)) = 3, so a 4-px gap is fuzzy, a 6-px gap definite
FUZZY_GAP = 4
DEFINITE_GAP = 6


def _page_with_gap(w1: str, w2: str, gap: int) -> np.ndarray:
    m1, m2 = render_line(w1), render_line(w2)
    line = np.hstack([m1, np.zeros((CELL_H, gap), dtype=bool), m2])
    page = np.zeros((CELL_H + 24, line.shape[1] + 24), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + line.shape[1]] = line
    return mask_to_gray(page)


def _text(spans) -> list[str]:
    return [s.text for s in spans if s.kind == "text"]


def test_fuzzy_gap_splits_when_dict_prefers_split():
    dawg = Dawg(get_net().charset, ["to", "be"])
    spans, _ = recognize_page(_page_with_gap("to", "be", FUZZY_GAP), dawg=dawg)
    assert _text(spans) == ["to be"]


def test_fuzzy_gap_joins_without_dictionary():
    spans, _ = recognize_page(_page_with_gap("to", "be", FUZZY_GAP))
    assert _text(spans) == ["tobe"]


def test_fuzzy_gap_joins_when_joined_form_is_dict_word():
    dawg = Dawg(get_net().charset, ["to", "be", "tobe"])
    spans, _ = recognize_page(_page_with_gap("to", "be", FUZZY_GAP), dawg=dawg)
    assert _text(spans) == ["tobe"]


def test_fuzzy_gap_joins_when_either_side_is_not_a_word():
    dawg = Dawg(get_net().charset, ["be"])
    spans, _ = recognize_page(_page_with_gap("qx", "be", FUZZY_GAP), dawg=dawg)
    assert _text(spans) == ["qxbe"]


def test_definite_space_splits_without_dictionary():
    spans, _ = recognize_page(_page_with_gap("to", "be", DEFINITE_GAP))
    assert _text(spans) == ["to be"]


def test_word_boxes_merge_with_fuzzy_join():
    from tesseract_spark.operators.recognize import recognize_page_detail

    _spans, words, _layout = recognize_page_detail(
        _page_with_gap("to", "be", FUZZY_GAP)
    )
    assert [w.text for w in words] == ["tobe"]
    # merged box spans both sub-words: wider than either rendered word alone
    assert words[0].width > render_line("to").shape[1]
