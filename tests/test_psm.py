"""PSM routing (ProcessPage + publictypes.h:186-207 stage gating;
pagesegmode_test.cc:73 analogue)."""

import numpy as np

from tesseract_spark import config as C
from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.operators.recognize import process_page

SINGLE = PageSpec(paragraphs=[["hello world", "second line"]])
TWO_COL = PageSpec(
    paragraphs=[["left one", "left two"]], column2=[["right one", "right two"]]
)


def test_psm_auto_default():
    page = compose_page(SINGLE)
    spans, layout = process_page(page.image)
    assert [s.text for s in spans] == ["hello world\nsecond line"]
    assert layout is not None


def test_psm_osd_only():
    page = compose_page(SINGLE)
    spans, layout = process_page(page.image, psm=C.PSM_OSD_ONLY)
    assert layout is None
    assert "Orientation in degrees: 0" in spans[0].text
    assert "Script: Latin" in spans[0].text


def test_psm_auto_osd_all_rotations():
    page = compose_page(SINGLE)
    for k in range(4):
        spans, _ = process_page(
            np.rot90(page.image, k=k), psm=C.PSM_AUTO_OSD
        )
        assert [s.text for s in spans] == ["hello world\nsecond line"], k


def test_psm_single_column_merges_columns():
    page = compose_page(TWO_COL)
    spans_auto, _ = process_page(page.image)
    assert len([s for s in spans_auto if s.kind == "text"]) == 2
    spans_sc, _ = process_page(page.image, psm=C.PSM_SINGLE_COLUMN)
    texts = [s.text for s in spans_sc if s.kind == "text"]
    assert texts == ["left one right one\nleft two right two"]


def test_psm_line_and_word_modes():
    page = compose_page(SINGLE)
    spans_l, _ = process_page(page.image, psm=C.PSM_SINGLE_LINE)
    assert [s.text for s in spans_l] == ["hello world"]
    spans_r, _ = process_page(page.image, psm=C.PSM_RAW_LINE)
    assert [s.text for s in spans_r] == ["hello world"]
    spans_w, _ = process_page(page.image, psm=C.PSM_SINGLE_WORD)
    assert [s.text for s in spans_w] == ["hello"]


def test_psm_circle_word():
    from test_circle_unlv_rect import _circled_word

    spans, _ = process_page(_circled_word("coin"), psm=C.PSM_CIRCLE_WORD)
    assert [s.text for s in spans if s.kind == "text"] == ["coin"]
