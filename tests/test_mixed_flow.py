"""Per-blob textline flow + mixed-direction pages
(src/textord/strokewidth.cpp:812-1175 FindTextlineFlowDirection /
SetNeighbourFlows / SmoothNeighbourTypes re-expression).

The reference types each blob's flow from neighbour gaps so a page can
carry BOTH directions (vertical sidebar beside horizontal body); the
page-global vote alone (is_vertical_page) cannot represent that."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font, mask_to_gray, render_line
from tesseract_spark.operators.vertical import (
    blob_flows,
    flow_bands,
    recognize_page_auto,
)


def _boxes_row(n, w=8, h=10, gap=2, x0=0, y0=0):
    return [(x0 + i * (w + gap), y0, x0 + i * (w + gap) + w, y0 + h, w * h)
            for i in range(n)]


def _boxes_col(n, w=8, h=10, gap=2, x0=0, y0=0):
    return [(x0, y0 + i * (h + gap), x0 + w, y0 + i * (h + gap) + h, w * h)
            for i in range(n)]


def test_blob_flows_horizontal_rows():
    stats = np.array(_boxes_row(8) + _boxes_row(8, y0=30), float)
    flows = blob_flows(stats)
    assert (flows == "h").all()


def test_blob_flows_vertical_columns():
    stats = np.array(_boxes_col(8) + _boxes_col(8, x0=30), float)
    flows = blob_flows(stats)
    assert (flows == "v").all()


def test_blob_flows_mixed_bands():
    # horizontal block on the left, vertical column far right
    h_blobs = _boxes_row(7) + _boxes_row(7, y0=30) + _boxes_row(7, y0=60)
    v_blobs = _boxes_col(7, x0=200)
    stats = np.array(h_blobs + v_blobs, float)
    flows = blob_flows(stats)
    nh = (flows[: len(h_blobs)] == "h").sum()
    nv = (flows[len(h_blobs):] == "v").sum()
    assert nh >= len(h_blobs) * 3 // 4
    assert nv >= len(v_blobs) * 3 // 4
    bands = flow_bands(stats, flows)
    assert [b[0] for b in bands] == ["h", "v"]
    assert bands[0][1] < bands[1][1]  # left-to-right order


def _mixed_page():
    """Horizontal paragraph left, vertical glyph column right."""
    font = get_font()
    lines = [render_line(t, 1) for t in ["the cat sat", "on the mat"]]
    col_chars = "dog"
    col_glyphs = [font[c] for c in col_chars]
    w_h = max(m.shape[1] for m in lines)
    col_w = max(g.shape[1] for g in col_glyphs)
    gap = 40
    H = max(2 * CELL_H + 30, len(col_glyphs) * (CELL_H + 4) + 20)
    W = 12 + w_h + gap + col_w + 12
    page = np.zeros((H, W), dtype=bool)
    y = 10
    for m in lines:
        page[y:y + m.shape[0], 12:12 + m.shape[1]] = m
        y += m.shape[0] + 10
    x_col = 12 + w_h + gap
    y = 10
    for g in col_glyphs:
        page[y:y + g.shape[0], x_col:x_col + g.shape[1]] = g
        y += CELL_H + 4
    return mask_to_gray(page), col_chars


def test_mixed_page_decodes_both_flows():
    gray, col_chars = _mixed_page()
    spans, _layout = recognize_page_auto(gray)
    texts = [s.text for s in spans if s.kind == "text" and s.text]
    joined = " ".join(texts)
    assert "the cat sat" in joined
    assert "on the mat" in joined
    assert col_chars in texts  # the vertical column reads top-to-bottom


def test_pure_horizontal_page_unaffected():
    """The mixed-flow path must not trigger on a normal paragraph."""
    from tesseract_spark.operators.recognize import recognize_page

    lines = [render_line(t, 1) for t in ["plain text here", "second line"]]
    W = max(m.shape[1] for m in lines) + 24
    H = sum(m.shape[0] for m in lines) + 30
    page = np.zeros((H, W), dtype=bool)
    y = 10
    for m in lines:
        page[y:y + m.shape[0], 12:12 + m.shape[1]] = m
        y += m.shape[0] + 10
    gray = mask_to_gray(page)
    auto_spans, _ = recognize_page_auto(gray)
    direct_spans, _ = recognize_page(gray)
    assert [s.text for s in auto_spans] == [s.text for s in direct_spans]
