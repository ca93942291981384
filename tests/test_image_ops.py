"""Unit tests: PNG codec, binarization, connected components, stroke width."""

import numpy as np
import pytest

from tesseract_spark.functions.image_ops import (
    binarize_adaptive_otsu,
    binarize_otsu,
    binarize_sauvola,
    component_stats,
    label_components,
    otsu_threshold,
    stroke_widths,
)
from tesseract_spark.functions.png_codec import decode_gray_png, encode_gray_png


def test_png_roundtrip():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    assert (decode_gray_png(encode_gray_png(img)) == img).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gray_png(b"not a png")


def test_otsu_bimodal_split():
    # two clear classes at 40 and 200 -> threshold between them
    img = np.full((50, 50), 200, dtype=np.uint8)
    img[:25] = 40
    t = otsu_threshold(img)
    assert 40 <= t < 200


def test_otsu_polarity_inverted():
    img = np.full((30, 60), 20, dtype=np.uint8)  # dark background
    img[10:20, 10:50] = 235  # light ink
    ink = binarize_otsu(img)
    assert ink[15, 30] and not ink[0, 0]


def test_adaptive_otsu_gradient_background():
    # linear illumination gradient defeats a global threshold
    h, w = 64, 256
    grad = np.tile(np.linspace(60, 220, w), (h, 1))
    img = grad.astype(np.uint8)
    img[20:40, 16:48] = 10  # dark mark on the dark side
    img[20:40, 208:240] = 150  # locally-dark mark on the bright side
    ink = binarize_adaptive_otsu(img, tile=32)
    assert ink[30, 30] and ink[30, 220]


def test_sauvola_local_threshold():
    img = np.full((40, 120), 200, dtype=np.uint8)
    img[10:20, 10:30] = 30
    ink = binarize_sauvola(img, window=15, k=0.2)
    assert ink[15, 20] and not ink[5, 60]


def test_label_components_counts_and_boxes():
    m = np.zeros((10, 12), dtype=bool)
    m[1:3, 1:4] = True  # comp A
    m[5:9, 6:8] = True  # comp B
    m[0, 11] = True  # comp C (single pixel)
    labels, n = label_components(m)
    assert n == 3
    st = component_stats(labels, n)
    boxes = {tuple(r[:4]) for r in st}
    assert (1, 1, 4, 3) in boxes and (6, 5, 8, 9) in boxes and (11, 0, 12, 1) in boxes


def test_label_components_diagonal_8conn():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = m[1, 1] = m[2, 2] = True
    _, n8 = label_components(m, connectivity=8)
    _, n4 = label_components(m, connectivity=4)
    assert n8 == 1 and n4 == 3


def test_stroke_widths():
    m = np.zeros((20, 20), dtype=bool)
    m[2:18, 5:8] = True  # 3-wide vertical bar, 16 tall
    labels, n = label_components(m)
    hw, vw = stroke_widths(m, labels, n)
    assert hw[0] == 3.0 and vw[0] == 16.0
