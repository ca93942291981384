"""Ports of unittest/matrix_test.cc and unittest/networkio_test.cc.

Both reference tests pin tensor re-layout semantics the LSTM stack
depends on:

* ``GENERIC_2D_ARRAY::RotatingTranspose`` (matrix.h) rotates one axis
  of a flat tensor to a new position — ``np.moveaxis`` in this engine
  (the transposes inside vgsl._collapse_height / _lstm_over_y_summary).
* ``NetworkIO::CopyWithYReversal / CopyWithXReversal /
  CopyWithXYTranspose`` (networkio.cpp) re-walk a ragged batch of
  per-image tensors — the ``seq[:, ::-1]`` flips that implement Lrx /
  Lrys and the transpose of the y-summary layer.  (The reference test
  is TF-gated — GTEST_SKIP without INCLUDE_TENSORFLOW — but its
  expected-value tables are plain data, asserted here against numpy.)

Every expected sequence below is copied from the reference fixtures.
"""

import numpy as np

# ------------------------------------------------------- matrix_test.cc
# src_ is [0..119] viewed as dims [5, 4, 3, 2].


def _rotating_transpose(dims, src, dest):
    a = np.arange(int(np.prod(dims))).reshape(dims)
    return np.moveaxis(a, src, dest).ravel()


def test_rotating_transpose_3_1():
    # dims [5,4,3,2] -> [5,2,4,3]; result viewed as (40, 3).
    m = _rotating_transpose([5, 4, 3, 2], 3, 1).reshape(40, 3)
    assert m[0, 0] == 0 and m[0, 1] == 2 and m[0, 2] == 4
    assert m[1, 0] == 6
    assert m[4, 0] == 1
    assert m[8, 0] == 24 and m[8, 1] == 26
    assert m[12, 0] == 25


def test_rotating_transpose_2_0():
    # dims [5,4,3,2] -> [3,5,4,2]; result viewed as (60, 2).
    m = _rotating_transpose([5, 4, 3, 2], 2, 0).reshape(60, 2)
    assert m[0, 0] == 0 and m[0, 1] == 1
    assert m[1, 0] == 6 and m[1, 1] == 7
    assert m[4, 0] == 24 and m[4, 1] == 25
    assert m[5, 0] == 30
    assert m[20, 0] == 2


def test_rotating_transpose_1_3():
    # dims [5,4,3,2] -> [5,3,2,4]; result viewed as (30, 4).
    m = _rotating_transpose([5, 4, 3, 2], 1, 3).reshape(30, 4)
    assert m[0, 0] == 0 and m[0, 1] == 6
    assert m[1, 0] == 1
    assert m[2, 0] == 2 and m[3, 0] == 3 and m[4, 0] == 4 and m[5, 0] == 5
    assert m[6, 0] == 24 and m[6, 1] == 30


def test_rotating_transpose_0_2():
    # dims [5,4,3,2] -> [4,3,5,2]; result viewed as (60, 2).
    m = _rotating_transpose([5, 4, 3, 2], 0, 2).reshape(60, 2)
    assert m[0, 0] == 0 and m[0, 1] == 1
    assert m[1, 0] == 24 and m[1, 1] == 25
    assert m[4, 0] == 96 and m[4, 1] == 97
    assert m[5, 0] == 2
    assert m[15, 0] == 6


# ---------------------------------------------------- networkio_test.cc
# A ragged batch of two "images": 3x4 starting at 0, 4x5 starting at 12.


def _images():
    a = np.arange(12).reshape(3, 4)
    b = 12 + np.arange(20).reshape(4, 5)
    return [a, b]


def _walk(images):
    """Batch-major raster walk — StrideMap::Index iteration order."""
    return [int(v) for img in images for v in img.ravel()]


def test_copy_with_y_reversal():
    # networkio_test.cc:116-119 expected_values.
    expected = [8, 9, 10, 11, 4, 5, 6, 7, 0, 1, 2,
                3, 27, 28, 29, 30, 31, 22, 23, 24, 25, 26,
                17, 18, 19, 20, 21, 12, 13, 14, 15, 16]
    flipped = [img[::-1] for img in _images()]
    assert _walk(flipped) == expected


def test_copy_with_x_reversal():
    # networkio_test.cc:149-152.
    expected = [3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9,
                8, 16, 15, 14, 13, 12, 21, 20, 19, 18, 17,
                26, 25, 24, 23, 22, 31, 30, 29, 28, 27]
    flipped = [img[:, ::-1] for img in _images()]
    assert _walk(flipped) == expected


def test_copy_with_xy_transpose():
    # networkio_test.cc:183-186.
    expected = [0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7,
                11, 12, 17, 22, 27, 13, 18, 23, 28, 14, 19,
                24, 29, 15, 20, 25, 30, 16, 21, 26, 31]
    transposed = [img.T for img in _images()]
    assert _walk(transposed) == expected


def test_reversal_matches_lrx_flip():
    """The Lrx implementation's seq[:, ::-1] is exactly the
    CopyWithXReversal walk on a 1-high image."""
    img = np.arange(7)[None, :]  # 1 x 7 image
    assert _walk([img[:, ::-1]]) == list(range(6, -1, -1))
