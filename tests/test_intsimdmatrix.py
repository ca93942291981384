"""Port of unittest/intsimdmatrix_test.cc.

The reference checks that every SIMD int8 MatrixDotVector kernel
(SSE/AVX2/...) matches the scalar C implementation over random
weights/inputs/scales across sizes 1..129 x 1..129.  Here the "SIMD
kernel" is numpy's int32 GEMV (int8_matrix_dot_vector) and the scalar
baseline is a literal per-element port of the C loop; the fixture's
exact TRand stream (and thus its -423243.392 checksum) is not
reproducible outside the reference, so the cross-implementation
equality contract is asserted over a seeded numpy stream instead.
"""

import numpy as np
import pytest

from tesseract_spark.lstm.vgsl import (
    VGSLNetwork,
    _quantize_rows,
    convert_to_int,
    int8_matrix_dot_vector,
)


def _scalar_matrix_dot_vector(w, scales, u):
    """IntSimdMatrix::MatrixDotVector generic C version
    (intsimdmatrix.cpp): per-row int accumulate, bias slot at 127."""
    no, ni1 = w.shape
    out = np.zeros(no, dtype=np.float64)
    for i in range(no):
        total = 0
        for j in range(ni1):
            uj = 127 if j == ni1 - 1 else (int(u[j]) if j < len(u) else 0)
            total += int(w[i, j]) * uj
        out[i] = total * float(scales[i])
    return out


def test_int8_gemv_matches_scalar_c_loop():
    rng = np.random.default_rng(42)
    total = 0.0
    for num_out in range(1, 130, 17):
        for num_in in range(1, 130, 13):
            w = rng.integers(-127, 128, (num_out, num_in + 1)).astype(np.int8)
            u = rng.integers(-127, 128, num_in).astype(np.int8)
            scales = (1.0 + rng.uniform(-1, 1, num_out)) / 127.0
            base = _scalar_matrix_dot_vector(w, scales, u)
            fast = int8_matrix_dot_vector(w, scales, u)
            assert np.allclose(base, fast, rtol=0, atol=0), (num_out, num_in)
            total += base.sum()
    # integer accumulation is exact: the sweep's checksum reproduces
    # bit-for-bit across runs (the reference's
    # EXPECT_FLOAT_EQ(total, -423243.392) with its own TRand stream)
    assert total == pytest.approx(8268.237552010192, abs=1e-9)


def test_int8_path_matches_dequantized_float_path():
    """WeightMatrix int mode contract: computing with int8 weights +
    scales equals multiplying the dequantized float weights (exactly,
    because both sides are the same integers times the same scale)."""
    rng = np.random.default_rng(3)
    w8 = rng.integers(-127, 128, (6, 10)).astype(np.int8)
    scales = (1.0 + rng.uniform(-1, 1, 6)) / 127.0
    u = rng.integers(-127, 128, 9).astype(np.int8)
    int_out = int8_matrix_dot_vector(w8, scales, u)
    wf = w8.astype(np.float64) * scales[:, None]
    u_full = np.concatenate([u.astype(np.float64), [127.0]])
    float_out = wf @ u_full
    assert np.allclose(int_out, float_out, rtol=1e-12)


def test_quantize_rows_roundtrip_error_bound():
    """ConvertToInt's scale construction: each dequantized weight is
    within scale/2 = max_abs/254 of the original."""
    rng = np.random.default_rng(11)
    w = rng.normal(0, 0.5, (8, 20)).astype(np.float32)
    q = _quantize_rows(w)
    tol = np.abs(w).max(axis=1, keepdims=True) / 127.0 / 2 + 1e-7
    assert np.all(np.abs(w - q) <= tol)


def test_converted_net_forward_close_to_float():
    """End-to-end: an int8-converted net's forward stays close to the
    float net's (the inference-side half of TestIntMode)."""
    net_f = VGSLNetwork("[1,1,0,8 Ct1,3,6 Lbx8 O1c12]", seed=7)
    net_i = VGSLNetwork("[1,1,0,8 Ct1,3,6 Lbx8 O1c12]", seed=7)
    convert_to_int(net_i)
    x = np.random.default_rng(0).random((2, 1, 24, 8), dtype=np.float32)
    a, b = net_f.forward(x), net_i.forward(x)
    # near-uniform random-net logits make argmax tie-flippy; the
    # TestIntMode error gate lives in test_lstm_recode_squashed — here
    # only the log-prob perturbation bound is asserted
    assert np.abs(a - b).max() < 0.2
