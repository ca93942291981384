"""VGSL network stack tests (networkbuilder.h grammar; lstm.cpp forward;
stridemap.cpp width bucketing)."""

import numpy as np
import pytest

from tesseract_spark.lstm.ctc import greedy_decode
from tesseract_spark.lstm.vgsl import VGSLNetwork, bucket_by_width

SPEC = "[1,16,0,1 Ct3,3,8 Mp2,2 Lbx24 O1c75]"


def test_parse_reference_style_spec():
    # the shape family the reference ships (tessdata eng.traineddata uses
    # [1,36,0,1 Ct3,3,16 Mp3,3 Lfys64 Lfx96 Lrx96 Lfx512 O1c1]-style specs)
    net = VGSLNetwork("[1,36,0,1 Ct3,3,16 Mp3,3 Lfys64 Lfx96 Lrx96 Lfx512 O1c105]")
    kinds = [l.kind for l in net.layers]
    assert kinds == ["conv", "maxpool", "lstm_y_summary", "lstm_x", "lstm_x",
                     "lstm_x", "output"]
    assert net.n_classes == 105


def test_forward_shapes_and_logsoftmax():
    net = VGSLNetwork(SPEC)
    x = np.random.default_rng(0).random((3, 16, 64, 1), dtype=np.float32)
    out = net.forward(x)
    assert out.shape == (3, 32, 75)  # Mp2,2 halves width; O1c75 classes
    # rows are log-softmax: exp sums to 1
    s = np.exp(out).sum(axis=-1)
    assert np.allclose(s, 1.0, atol=1e-4)


def test_forward_deterministic():
    a = VGSLNetwork(SPEC).forward(np.ones((1, 16, 32, 1), dtype=np.float32))
    b = VGSLNetwork(SPEC).forward(np.ones((1, 16, 32, 1), dtype=np.float32))
    assert np.array_equal(a, b)


def test_bidi_differs_from_forward_only():
    bi = VGSLNetwork("[1,16,0,1 Lbx8 O1c20]")
    fw = VGSLNetwork("[1,16,0,1 Lfx8 O1c20]")
    x = np.random.default_rng(1).random((1, 16, 20, 1), dtype=np.float32)
    assert not np.array_equal(bi.forward(x), fw.forward(x))


def test_load_weights_roundtrip_and_validation():
    net = VGSLNetwork(SPEC)
    w = net.layers[0].weights["w"]
    net.load_weights({0: {"w": np.zeros_like(w)}})
    assert not net.layers[0].weights["w"].any()
    with pytest.raises(ValueError):
        net.load_weights({0: {"w": np.zeros((1, 1))}})


def test_constructed_lstm_recovers_sequence_via_ctc():
    """recodebeam_test-style: craft an output layer that copies a one-hot
    input through the stack; CTC-greedy must recover the encoded string."""
    net = VGSLNetwork("[1,4,0,1 O1c5]", seed=7)
    # output layer sees H*D=4 features; make class i fire on feature i
    w = np.zeros((5, 4), dtype=np.float32)
    for i in range(4):
        w[i, i] = 20.0
    b = np.zeros(5, dtype=np.float32)
    b[4] = 10.0  # blank wins when no feature fires
    net.load_weights({0: {"w": w, "b": b}})
    # encode 'abca' as one-hot columns with blank gaps
    seq = "abca"
    x = np.zeros((1, 4, 2 * len(seq), 1), dtype=np.float32)
    for t, ch in enumerate(seq):
        x[0, ord(ch) - 97, 2 * t, 0] = 1.0
    out = net.forward(x)
    assert greedy_decode(out[0], "abcd", 4) == seq


def test_bucket_by_width_stridemap():
    rng = np.random.default_rng(3)
    strips = [rng.random((16, w)) > 0.5 for w in (20, 31, 33, 100, 97)]
    buckets = bucket_by_width(strips, bucket_quantum=32)
    covered = sorted(i for idxs, _t in buckets for i in idxs)
    assert covered == [0, 1, 2, 3, 4]
    for idxs, t in buckets:
        assert t.shape[0] == len(idxs) and t.shape[3] == 1
        assert t.shape[2] % 32 == 0
        for j, i in enumerate(idxs):
            w = strips[i].shape[1]
            assert np.array_equal(t[j, :, :w, 0] > 0.5, strips[i])
            assert not t[j, :, w:, 0].any()  # padded tail masked to zero
