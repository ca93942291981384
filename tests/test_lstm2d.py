"""True 2-D LSTM quad (L2xy) + Reconfig (S) — the VGSL families the
reference's own convergence suite trains with
(unittest/lstm_test.cc:52-110: '[1,32,0,1 S4,2 L2xy16 Ct1,1,16 S8,1
Lbx100 O1c1]').  Cell semantics: lstm.cpp Forward/Backward with Is2D —
five gates (CI/GI/GF1/GFS/GO), per-unit MAX-POOLED forget over the x-
and y-predecessor states, four direction-reversed passes in parallel
(networkbuilder.cpp BuildLSTMXYQuad)."""

import numpy as np

from tesseract_spark.functions.fonts import render_line
from tesseract_spark.lstm import tessdata as td
from tesseract_spark.lstm import training as T
from tesseract_spark.lstm.vgsl import VGSLNetwork


def test_reconfig_shapes_and_content():
    """S2,2 stacks 2x2 tiles into depth: [N,4,6,3] -> [N,2,3,12]."""
    net = VGSLNetwork("[1,4,0,3 S2,2 O1c5]")
    kinds = [l.kind for l in net.layers]
    assert kinds == ["reconfig", "output"]
    x = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    from tesseract_spark.lstm.vgsl import _reconfig

    out = _reconfig(x, net.layers[0])
    assert out.shape == (2, 2, 3, 12)
    # tile (0,0) of image 0 = rows 0-1, cols 0-1, all 3 channels,
    # X-MAJOR within the tile (reconfig.cpp:99: block (x*y_scale+y)*ni)
    expect = x[0, 0:2, 0:2, :].transpose(1, 0, 2).reshape(-1)
    np.testing.assert_array_equal(out[0, 0, 0], expect)


def test_l2xy_forward_shape_and_direction_sensitivity():
    net = VGSLNetwork("[1,6,0,1 L2xy4 O1c8]", seed=5)
    assert [l.kind for l in net.layers] == ["lstm_2d_quad", "output"]
    rng = np.random.default_rng(0)
    x = rng.random((2, 6, 10, 1), dtype=np.float32)
    from tesseract_spark.lstm.vgsl import _lstm_2d_quad

    out = _lstm_2d_quad(x, net.layers[0])
    assert out.shape == (2, 6, 10, 16)  # 4 directions x 4 units
    # flipping the input in x must NOT leave the output invariant
    # direction-for-direction (each pass has its own weights)
    out_flip = _lstm_2d_quad(x[:, :, ::-1], net.layers[0])
    assert not np.allclose(out[..., :4], out_flip[:, :, ::-1][..., :4])


def test_l2xy_y_recurrence_reaches_down_rows():
    """A perturbation on the TOP row must change the plain direction's
    output on the BOTTOM row (the y-recurrence path through GFS/why)."""
    net = VGSLNetwork("[1,5,0,1 L2xy3 O1c6]", seed=3)
    rng = np.random.default_rng(1)
    x = rng.random((1, 5, 7, 1), dtype=np.float32)
    from tesseract_spark.lstm.vgsl import _lstm_2d_quad

    base = _lstm_2d_quad(x, net.layers[0])
    x2 = x.copy()
    x2[:, 0, 3] += 1.0
    out2 = _lstm_2d_quad(x2, net.layers[0])
    assert not np.allclose(base[:, -1, :, :3], out2[:, -1, :, :3])


def test_2d_net_trains_and_converges():
    """Test2D / TestSquashed2D (lstm_test.cc:74-90) at fixture scale:
    the S/L2xy/Ct/S/Lbx stack's loss falls well below its start."""
    chars = " abcdefghijklmnop"
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list(chars.strip()), size=4))
             for _ in range(8)]
    strips = [render_line(t, 1) for t in texts]
    wmax = max(s.shape[1] for s in strips) + 4
    x = np.zeros((len(texts), 16, wmax, 1), np.float32)
    for i, s in enumerate(strips):
        x[i, :, 2:2 + s.shape[1], 0] = s
    n_classes = len(chars) + 1
    blank = len(chars)
    net = VGSLNetwork(
        f"[1,16,0,1 S4,2 L2xy6 Ct1,1,8 S4,1 Lbx16 O1c{n_classes}]", seed=5)
    slots = T.trainable_slots(net)
    adam = T.Adam(len(T.flatten(net, slots)), lr=0.03)
    labels = [[chars.index(c) for c in t] for t in texts]

    def mean_loss():
        logp = net.forward(x)
        return sum(T.ctc_loss_grad(logp[j], labels[j], blank)[0]
                   for j in range(len(labels))) / len(labels)

    loss0 = mean_loss()
    for _ in range(50):
        logp, caches = T.forward_cache(net, x)
        dlog = np.zeros_like(logp)
        for j in range(len(labels)):
            _, dlog[j] = T.ctc_loss_grad(logp[j], labels[j], blank)
        g = T.flatten_grads(T.backward(net, caches, dlog), slots)
        w = T.flatten(net, slots)
        T.unflatten(net, slots, adam.step(w, g / len(labels)))
    assert mean_loss() < 0.6 * loss0


def test_l2xy_and_reconfig_serialize_roundtrip():
    """Par2dLSTM tree + Reconfig survive the reference container format
    byte-exactly (BuildLSTMXYQuad tree: LSTM, XRev{LSTM},
    XRev{YRev{LSTM}}, YRev{LSTM}; five gate matrices each, GFS last)."""
    spec = "[1,8,0,1 S2,1 L2xy3 Lbx4 O1c6]"
    net = VGSLNetwork(spec, seed=11)
    blob = td.serialize_network(net)
    net2 = td.deserialize_network(td.Reader(blob), spec)
    for d in range(4):
        for k in ("wx", "whx", "why", "b"):
            np.testing.assert_array_equal(
                net.layers[1].weights[f"d{d}_{k}"],
                net2.layers[1].weights[f"d{d}_{k}"])
    x = np.random.default_rng(3).random((2, 8, 12, 1)).astype(np.float32)
    np.testing.assert_array_equal(net.forward(x), net2.forward(x))


def test_fc_layer_forward_and_roundtrip():
    """F<c><n> fully connected (networkbuilder BuildFullyConnected):
    height folds into depth, dense + nonlinearity per x step; container
    record under the nonlinearity's type name."""
    spec = "[1,4,0,1 Ft5 Fs3 O1c6]"
    net = VGSLNetwork(spec, seed=2)
    # H>1 before F inserts a real Reconfig (FCSeries,
    # networkbuilder.cpp:415-421)
    assert [l.kind for l in net.layers] == ["reconfig", "fc", "fc", "output"]
    x = np.random.default_rng(0).random((2, 4, 9, 1), dtype=np.float32)
    out = net.forward(x)
    assert out.shape == (2, 9, 6)
    blob = td.serialize_network(net)
    net2 = td.deserialize_network(td.Reader(blob), spec)
    np.testing.assert_array_equal(out, net2.forward(x))
    # tanh layer output bounded, sigmoid layer in (0,1)
    from tesseract_spark.lstm.vgsl import _fc, _reconfig
    h0 = _reconfig(x, net.layers[0])
    h1 = _fc(h0, net.layers[1])
    assert np.all(np.abs(h1) <= 1.0)
    h2 = _fc(h1, net.layers[2])
    assert np.all((h2 > 0) & (h2 < 1))
