"""Distributed CTC training (the lstmtraining analogue, lstm/training.py).

Covers src/training/lstmtraining.cpp + LSTMTrainer::TrainOnLine
(src/training/unicharset/lstmtrainer.cpp:266-310):

- CTC forward-backward gradient matches numerical differentiation
  exactly (the loss itself, not just the net);
- the full-net backward (conv tanh/relu, maxpool, LSTM fwd/rev/bidi
  BPTT, output softmax) matches numerical gradients on random specs;
- the distributed gradient (mapInPandas partition partials + driver
  sum) equals the single-process gradient on the same lines;
- a damaged output layer is recovered by distributed fine-tuning until
  the whole batch greedy-decodes exactly (--continue_from use case),
  and held-out lines decode exactly too;
- the tuned weights serialize through the REAL traineddata container
  and decode identically after reload.
"""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import CHARSET
from tesseract_spark.lstm import training as T
from tesseract_spark.lstm.fixture_model import build_fixture_net
from tesseract_spark.lstm.vgsl import VGSLNetwork

CHARS = CHARSET + " "
BLANK = len(CHARS)
WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five "
    "dozen liquor jugs"
).split()


def _lines(seed, n):
    rng = np.random.default_rng(seed)
    return [
        " ".join(rng.choice(WORDS, rng.integers(2, 5))) for _ in range(n)
    ]


def _lsm(z):
    m = z.max(-1, keepdims=True)
    e = np.exp(z - m)
    return (z - m) - np.log(e.sum(-1, keepdims=True))


def test_ctc_grad_matches_numerical():
    rng = np.random.default_rng(7)
    logits = rng.normal(0, 1, (6, 4))
    labels = [1, 2, 1]
    _loss, dl = T.ctc_loss_grad(_lsm(logits), labels, blank=3)
    num = np.zeros_like(logits)
    eps = 1e-6
    for i in range(6):
        for j in range(4):
            lp = logits.copy()
            lp[i, j] += eps
            lm = logits.copy()
            lm[i, j] -= eps
            num[i, j] = (
                T.ctc_loss_grad(_lsm(lp), labels, 3)[0]
                - T.ctc_loss_grad(_lsm(lm), labels, 3)[0]
            ) / (2 * eps)
    assert np.abs(dl - num).max() < 1e-5


def test_ctc_repeated_label_needs_blank():
    """'aa' requires a blank between emissions: a 2-frame sequence has
    zero probability (the skip-transition rule)."""
    logits = np.zeros((2, 3))
    loss, _ = T.ctc_loss_grad(_lsm(logits), [0, 0], blank=2)
    assert loss > 1e20  # -NEG_INF sentinel: impossible alignment


@pytest.mark.parametrize(
    "spec,x_shape,labels,blank",
    [
        ("[1,4,0,1 Ct3,3,3 Mp2,2 Cr1,3,4 O1c5]", (2, 4, 8, 1), [0, 2], 4),
        ("[1,1,0,3 Lfx4 O1c5]", (2, 1, 9, 3), [1, 2], 4),
        ("[1,1,0,3 Lrx4 O1c5]", (2, 1, 9, 3), [0, 3], 4),
        ("[1,1,0,3 Lbx3 O1c5]", (2, 1, 9, 3), [2, 1], 4),
        ("[1,4,0,1 Ct3,3,2 Mp2,2 Lbx3 O1c5]", (2, 4, 10, 1), [1, 2], 4),
        ("[1,4,0,1 Lfys3 Lfx4 O1c5]", (2, 4, 9, 1), [1, 2], 4),
        ("[1,4,0,1 Lrys3 O1c4]", (2, 4, 9, 1), [0, 2], 3),
        ("[1,6,0,1 Ct3,3,2 Mp2,2 Lfys3 Lbx3 O1c5]", (2, 6, 10, 1), [1, 2], 4),
        ("[1,4,0,1 S2,1 O1c5]", (2, 4, 6, 1), [1, 2], 4),
        ("[1,4,0,1 L2xy3 O1c6]", (2, 4, 7, 1), [1, 2], 5),
        ("[1,6,0,1 S2,1 L2xy2 Lbx3 O1c5]", (2, 6, 8, 1), [0, 2], 4),
        ("[1,4,0,1 Ft5 Lbx3 O1c5]", (2, 4, 7, 1), [1, 2], 4),
        ("[1,1,0,4 Fs6 Fr4 O1c5]", (2, 1, 8, 4), [0, 2], 4),
        # '('-parallel groups, R replication, Rx/Ry reversal wrappers
        # (ParseParallel/ParseR, networkbuilder.cpp:171-224)
        ("[1,1,0,3 (Lfx4 Lrx4) O1c5]", (2, 1, 9, 3), [1, 2], 4),
        ("[1,6,0,1 R2Ct3,3,3 Mp2,2 Lfys4 O1c5]", (2, 6, 8, 1), [0, 2], 4),
        ("[1,4,0,1 RxLfys3 Lbx3 O1c5]", (2, 4, 8, 1), [1, 2], 4),
        ("[1,1,0,2 ([Lfx3 Lfx3] Lrx3) Lfx4 O1c5]", (2, 1, 8, 2), [0, 1], 4),
        ("[1,6,0,1 Ry[Ct3,3,2 Mp2,2] Lfys4 O1c5]", (2, 6, 8, 1), [1, 2], 4),
    ],
)
def test_net_backward_matches_numerical(spec, x_shape, labels, blank):
    rng = np.random.default_rng(3)
    net = VGSLNetwork(spec, seed=9)
    x = rng.normal(0, 1, x_shape).astype(np.float32)

    def total(net):
        logp, caches = T.forward_cache(net, x)
        s = sum(
            T.ctc_loss_grad(logp[n], labels, blank)[0]
            for n in range(logp.shape[0])
        )
        return s, logp, caches

    _s, logp, caches = total(net)
    dlog = np.zeros_like(logp)
    for n in range(logp.shape[0]):
        _, dlog[n] = T.ctc_loss_grad(logp[n], labels, blank)
    gflat = T.flatten_grads(
        T.backward(net, caches, dlog), T.trainable_slots(net)
    )
    slots = T.trainable_slots(net)
    vec = T.flatten(net, slots)
    idxs = rng.choice(len(vec), 25, replace=False)
    for ix in idxs:
        outs = []
        for sgn in (1, -1):
            v2 = vec.astype(np.float64).copy()
            v2[ix] += sgn * 1e-3
            T.unflatten(net, slots, v2.astype(np.float32))
            outs.append(total(net)[0])
        num = (outs[0] - outs[1]) / 2e-3
        assert abs(num - gflat[ix]) <= 0.06 * max(1e-2, abs(num))
    T.unflatten(net, slots, vec)


def test_summarizing_lstm_keeps_last_y_step():
    """Lfys reduces height to 1 by keeping the LAST y-step: changing the
    bottom row (last step top-down) must change the output; with Lrys
    (bottom-up) changing the TOP row must."""
    net = VGSLNetwork("[1,4,0,1 Lfys3 O1c4]", seed=1)
    x = np.random.default_rng(0).normal(0, 1, (1, 4, 6, 1)).astype(np.float32)
    base = net.forward(x)
    assert base.shape == (1, 6, 4)
    x2 = x.copy()
    x2[:, -1] += 1.0
    assert not np.allclose(net.forward(x2), base)
    rnet = VGSLNetwork("[1,4,0,1 Lrys3 O1c4]", seed=1)
    rbase = rnet.forward(x)
    x3 = x.copy()
    x3[:, 0] += 1.0
    assert not np.allclose(rnet.forward(x3), rbase)


def test_exact_net_counts_exact():
    """The constructed fixture net greedy-decodes every training line
    exactly (edge spaces stripped like production decode)."""
    net = build_fixture_net()
    slots = T.trainable_slots(net, (2,))
    texts = _lines(11, 6)
    _g, _loss, n, ne = T.batch_gradients(net, slots, texts, CHARS, BLANK)
    assert ne == n == 6


def test_distributed_gradient_matches_local(spark):
    texts = _lines(13, 10)
    net = build_fixture_net()
    out_layer = (len(net.layers) - 1,)
    slots = T.trainable_slots(net, out_layer)
    vec = T.flatten(net, slots)
    g_local, loss_local, n_local, ne_local = T.batch_gradients(
        net, slots, texts, CHARS, BLANK
    )
    base_bc = spark.sparkContext.broadcast(
        T.flatten(net, T.trainable_slots(net)).tobytes()
    )
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(4)
    g_dist, loss_dist, n_dist, ne_dist = T.distributed_gradient(
        spark, df, net.spec, base_bc, vec, CHARS, BLANK, out_layer
    )
    base_bc.destroy()
    assert n_dist == n_local and ne_dist == ne_local
    assert abs(loss_dist - loss_local) < 1e-6 * max(1.0, abs(loss_local))
    assert np.allclose(g_dist, g_local, rtol=1e-5, atol=1e-4)


def test_distributed_finetune_recovers_damaged_output(spark):
    """The --continue_from use case: a noise-damaged output layer decodes
    nothing; distributed full-batch Adam recovers exact decode on the
    training lines AND held-out lines, then the tuned weights round-trip
    through the real traineddata container."""
    train, held = _lines(11, 12), _lines(29, 6)
    net = build_fixture_net()
    out_layer = (len(net.layers) - 1,)
    slots = T.trainable_slots(net, out_layer)
    vec0 = T.flatten(net, slots)
    rng = np.random.default_rng(5)
    damaged = (vec0 + rng.normal(0, 1.5, vec0.shape)).astype(np.float32)

    df = spark.createDataFrame(
        [(t,) for t in train], "text string"
    ).repartition(4)
    tuned, history = T.distributed_finetune(
        spark, df, net, damaged, CHARS, BLANK, out_layer, steps=60, lr=0.05
    )
    assert history[0]["exact"] == 0  # the damage really broke decode
    assert history[-1]["exact"] == history[-1]["n"] == len(train)
    assert len(history) < 60  # early exit fired
    assert history[-1]["loss"] < history[0]["loss"]

    # held-out exactness + traineddata round-trip decode parity
    T.unflatten(net, slots, tuned)
    _g, _loss, n, ne = T.batch_gradients(net, slots, held, CHARS, BLANK)
    assert ne == n == len(held)

    from tesseract_spark.lstm.fixture_model import (
        build_fixture_model,
        decode_strips,
    )
    from tesseract_spark.lstm.tessdata import (
        load_traineddata,
        save_traineddata,
    )

    model = build_fixture_model()
    model.net.layers[-1].weights = {
        k: v.copy() for k, v in net.layers[-1].weights.items()
    }
    reloaded = load_traineddata(save_traineddata(model))
    strips = [T.line_sample(t) for t in held]
    assert decode_strips(reloaded, strips) == held


def test_batch_gradients_accepts_carried_strips():
    """.lstmf samples carry their own images: explicit strips equal the
    default render path exactly, and a degraded corpus (degradeimage
    augmentation) produces a genuinely different gradient/loss."""
    from tesseract_spark.functions.fonts import mask_to_gray
    from tesseract_spark.functions.image_ops import binarize_otsu
    from tesseract_spark.lstm.degrade import degrade_line

    net = build_fixture_net()
    slots = T.trainable_slots(net, (len(net.layers) - 1,))
    texts = _lines(3, 4)
    g0, l0, n0, e0 = T.batch_gradients(net, slots, texts, CHARS, BLANK)
    clean = [T.line_sample(t) for t in texts]
    g1, l1, n1, e1 = T.batch_gradients(
        net, slots, texts, CHARS, BLANK, strips=clean
    )
    assert (g0 == g1).all() and l0 == l1 and e0 == e1 == n1

    deg = [
        binarize_otsu(
            degrade_line(mask_to_gray(s), exposure=0, seed=i)
        ).astype(bool)
        for i, s in enumerate(clean)
    ]
    g2, l2, _n2, e2 = T.batch_gradients(
        net, slots, texts, CHARS, BLANK, strips=deg
    )
    assert l2 > l1  # the copy/scan cycle really is a harder domain
    assert e2 < e1
    assert (g2 != g1).any()


def test_distributed_gradient_consumes_lstmf_images(spark):
    """The .lstmf image path end-to-end: a sample table built from an
    .lstmf blob trains on its CARRIED images — clean images reproduce
    the text-rendered gradient exactly; a degradeimage-augmented blob
    produces a different, harder one."""
    from tesseract_spark.lstm.lstmf import (
        lstmf_to_df,
        make_line_samples,
        write_lstmf,
    )

    texts = _lines(7, 4)
    net = build_fixture_net()
    out_layer = (len(net.layers) - 1,)
    vec = T.flatten(net, T.trainable_slots(net, out_layer))
    base_bc = spark.sparkContext.broadcast(
        T.flatten(net, T.trainable_slots(net)).tobytes()
    )

    def grad(df):
        return T.distributed_gradient(
            spark, df, net.spec, base_bc, vec, CHARS, BLANK, out_layer
        )

    texts_only = spark.createDataFrame([(t,) for t in texts], "text string")
    g_text, l_text, n_t, e_t = grad(texts_only)

    clean = lstmf_to_df(spark, write_lstmf(make_line_samples(texts)))
    g_img, l_img, n_i, e_i = grad(clean)
    assert n_t == n_i and e_t == e_i
    assert abs(l_text - l_img) < 1e-9
    assert np.allclose(g_text, g_img)

    deg = lstmf_to_df(
        spark,
        write_lstmf(make_line_samples(texts, degrade_exposure=1, seed=3)),
    )
    g_deg, l_deg, _n, e_deg = grad(deg)
    assert l_deg > l_img and e_deg < e_i
    assert not np.allclose(g_deg, g_img)
    base_bc.destroy()
