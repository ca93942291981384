"""Ports of unittest/lstm_recode_test.cc and lstm_squashed_test.cc.

The reference trains on Korean lstmf data rendered from Arial Unicode;
the sandbox has no fonts or traineddata, so the corpus is synthesized:
Hangul syllables (real codepoints, so UnicharCompress applies its Jamo
decomposition, unicharcompress.cpp ComputeEncoding) rendered with
deterministic stand-in glyphs from the fixture font.  The assertions
are the reference's own:

* RecodeTestKor/RecodeTestKorBase (lstm_recode_test.cc:19-36): training
  WITH unicharset recoding (few Jamo classes, 3 codes per syllable)
  learns faster than without (one class per syllable).
* EncodeDecodeBothTestKor (lstm_recode_test.cc:41-43): the Korean
  sample string round-trips through encode/decode with recode on + off.
* TestSquashed (lstm_squashed_test.cc:18-29): a conv/maxpool +
  y-summarizing-LSTM + bidi-LSTM stack learns, and converting the
  trained net to int8 (TestIntMode, lstm_test.h:146-158 /
  weightmatrix.cpp ConvertToInt) costs almost no accuracy.
"""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import CHARSET, render_line
from tesseract_spark.lstm import training as T
from tesseract_spark.lstm.fixture_model import PAD
from tesseract_spark.lstm.refcharset import RefUnicharset
from tesseract_spark.lstm.tessdata import (
    UnicharCompress,
    trainer_decode_labels,
    trainer_encode_string,
)
from tesseract_spark.lstm.vgsl import VGSLNetwork, convert_to_int

# 60 real Hangul syllables: 6 leads x 10 vowels, no trailing jamo.
SYLLABLES = [chr(0xAC00 + (lead * 21 + vowel) * 28)
             for lead in range(6) for vowel in range(10)]
STAND_INS = [c for c in CHARSET if c != " "][:60]


def _korean_charset():
    ucs = RefUnicharset()
    for s in SYLLABLES:
        ucs.unichar_insert(s)
    return ucs


def _train(strips, labels_list, n_classes, iters, lr=0.05, seed=5):
    """The TrainIterations loop (lstm_test.h:100-123) at fixture scale:
    full-batch CTC + Adam, returning (loss_per_label, n_exact) history
    endpoints."""
    net = VGSLNetwork(f"[1,1,0,16 Ct1,1,12 Lbx24 O1c{n_classes}]", seed=seed)
    slots = T.trainable_slots(net)
    blank = n_classes - 1
    adam = T.Adam(len(T.flatten(net, slots)), lr=lr)
    wmax = max(s.shape[1] for s in strips) + 2 * PAD
    x = np.zeros((len(strips), 1, wmax, 16), np.float32)
    for i, s in enumerate(strips):
        x[i, 0, PAD:PAD + s.shape[1], :] = s.astype(np.float32).T
    n_labels = sum(len(l) for l in labels_list)
    loss_per_label = 0.0
    n_exact = 0
    for _ in range(iters):
        logp, caches = T.forward_cache(net, x)
        dlog = np.zeros_like(logp)
        loss_sum, n_exact = 0.0, 0
        for j, labels in enumerate(labels_list):
            t_real = strips[j].shape[1] + 2 * PAD
            loss, dl = T.ctc_loss_grad(logp[j, :t_real], labels, blank)
            loss_sum += loss
            dlog[j, :t_real] = dl
            best = np.argmax(logp[j, :t_real], axis=1)
            keep = np.ones(len(best), bool)
            keep[1:] = best[1:] != best[:-1]
            if [int(c) for c in best[keep] if c != blank] == labels:
                n_exact += 1
        g = T.flatten_grads(T.backward(net, caches, dlog), slots)
        w = T.flatten(net, slots)
        T.unflatten(net, slots, adam.step(w, g / len(strips)))
        loss_per_label = loss_sum / n_labels
    return loss_per_label, n_exact


def test_recode_learns_faster_than_full_kor():
    """RecodeTestKorBase + RecodeTestKor: same lines, same net shape —
    the Jamo-recoded label space converges while the one-class-per-
    syllable space is still far behind (reference bounds: full < 88
    after 2N iterations, recode < 60 after N)."""
    ucs = _korean_charset()
    rec = UnicharCompress.compute_encoding(ucs, 2)
    rng = np.random.default_rng(11)
    texts_idx = [list(rng.integers(0, 60, size=4)) for _ in range(12)]
    strips = [render_line("".join(STAND_INS[i] for i in idx), 1)
              for idx in texts_idx]
    # uids 0-2 are the special codes; syllables start at uid 3.
    full_labels = [[int(i) for i in idx] for idx in texts_idx]
    rec_labels = [[c for i in idx for c in rec.encode_unichar(int(i) + 3)]
                  for idx in texts_idx]
    rec_classes = 1 + max(c for l in rec_labels for c in l) + 1
    assert rec_classes < 25  # Jamo space is far smaller than 60 syllables

    full_loss, full_exact = _train(strips, full_labels, 61, iters=130)
    rec_loss, rec_exact = _train(strips, rec_labels, rec_classes, iters=130)
    assert rec_exact > full_exact
    assert rec_exact >= len(strips) // 2
    assert rec_loss < full_loss


def test_encode_decode_both_kor():
    """EncodeDecodeBothTestKor (lstm_recode_test.cc:41-43) over the
    syllable slice of the fixture charset (the reference's sentence
    needs its full kor.unicharset; the assertion — identity through
    encode/decode with recode on AND off — is the same)."""
    ucs = _korean_charset()
    text = "".join(SYLLABLES[i] for i in (0, 11, 25, 37, 42, 59))
    for recode in (False, True):
        if recode:
            rec = UnicharCompress.compute_encoding(ucs, 2)
            null_char = rec.encode_unichar(2)[0]
        else:
            rec, null_char = None, len(ucs)
        labels = trainer_encode_string(ucs, text, rec, null_char)
        assert labels is not None
        assert trainer_decode_labels(ucs, labels, rec, null_char) == text


def _squashed_setup():
    chars = " abcdefghijklmnopqrstuvwxyz"
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list(chars.strip()), size=5))
             for _ in range(10)]
    strips = [render_line(t, 1) for t in texts]
    wmax = max(s.shape[1] for s in strips) + 4
    x = np.zeros((len(texts), 16, wmax, 1), np.float32)
    for i, s in enumerate(strips):
        x[i, :, 2:2 + s.shape[1], 0] = s
    labels = [[chars.index(c) for c in t] for t in texts]
    return chars, x, labels


def _squashed_loss(net, x, labels, blank):
    logp = net.forward(x)
    return sum(T.ctc_loss_grad(logp[j], labels[j], blank)[0]
               for j in range(len(labels))) / len(labels)


def test_squashed_learns_and_survives_int_mode():
    """TestSquashed: the Ct/Mp/Lfys/Lbx stack (2D input, y-summarized
    by a real over-height LSTM) trains end-to-end — loss falls well
    below its starting point — and TestIntMode: int8-converting the
    trained weights changes the loss only marginally (reference gate:
    int error < float error + 1%)."""
    chars, x, labels = _squashed_setup()
    n_classes = len(chars) + 1
    blank = len(chars)
    net = VGSLNetwork(
        f"[1,16,0,1 Ct3,3,8 Mp3,3 Lfys16 Lbx24 O1c{n_classes}]", seed=5)
    slots = T.trainable_slots(net)
    adam = T.Adam(len(T.flatten(net, slots)), lr=0.02)
    loss0 = _squashed_loss(net, x, labels, blank)
    for _ in range(60):
        logp, caches = T.forward_cache(net, x)
        dlog = np.zeros_like(logp)
        for j in range(len(labels)):
            _, dlog[j] = T.ctc_loss_grad(logp[j], labels[j], blank)
        g = T.flatten_grads(T.backward(net, caches, dlog), slots)
        w = T.flatten(net, slots)
        T.unflatten(net, slots, adam.step(w, g / len(labels)))
    float_loss = _squashed_loss(net, x, labels, blank)
    assert float_loss < 0.55 * loss0
    int_loss = _squashed_loss(convert_to_int(net), x, labels, blank)
    assert int_loss < float_loss * 1.05 + 1.0


def test_convert_to_int_is_close_not_exact():
    """ConvertToInt really quantizes: weights change, but by less than
    1/127 of each row's max (weightmatrix.cpp scale construction)."""
    net = VGSLNetwork("[1,1,0,16 Ct1,1,8 Lbx12 O1c20]", seed=3)
    before = {i: {k: v.copy() for k, v in l.weights.items()}
              for i, l in enumerate(net.layers) if l.weights}
    convert_to_int(net)
    changed = 0
    for i, l in enumerate(net.layers):
        for k, v in l.weights.items():
            if not np.array_equal(before[i][k], v):
                changed += 1
            if k in ("w", "wx"):
                tol = np.abs(before[i][k]).max(axis=1, keepdims=True) / 127.0
                assert np.all(np.abs(before[i][k] - v) <= tol + 1e-7)
    assert changed > 0
