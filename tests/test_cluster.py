"""Prototype training (cluster.cpp / mftraining analogue): clustering
semantics, significance gate, trained-bank decode parity, and the
distributed mastertrainer shape."""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import CHARSET, get_font
from tesseract_spark.lstm import cluster as cl
from tesseract_spark.lstm.intproto import get_static_classifier


def _jittered_samples(mask: np.ndarray, n: int = 6) -> list[np.ndarray]:
    """Deterministic per-sample jitter: sub-pixel shifts + salt specks —
    the font/page variation mftraining sees across training pages."""
    out = [mask]
    rng = np.random.default_rng(int(mask.sum()))
    for k in range(1, n):
        m = np.roll(mask, ((k % 3) - 1, ((k // 3) % 3) - 1), axis=(0, 1))
        m = m.copy()
        # one noise speck off the glyph (insignificant-cluster fodder)
        r = int(rng.integers(0, m.shape[0]))
        c = int(rng.integers(0, m.shape[1]))
        if not m[max(0, r - 1) : r + 2, max(0, c - 1) : c + 2].any():
            m[r, c] = True
        out.append(m)
    return out


def test_two_clear_clusters_two_protos():
    """Two tight feature groups seen in every sample -> exactly two
    significant prototypes at their circular-mean positions."""
    a = np.array([0.10, 0.50, 0.30, 0.02], dtype=np.float32)
    b = np.array([-0.20, 0.90, 0.50, 0.50], dtype=np.float32)
    samples = []
    for k in range(4):
        eps = (k - 1.5) * 0.004
        samples.append(
            np.stack([a + [eps, 0, 0, 0], b + [0, eps, 0, 0]]).astype(
                np.float32
            )
        )
    protos = cl.cluster_class_features(samples)
    assert protos.shape == (2, 4)
    got = protos[np.argsort(protos[:, 0])]
    assert np.allclose(got[0], b, atol=0.02)
    assert np.allclose(got[1], a, atol=0.02)


def test_insignificant_cluster_dies():
    """A feature seen in 1 of 4 samples (noise) is not a prototype
    (MakePrototype significance, cluster.cpp:931-1065)."""
    a = np.array([0.10, 0.50, 0.30, 0.02], dtype=np.float32)
    noise = np.array([0.45, 1.10, 0.05, 0.77], dtype=np.float32)
    samples = [np.stack([a])] * 3 + [np.stack([a, noise]).astype(np.float32)]
    protos = cl.cluster_class_features(samples)
    assert protos.shape == (1, 4)
    assert np.allclose(protos[0], a, atol=0.02)


def test_circular_direction_mean():
    """Directions 0.98 and 0.02 average to ~0.0, never 0.5 (the circular
    handling cluster.cpp gets from its direction statistics)."""
    f1 = np.array([[0.0, 0.5, 0.3, 0.98]], dtype=np.float32)
    f2 = np.array([[0.0, 0.5, 0.3, 0.02]], dtype=np.float32)
    protos = cl.cluster_class_features([f1, f2])
    assert protos.shape[0] == 1
    d = protos[0, 3]
    assert min(d, 1 - d) < 0.01


def test_trained_bank_decodes_charset():
    """Train from jittered renders; the trained classifier top-1 equals
    the truth for every fixture glyph — the inttemp parity contract
    (and it must survive specks the hand-built bank never saw)."""
    font = get_font()
    samples = {ch: _jittered_samples(font[ch]) for ch in CHARSET}
    clf = cl.train_templates(samples)
    hand = get_static_classifier()
    for ch in CHARSET:
        got = clf.classify(font[ch].astype(bool))
        assert got and got[0][0] == ch, (ch, got[:3])
        # parity with the hand-built bank on clean glyphs
        assert got[0][0] == hand.classify(font[ch].astype(bool))[0][0]


def test_distributed_training_matches_local(spark):
    """mastertrainer shape: applyInPandas per-class clustering returns
    byte-identical prototype banks to the local loop."""
    font = get_font()
    chars = "abcXY12"
    samples = {ch: _jittered_samples(font[ch], 4) for ch in chars}
    local = cl.train_templates(samples)
    tbl = cl.features_table(spark, samples)
    dist = cl.train_templates_distributed(tbl)
    assert dist.glyphs == local.glyphs
    for i, ch in enumerate(local.glyphs):
        assert np.allclose(dist.protos[i], local.protos[i], atol=1e-6), ch
