"""Training-image degradation (degradeimage.cpp analogue): exact
exposure math, morphology semantics, determinism, lstmf integration."""

import numpy as np

from tesseract_spark.functions.fonts import mask_to_gray
from tesseract_spark.lstm.degrade import (
    K_EXPOSURE_FACTOR,
    block_conv,
    degrade_line,
    distort_line,
    erode_gray,
    rotate_small,
)
from tesseract_spark.lstm.lstmf import make_line_samples, read_lstmf, write_lstmf
from tesseract_spark.lstm.training import line_sample


def test_exposure_offsets_exact():
    """Flat image, no rng/rotation: output = conv(img) + the reference's
    erosion_offset (degradeimage.cpp:135-146)."""
    flat = np.full((8, 40), 200, dtype=np.uint8)
    # exposure 0: offset = -3*16 - 0*16 = -48
    assert int(degrade_line(flat, exposure=0, seed=None)[4, 20]) == 152
    # exposure 1: erode of a flat image is flat; offset = -16
    assert int(degrade_line(flat, exposure=1, seed=None)[4, 20]) == 184
    # exposure 2: offset = -32
    assert int(degrade_line(flat, exposure=2, seed=None)[4, 20]) == 168
    # exposure -1: offset = -48 + 16 = -32
    assert int(degrade_line(flat, exposure=-1, seed=None)[4, 20]) == 168
    assert K_EXPOSURE_FACTOR == 16


def test_erode_spreads_ink():
    img = np.full((9, 9), 255, dtype=np.uint8)
    img[4, 4] = 0
    out = erode_gray(img)
    assert (out[3:6, 3:6] == 0).all()
    assert out[0, 0] == 255


def test_block_conv_softens():
    img = np.full((9, 9), 255, dtype=np.float64)
    img[4, 4] = 0
    out = block_conv(img)
    assert 255 * 8 / 9 - 1 <= out[4, 4] <= 255 * 8 / 9 + 1
    assert out[0, 0] == 255


def test_ramp_only_on_big_pages():
    small = np.full((8, 40), 200, dtype=np.uint8)
    big = np.full((8, 1200), 200, dtype=np.uint8)
    ds = degrade_line(small, exposure=0, seed=None)
    db = degrade_line(big, exposure=0, seed=None)
    assert len(np.unique(ds)) == 1  # no ramp
    # ramp fades along x on the big page
    assert db[4, 1100] < db[4, 10]


def test_rotation_and_determinism():
    g = mask_to_gray(line_sample("fox 42"))
    assert (rotate_small(g, 0.0) == g).all()
    r = degrade_line(g, exposure=1, seed=9)
    assert (r == degrade_line(g, exposure=1, seed=9)).all()
    assert (r != degrade_line(g, exposure=1, seed=10)).any()
    # explicit rotation overrides the draw (the *rotation contract);
    # needs a line long enough that +-0.02 rad moves pixels >= 0.5 px
    # (nearest-neighbour is sub-pixel-invariant on short strips)
    g2 = mask_to_gray(line_sample("the quick brown fox jumps over 42"))
    a = degrade_line(g2, exposure=0, seed=None, rotation=0.02)
    b = degrade_line(g2, exposure=0, seed=None, rotation=-0.02)
    assert (a != b).any()


def test_distort_line_modes():
    g = mask_to_gray(line_sample("abc"))
    assert (distort_line(g, seed=3) == g).all()  # no flags -> identity
    inv = distort_line(g, seed=3, invert=True)
    assert (inv == 255 - g).all()
    n1 = distort_line(g, seed=1, white_noise=True)
    assert (n1 == distort_line(g, seed=1, white_noise=True)).all()


def test_lstmf_degraded_roundtrip():
    texts = ["the cat", "sat on"]
    clean = make_line_samples(texts)
    deg = make_line_samples(texts, degrade_exposure=1, seed=5)
    assert [s.transcription for s in deg] == texts
    assert deg[0].image_png != clean[0].image_png
    back = read_lstmf(write_lstmf(deg))
    assert [s.transcription for s in back] == texts
    assert back[0].image_png == deg[0].image_png
