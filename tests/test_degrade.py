"""Training-image degradation (degradeimage.cpp analogue): exact
exposure math, morphology semantics, determinism, lstmf integration."""

import numpy as np

from tesseract_spark.functions.fonts import mask_to_gray
from tesseract_spark.lstm.degrade import (
    K_EXPOSURE_FACTOR,
    _xform_pt,
    block_conv,
    degrade_line,
    distort_line,
    erode_gray,
    generate_perspective_distortion,
    projective_coeffs,
    projective_solve,
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


def test_projective_solve_identity_and_roundtrip():
    """leptonica getProjectiveXformCoeffs: identity correspondences give
    the identity coefficient vector, and the backward solve inverts the
    forward one exactly on the four corners (degradeimage.cpp:260-309
    computes both directions from the same corner set)."""
    src = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]])
    c = projective_solve(src, src)
    assert np.allclose(c, [1, 0, 0, 0, 1, 0, 0, 0])
    rng = np.random.default_rng(7)
    im_c, box_c, incolor = projective_coeffs(100, 40, rng)
    assert incolor in (0, 255)
    for x, y in ((0, 0), (100, 0), (100, 40), (0, 40)):
        fx, fy = _xform_pt(box_c, x, y)
        bx, by = _xform_pt(im_c, fx, fy)
        assert abs(bx - x) < 1e-6 and abs(by - y) < 1e-6


def test_projective_corner_geometry():
    """The destination corners follow degradeimage.cpp:283-293: top-left
    at (x0*w, y0*h), bottom corners shifted by the shear, shear clamped
    into [-x0, x1] so no corner crosses the opposite margin."""
    rng = np.random.default_rng(3)
    _, box_c, _ = projective_coeffs(200, 80, rng)
    xs, ys = zip(*(_xform_pt(box_c, x, y)
                   for x, y in ((0, 0), (200, 0), (200, 80), (0, 80))))
    # pull-in only: every mapped corner stays inside the page
    assert min(xs) >= -1e-9 and max(xs) <= 200 + 1e-9
    assert min(ys) >= -1e-9 and max(ys) <= 80 + 1e-9


def test_generate_perspective_distortion():
    """GeneratePerspectiveDistortion (degradeimage.cpp:222-258):
    deterministic under the rng, warps ink, and transforms boxes as the
    bounding union of the two mapped diagonals."""
    g = mask_to_gray(line_sample("fox 42"))
    w1, boxes = generate_perspective_distortion(
        g, np.random.default_rng(5), boxes=[(2, 1, 20, 10)])
    w2, _ = generate_perspective_distortion(g, np.random.default_rng(5))
    assert (w1 == w2).all() and (w1 != g).any()
    assert w1.shape == g.shape
    (left, top, right, bottom), = boxes
    assert left < right and top < bottom


def test_distort_line_perspective_mode():
    g = mask_to_gray(line_sample("abc"))
    p1 = distort_line(g, seed=11, perspective=True)
    assert (p1 == distort_line(g, seed=11, perspective=True)).all()
    assert (p1 != g).any() and p1.shape == g.shape


def test_lstmf_degraded_roundtrip():
    texts = ["the cat", "sat on"]
    clean = make_line_samples(texts)
    deg = make_line_samples(texts, degrade_exposure=1, seed=5)
    assert [s.transcription for s in deg] == texts
    assert deg[0].image_png != clean[0].image_png
    back = read_lstmf(write_lstmf(deg))
    assert [s.transcription for s in back] == texts
    assert back[0].image_png == deg[0].image_png
