"""Property tests for the numeric primitives added in the
unittest-closure wave: STATS / LLSQ / TBOX / BitVector are pinned to
independent numpy/brute-force models over random inputs (hypothesis),
beyond the reference's fixed fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_spark.functions.rect import TBOX
from tesseract_spark.functions.stats import LLSQ, STATS
from tesseract_spark.lstm.featuremap import BitVector


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=200))
def test_stats_against_numpy(values):
    s = STATS(0, 30)
    for v in values:
        s.add(v)
    arr = np.asarray(values)
    assert s.get_total() == len(arr)
    assert s.mean() == np.mean(arr)
    assert s.min_bucket() == arr.min()
    assert s.max_bucket() == arr.max()
    # mode tie-break (statistc.cpp:112-125): the scan starts at bucket 0
    # then walks DOWN from the top with strict >, so bucket 0 wins only
    # when nothing beats it; otherwise the HIGHEST tied bucket wins
    counts = np.bincount(arr, minlength=31)
    maxima = np.flatnonzero(counts == counts.max())
    expected = 0 if counts[0] == counts.max() else int(maxima[-1])
    assert s.mode() == expected
    # sd matches the population standard deviation
    assert abs(s.sd() - np.std(arr)) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=2, max_size=200))
def test_stats_ile_is_monotone_and_bounded(values):
    s = STATS(0, 30)
    for v in values:
        s.add(v)
    qs = [s.ile(f / 10.0) for f in range(11)]
    assert all(a <= b + 1e-12 for a, b in zip(qs, qs[1:]))
    assert min(values) <= s.median() <= max(values) + 1


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
    min_size=2, max_size=50,
))
def test_llsq_matches_polyfit(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    if np.var(xs) < 1e-6:
        return  # vertical data: m() defined as 0, polyfit unstable
    llsq = LLSQ()
    for x, y in pts:
        llsq.add(x, y)
    m, c = np.polyfit(xs, ys, 1)
    assert abs(llsq.m() - m) < 1e-6 * max(1.0, abs(m))
    assert abs(llsq.c(llsq.m()) - c) < 1e-6 * max(1.0, abs(c))
    # rms is the root-mean-square residual of that line (the moment
    # closed form cancels catastrophically near zero residual — same
    # as the reference's formula — so the tolerance is absolute)
    resid = ys - (m * xs + c)
    assert abs(llsq.rms(m, c) - np.sqrt(np.mean(resid ** 2))) < 1e-4


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
    min_size=3, max_size=50,
))
def test_llsq_vector_fit_minimizes_rms_orth(pts):
    llsq = LLSQ()
    for x, y in pts:
        llsq.add(x, y)
    vx, vy = llsq.vector_fit()
    # rms_orth(dir) measures error PERPENDICULAR to a line THROUGH the
    # mean in direction dir — so the fit direction itself minimizes it
    # (TLS optimality)
    best = llsq.rms_orth(vx, vy)
    for theta in np.linspace(0, np.pi, 13):
        d = llsq.rms_orth(np.cos(theta), np.sin(theta))
        assert best <= d + 1e-9


def _brute_overlap_fraction(a: TBOX, b: TBOX) -> float:
    if a.area() == 0:
        return 0.0
    ix = max(0, min(a.right, b.right) - max(a.left, b.left))
    iy = max(0, min(a.top, b.top) - max(a.bottom, b.bottom))
    if not a.overlap(b):
        return 0.0
    return ix * iy / a.area()


boxes = st.tuples(st.integers(0, 50), st.integers(0, 50),
                  st.integers(0, 50), st.integers(0, 50)).map(
    lambda t: TBOX(min(t[0], t[2]), min(t[1], t[3]),
                   max(t[0], t[2]), max(t[1], t[3])))


@settings(max_examples=100, deadline=None)
@given(boxes, boxes)
def test_tbox_overlap_fraction_matches_brute(a, b):
    assert abs(a.overlap_fraction(b) - _brute_overlap_fraction(a, b)) < 1e-12
    # overlap is symmetric; fraction generally is not
    assert a.overlap(b) == b.overlap(a)
    # intersection area never exceeds either area
    inter = a.intersection(b).area()
    assert inter <= max(a.area(), 0) or a.area() == 0
    assert inter <= max(b.area(), 0) or b.area() == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 499), max_size=60), st.integers(1, 500))
def test_bitvector_matches_numpy(set_bits, size):
    bv = BitVector(size)
    ref = np.zeros(size, dtype=bool)
    for b in set_bits:
        if b < size:
            bv.set_bit(b)
            ref[b] = True
    assert bv.num_set_bits() == int(ref.sum())
    walked = []
    i = -1
    while True:
        i = bv.next_set_bit(i)
        if i < 0:
            break
        walked.append(i)
    assert walked == list(np.flatnonzero(ref))
    back = BitVector.deserialize(bv.serialize())
    assert back.words == bv.words and back.bit_size == bv.bit_size
