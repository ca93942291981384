"""The "old" baseline fitter — partition-based robust row baselines
(src/textord/oldbasel.cpp, the reference's DEFAULT fitter:
textord_old_baselines is true).

Mechanism: blob bottoms are measured against a first straight-line
approximation (``make_first_baseline`` oldbasel.cpp:481-605), every
blob is assigned to a PARTITION by its drift-smoothed y-difference
(``partition_line`` :672-741 scanning forward then backward from the
quietest anchor run chosen by ``get_ydiffs`` :859-901;
``choose_partition`` :909-975 opens a new partition when a jump
exceeds jumplimit), suspect runs re-merge into the main partition when
they fit between their neighbors (``merge_oldbl_parts`` :748-855), the
baseline refits on the biggest partition only
(``partition_coords`` :976-1004), and the remaining partitions yield
the descender-drop statistic and the quality flag
(``find_lesser_parts`` :1259-1330: a run of more than MAXBADRUN
non-best blobs fails the row).

This is the model-free complement of the page stage's font-model
election (operators/page.py ``_row_metrics``): the election is exact
where the synthetic font's rigid geometry holds; the partition fitter
assumes nothing about glyph heights, so the degenerate-row fallback
consults it when every glyph is damaged.  The quadratic segment fit of
``segment_spline``/QSPLINE rides on functions/spline.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAXPARTS = 6  # oldbasel.cpp:68
MAXBADRUN = 2  # :65
MINASCRISE = 2.0  # :61
JUMPLIMIT_FRACT = 0.15  # textord_oldbl_jumplimit (:54), x line size


def get_ydiffs(
    boxes: np.ndarray, yfun
) -> tuple[np.ndarray, int]:
    """Per-blob bottom difference from the current baseline and the
    index of the quietest 3-blob anchor window (get_ydiffs
    oldbasel.cpp:859-901; the spline step/drift bookkeeping is not
    needed — our baselines are continuous functions)."""
    xc = (boxes[:, 0] + boxes[:, 2]) // 2
    diffs = boxes[:, 3].astype(np.float64) - np.array(
        [float(yfun(int(x))) for x in xc]
    )
    best_idx, best_sum = 0, np.inf
    a = np.abs(diffs)
    for i in range(2, len(diffs)):
        s = float(a[i - 2 : i + 1].sum())
        if s < best_sum:
            best_sum, best_idx = s, i - 1
    return diffs, best_idx


@dataclass
class _PartState:
    partdiffs: list = field(default_factory=lambda: [0.0] * MAXPARTS)
    lastpart: int = -1
    drift: float = 0.0
    lastdelta: float = 0.0
    count: int = 1


def choose_partition(
    diff: float, jumplimit: float, st: _PartState
) -> int:
    """choose_partition (oldbasel.cpp:909-975), ported exactly: stay
    in the last partition while the drift-adjusted delta is small;
    else jump to the nearest partition, opening a new one when every
    existing partition is more than jumplimit away."""
    if st.lastpart < 0:
        st.partdiffs[0] = diff
        st.lastpart = 0
        st.drift = 0.0
        st.lastdelta = 0.0
    delta = diff - st.partdiffs[st.lastpart] - st.drift
    if abs(delta) > jumplimit / 2:
        bestdelta = diff - st.partdiffs[0] - st.drift
        bestpart = 0
        for p in range(1, st.count):
            d = diff - st.partdiffs[p] - st.drift
            if abs(d) < abs(bestdelta):
                bestdelta, bestpart = d, p
        delta = bestdelta
        if abs(bestdelta) > jumplimit and st.count < MAXPARTS:
            bestpart = st.count
            st.count += 1
            st.partdiffs[bestpart] = diff - st.drift
            delta = 0.0
    else:
        bestpart = st.lastpart
    if bestpart == st.lastpart and (
        abs(delta - st.lastdelta) < jumplimit / 2 or abs(delta) < jumplimit / 2
    ):
        st.drift = (3 * st.drift + delta) / 3  # smooth the drift
    st.lastdelta = delta
    st.lastpart = bestpart
    return bestpart


def merge_oldbl_parts(
    boxes: np.ndarray,
    partids: np.ndarray,
    partsizes: np.ndarray,
    biggestpart: int,
    jumplimit: float,
) -> None:
    """merge_oldbl_parts (oldbasel.cpp:748-849), ported exactly: only
    a LONG run (> MAXBADRUN blobs — short runs are descenders and must
    stay separate) in another partition is a merge candidate; a line
    fits through the RUN's own bottoms, the nearest main-partition
    blob on either side is found by expanding search, and the run
    rejoins the main partition when that blob lies within jumplimit of
    the run's fitted line.  A trailing run at the array end never
    merges (the reference only tests on a partition change)."""
    n = len(partids)
    xc = (boxes[:, 0] + boxes[:, 2]) / 2.0
    prevpart = biggestpart
    runlength = 0
    startx = 0
    for blobindex in range(n):
        if partids[blobindex] != prevpart:
            if prevpart != biggestpart and runlength > MAXBADRUN:
                run = np.arange(startx, blobindex)
                m, c = (
                    np.polyfit(xc[run], boxes[run, 3].astype(np.float64), 1)
                    if len(run) >= 2
                    else (0.0, float(boxes[run[0], 3]))
                )
                found_one = close_one = False
                t = 1
                while not found_one and (
                    startx - t >= 0 or blobindex + t <= n
                ):
                    for k in (startx - t, blobindex + t - 1):
                        if 0 <= k < n and partids[k] == biggestpart:
                            found_one = True
                            diff = m * xc[k] + c - float(boxes[k, 3])
                            if abs(diff) < jumplimit:
                                close_one = True
                    t += 1
                if close_one:
                    partsizes[prevpart] -= runlength
                    partsizes[biggestpart] += runlength
                    partids[startx:blobindex] = biggestpart
            prevpart = partids[blobindex]
            runlength = 1
            startx = blobindex
        else:
            runlength += 1


def partition_line(
    boxes: np.ndarray, yfun, jumplimit: float
) -> tuple[np.ndarray, np.ndarray, int]:
    """partition_line (oldbasel.cpp:672-741): forward pass from the
    quiet anchor, then backward over the head, then the biggest
    partition wins (ties to the higher index, as the reference's >=
    scan) and suspect runs merge."""
    n = len(boxes)
    diffs, startx = get_ydiffs(boxes, yfun)
    partids = np.zeros(n, dtype=np.int64)
    st = _PartState()
    for i in range(startx, n):
        partids[i] = choose_partition(float(diffs[i]), jumplimit, st)
    st2 = _PartState()
    st2.count = st.count
    st2.partdiffs = list(st.partdiffs)
    for i in range(startx, -1, -1):
        partids[i] = choose_partition(float(diffs[i]), jumplimit, st2)
    count = max(st.count, st2.count)
    partsizes = np.bincount(partids, minlength=max(count, 1))
    biggest = 0
    for p in range(1, len(partsizes)):
        if partsizes[p] >= partsizes[biggest]:
            biggest = p
    merge_oldbl_parts(boxes, partids, partsizes, biggest, jumplimit)
    return partids, partsizes, biggest


@dataclass
class OldBaseline:
    coeffs: tuple  # quadratic (a, b, c): y = a x^2 + b x + c
    partids: np.ndarray
    biggest: int
    descdrop: float  # find_lesser_parts' best below-baseline step
    ok: bool  # False when a non-best run exceeds MAXBADRUN

    def y(self, x: float) -> float:
        a, b, c = self.coeffs
        return a * x * x + b * x + c


def fit_old_baseline(
    boxes: np.ndarray, jumplimit: float | None = None
) -> OldBaseline:
    """find_textlines' per-row flow (oldbasel.cpp:324-414): straight
    first approximation over all bottoms, partition, refit the biggest
    partition (quadratic LMS — the single-segment QSPLINE case), then
    the lesser-part statistics."""
    boxes = np.asarray(boxes, dtype=np.int64)
    boxes = boxes[np.argsort((boxes[:, 0] + boxes[:, 2]) // 2)]
    n = len(boxes)
    xc = ((boxes[:, 0] + boxes[:, 2]) // 2).astype(np.float64)
    yb = boxes[:, 3].astype(np.float64)
    if jumplimit is None:
        # jumplimit = textord_oldbl_jumplimit x line height, clamped
        # below at MINASCRISE (find_textlines oldbasel.cpp:354-358);
        # median blob height stands in for the lineheight estimate
        h = float(np.median(boxes[:, 3] - boxes[:, 1]))
        jumplimit = max(MINASCRISE, JUMPLIMIT_FRACT * h)
    if n == 1:
        return OldBaseline((0.0, 0.0, float(yb[0])), np.zeros(1, np.int64), 0, 0.0, True)
    # make_first_baseline: the 1-segment linear least squares
    b1, c1 = np.polyfit(xc, yb, 1)
    partids, partsizes, biggest = partition_line(
        boxes, lambda x: b1 * x + c1, float(jumplimit)
    )
    sel = partids == biggest
    if sel.sum() >= 3:
        a2, b2, c2 = np.polyfit(xc[sel], yb[sel], 2)
    elif sel.sum() == 2:
        b2, c2 = np.polyfit(xc[sel], yb[sel], 1)
        a2 = 0.0
    else:
        a2, b2, c2 = 0.0, 0.0, float(yb[sel].mean())
    base = OldBaseline((float(a2), float(b2), float(c2)), partids, biggest, 0.0, True)
    # find_lesser_parts: descender step + the bad-run quality flag
    runlength = biggest_run = 0
    steps = np.zeros(len(partsizes))
    for i in range(n):
        if partids[i] != biggest:
            runlength += 1
            biggest_run = max(biggest_run, runlength)
            steps[partids[i]] += yb[i] - base.y(xc[i])
        else:
            runlength = 0
    base.ok = biggest_run <= MAXBADRUN
    # image coordinates grow DOWN, so a descender partition steps
    # POSITIVE from the baseline here (the reference's bestneg <=
    # -MINASCRISE with y-up, find_lesser_parts oldbasel.cpp:1310-1322)
    bestdrop, dropcount = 0.0, 0
    for p in range(len(partsizes)):
        if p == biggest or partsizes[p] == 0:
            continue
        step = steps[p] / partsizes[p]
        if step >= MINASCRISE and partsizes[p] > dropcount:
            bestdrop = step
            dropcount = int(partsizes[p])
    base.descdrop = float(bestdrop)
    return base
