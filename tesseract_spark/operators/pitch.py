"""Fixed-pitch detection, pitch estimation, and the pitch-sync DP.

Re-expresses ``compute_fixed_pitch`` / ``compute_block_pitch``
(src/textord/topitch.cpp:75-300) on numpy: a block is fixed-pitch when
blob-center advances are consistent with one lattice spacing (the fast
row statistic), and cut PLACEMENT inside merged runs is decided by the
reference's actual pitch-synchronization dynamic program —
``check_pitch_sync2`` / ``FPCUTPT::assign``
(src/textord/pithsync.cpp:96-190,291-470; the FPSEGPT recurrence of
src/textord/pitsync1.cpp:76-128 shares the cost function): candidate
cut points every pixel, predecessors one pitch +- error back, cost =
variance of the segment widths + squared bias from the target pitch +
squared gap-offset/ink/balance charges, faked (through-ink) cuts
bounded by fake count.  CJK variant (cjkpitch.cpp) shares this path
with a different tolerance.
"""

from __future__ import annotations

import numpy as np

# pitsync_joined_edge (pitsync1.cpp:27): cuts deeper than this fraction
# of a pitch inside a very wide blob are "mid cuts" — free, the blob is
# presumed joined.  textord_balance_factor (topitch.cpp:50): ding rate
# for ink asymmetry around a cut.
JOINED_EDGE = 0.75
BALANCE_FACTOR = 1.0


def detect_pitch(
    centers: np.ndarray, tolerance: float = 0.15, min_fraction: float = 0.8
) -> tuple[bool, float]:
    """(is_fixed_pitch, pitch_px) for one row/block of blob x-centers.

    Fixed-pitch when >= min_fraction of advances sit within ``tolerance``
    of the modal advance AND centers snap to the implied lattice.
    """
    centers = np.sort(np.asarray(centers, dtype=np.float64))
    if len(centers) < 4:
        return False, 0.0
    adv = np.diff(centers)
    med = float(np.median(adv))
    if med <= 0:
        return False, 0.0
    near = np.abs(adv - med) <= max(1.0, tolerance * med)
    if near.mean() < min_fraction:
        return False, 0.0
    pitch = float(adv[near].mean())
    # lattice residual: centers modulo pitch should concentrate
    phases = (centers - centers[0]) % pitch
    phases = np.minimum(phases, pitch - phases)
    if float(np.median(phases)) > max(1.0, tolerance * pitch):
        return False, 0.0
    return True, pitch


def check_pitch_sync(
    projection: np.ndarray,
    boxes: list[tuple[int, int]],
    pitch: int,
    pitch_error: int,
    *,
    projection_scale: float = 1.0,
) -> tuple[list[int], float, int, int]:
    """The pitch-synchronization dynamic program
    (``check_pitch_sync2``, src/textord/pithsync.cpp:291-470, with the
    ``FPCUTPT::assign`` recurrence :96-190): find the optimal fixed-
    pitch segmentation of one word/run given its vertical ink
    ``projection`` and blob ``boxes`` (left inclusive, right exclusive).

    Lattice of candidate cut points at every x; region k reachable from
    region k-1 points one pitch +- pitch_error back; per-point charge by
    cut legality — 0 in a gap, the distance-to-gap offset near a blob
    edge, free deep inside a very wide (joined) blob, else a FAKED cut
    charged the full ink column and counted (paths may not exceed the
    best fake count by more than the reference allows).  Cost of a path
    ending at region k: (mean_width - pitch)^2 + sum(width^2 +
    charge^2)/k - mean_width^2 — i.e. pitch bias + width variance +
    normalized charges.  An ink-asymmetry balance charge
    (textord_balance_factor, slow variant pithsync.cpp:160-166) nudges
    cuts toward positions with symmetric ink in the cell pair.

    Returns (interior cut x positions, sync cost, fake_count,
    mid_cuts).  The sync cost is the reference's return value
    (sq_sum - mean_sum^2/regions) — comparable across candidate
    pitches, the topitch.cpp pitch-decision statistic."""
    proj = np.asarray(projection, dtype=np.int64)
    nz = np.flatnonzero(proj > 0)
    if len(nz) == 0 or not boxes:
        return [], 0.0, 0, 0
    left_edge = int(nz[0])
    right_edge = int(nz[-1]) + 1
    pitch = max(int(pitch), 3)
    pitch_error = max(0, min(int(pitch_error), (pitch - 3) // 2))
    origin = left_edge - pitch
    n = right_edge - left_edge + 2 * pitch + 1
    BIG = np.inf
    cost = np.full(n, BIG)
    mean_sum = np.zeros(n)
    sq_sum = np.zeros(n)
    fake = np.full(n, 1 << 30, dtype=np.int64)
    region = np.zeros(n, dtype=np.int64)
    mids = np.zeros(n, dtype=np.int64)
    pred = np.full(n, -1, dtype=np.int64)
    terminal = np.zeros(n, dtype=bool)

    def proj_at(x: int) -> int:
        return int(proj[x]) if 0 <= x < len(proj) else 0

    # seed region: free cuts left of the word, then not-quite-free ones
    # sliding into it (pithsync.cpp:358-368)
    x = origin
    while x < left_edge:
        i = x - origin
        cost[i] = 0.0
        fake[i] = 0
        x += 1
    for offset in range(pitch_error + 1):
        i = x - origin
        cost[i] = float(offset * offset)
        sq_sum[i] = float(offset * offset)
        fake[i] = 0
        x += 1

    def assign(x: int, faking: bool, mid_cut: bool, offset: int) -> None:
        i = x - origin
        b_cost, b_pred = BIG, -1
        b_total = b_sq = 0.0
        b_fake = 1 << 30
        b_r = b_m = 0
        for px in range(x - pitch - pitch_error, x - pitch + pitch_error + 1):
            pi = px - origin
            if pi < 0 or pi >= n:
                continue
            if terminal[pi] or fake[pi] >= (1 << 30) or cost[pi] == BIG:
                continue
            dist = x - px
            # slow balance loop (pithsync.cpp:160-166): count of
            # positions whose emptiness differs between the two cell
            # halves walked inward from both cuts
            bal = 0
            bi = 0
            while px + bi < x - bi:
                bal += (proj_at(px + bi) <= 0) != (proj_at(x - bi) <= 0)
                bi += 1
            bal = int(bal * BALANCE_FACTOR / projection_scale)
            r = region[pi] + 1
            total = mean_sum[pi] + dist
            charge = bal + offset
            sq = dist * dist + sq_sum[pi] + charge * charge
            mean = total / r
            factor = (mean - pitch) ** 2 + sq / r - mean * mean
            if factor < b_cost and fake[pi] + faking <= b_fake:
                b_cost, b_pred = factor, pi
                b_total, b_sq = total, sq
                b_fake = fake[pi] + faking
                b_r, b_m = r, mids[pi] + mid_cut
        if b_pred >= 0:
            cost[i], pred[i] = b_cost, b_pred
            mean_sum[i], sq_sum[i] = b_total, b_sq
            fake[i], region[i], mids[i] = b_fake, b_r, b_m

    # main sweep (pithsync.cpp:370-404): classify each x against the
    # blob boxes, then relax from the previous region
    bidx = 0
    while x < right_edge - pitch_error:
        while bidx < len(boxes) - 1 and x > boxes[bidx][1] + pitch_error:
            bidx += 1
        bl, br = boxes[bidx]
        nl = boxes[bidx + 1][0] if bidx < len(boxes) - 1 else None
        faking = False
        mid_cut = False
        if x <= bl:
            offset = 0
        elif x <= bl + pitch_error:
            offset = x - bl
        elif x >= br:
            offset = 0
        elif nl is not None and x >= nl:
            offset = min(x - nl, br - x)
        elif x >= br - pitch_error:
            offset = br - x
        elif (x - bl > pitch * JOINED_EDGE
              and br - x > pitch * JOINED_EDGE):
            mid_cut = True
            offset = 0
        else:
            faking = True
            offset = proj_at(x)
        assign(x, faking, mid_cut, offset)
        x += 1

    # terminal region (pithsync.cpp:408-434): candidate word-end cuts,
    # best by fewest fakes then least cost; equal plateau -> midpoint
    best_fake = 1 << 30
    best_cost = BIG
    best_count = 1 << 30
    best_left = best_right = -1
    while x < right_edge + pitch:
        offset = right_edge - x if x < right_edge else 0
        assign(x, False, False, offset)
        i = x - origin
        terminal[i] = True
        if pred[i] >= 0 and region[i] + fake[i] <= best_count + best_fake:
            if fake[i] < best_fake or (
                fake[i] == best_fake and cost[i] < best_cost
            ):
                best_fake, best_cost = int(fake[i]), float(cost[i])
                best_left = best_right = x
                best_count = int(region[i])
            elif (fake[i] == best_fake and x == best_right + 1
                  and cost[i] == best_cost):
                best_right = x
        x += 1
    if best_left < 0:
        return [], BIG, 0, 0
    end = (best_left + best_right) // 2 - origin
    if pred[end] < 0:  # plateau midpoint may be unreachable; fall back
        end = best_left - origin
    chain: list[int] = []
    i = end
    while i >= 0:
        chain.append(i + origin)
        i = int(pred[i])
    chain.reverse()
    # interior cuts: drop the seed (region-0 start) and the terminal end
    cuts = [c for c in chain[1:-1] if left_edge < c < right_edge]
    sync = float(sq_sum[end] - mean_sum[end] ** 2 / max(1, region[end]))
    return cuts, sync, int(fake[end]), int(mids[end])


def tune_pitch(
    projection: np.ndarray,
    boxes: list[tuple[int, int]],
    pitch: int,
    pitch_range: int = 2,
    tolerance: float = 0.15,
) -> tuple[int, float]:
    """Pitch tuning by sync cost (``tune_row_pitch``,
    src/textord/topitch.cpp:1066-1160 with textord_pitch_range=2): run
    the pitch-sync DP at the initial pitch and at +-1..pitch_range and
    keep the pitch whose segmentation has the least sync cost — the
    reference's refinement of the statistical pitch estimate before
    chopping.  The sync statistic scores the SEGMENTATION, so
    neighbouring pitches that land on the same cut sequence tie; the
    returned pitch is therefore derived from the winning segmentation's
    cell widths (the reference likewise recomputes row->fixed_pitch
    from the chosen cell list, topitch.cpp:475-520).  Returns
    (best_pitch, best_cost)."""
    best_p, best_c = int(pitch), np.inf
    best_cuts: list[int] = []
    for delta in range(-pitch_range, pitch_range + 1):
        p = int(pitch) + delta
        if p < 3:
            continue
        err = max(1, int(round(tolerance * p)))
        cuts, cost, fakes, _m = check_pitch_sync(projection, boxes, p, err)
        # faked (through-ink) cuts disqualify a pitch when a fake-free
        # competitor exists (compute_pitch_sd sums occupied-cell costs)
        cost = cost + fakes * max(1.0, float(np.max(projection))) ** 2
        if cost < best_c:
            best_p, best_c, best_cuts = p, cost, cuts
    if len(best_cuts) >= 2:
        best_p = int(round(float(np.median(np.diff(best_cuts)))))
    return best_p, best_c


def fixed_pitch_cuts(
    run: np.ndarray, pitch: float, tolerance: float = 0.15
) -> list[int]:
    """Chop positions inside ONE merged glyph run of a fixed-pitch row
    (the fpchop operator, src/textord/fpchop.cpp:72-220
    ``fixed_pitch_words`` / ``chop_blobs``): the run holds
    round(width / pitch) cells, and the cell-boundary cuts are placed
    by the pitch-sync dynamic program (``check_pitch_sync``, above) —
    the reference's own cut placer (fpchop consumes the FPSEGPT list
    check_pitch_sync2 builds).  Unlike the concavity/seam chopper
    (chopper.cpp), this cuts even where glyphs touch with NO thin
    seam — the lattice, not the ink, decides; ink only *nudges* the
    cut within the tolerance via the offset/balance charges.  Returns
    ascending cut x-offsets within the run (empty when the run is a
    single cell)."""
    w = run.shape[1]
    p = int(round(pitch))
    n_cells = int(round(w / pitch))
    if n_cells < 2:
        return []
    col_ink = run.sum(axis=0)
    err = max(1, int(round(tolerance * pitch)))
    cuts, _sync, _fake, _mid = check_pitch_sync(
        col_ink, [(0, w)], p, err
    )
    if len(cuts) == n_cells - 1:
        return cuts
    # DP found a different cell count (extreme aspect runs): fall back
    # to lattice positions snapped to min ink, the pre-DP behavior
    cuts = []
    half = err
    for k in range(1, n_cells):
        x = int(round(k * w / n_cells))
        lo = max((cuts[-1] + 1) if cuts else 1, x - half)
        hi = min(w - 1, x + half + 1)
        if lo >= hi:
            continue
        win = col_ink[lo:hi]
        cand = lo + np.flatnonzero(win == win.min())
        cuts.append(int(cand[np.argmin(np.abs(cand - x))]))
    return cuts


def segment_fixed_pitch_words(
    centers: np.ndarray, pitch: float, gap_cells: int = 1
) -> list[list[int]]:
    """Chop a fixed-pitch row into words: a gap of more than ``gap_cells``
    empty lattice cells separates words (the fixed-pitch chopper's word
    rule, topitch/wordseg)."""
    order = np.argsort(centers, kind="stable")
    sorted_c = np.asarray(centers, dtype=np.float64)[order]
    words: list[list[int]] = [[int(order[0])]]
    for prev, idx in zip(range(len(order) - 1), order[1:]):
        gap = sorted_c[prev + 1] - sorted_c[prev]
        if gap > (gap_cells + 0.5) * pitch:
            words.append([])
        words[-1].append(int(idx))
    return words
