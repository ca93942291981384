"""Equation-region detection (display + inline).

Re-expresses the decision core of ``EquationDetect``
(src/ccmain/equationdetect.cpp) over decoded text instead of blob-level
classifier outputs: the reference labels blobs BSTT_MATH/BSTT_DIGIT via
the 'equ' language pack (LabelSpecialText, equationdetect.cpp:129-215),
then seeds equation partitions by blob-count and math-density thresholds
and types them PT_EQUATION / PT_INLINE_EQUATION (publictypes.h:51-67).
Our engine knows the decoded glyph per blob, so the same counts are taken
over characters:

- seed gate (CheckSeedBlobsCount, equationdetect.cpp:942-957):
  >= kSeedBlobsCountTh glyphs, > kSeedMathBlobsCount math glyphs,
  math+digit > kSeedMathDigitBlobsCount;
- density gate (CheckSeedDensity, equationdetect.cpp:959-974):
  math+digit density > kMathDigitDensityTh1;
- a math-dense partition with same-line text neighbours stays inline
  (PT_INLINE_EQUATION, equationdetect.cpp:805-820) — here: a math-dense
  word inside a line of ordinary words.

The geometric core (IsIndented, IsNearSmallNeighbor, CountAlignment,
SplitCPHor/Lite, ComputeForegroundDensity, the BSTT blob typing) is
ported exactly below over frame-agnostic (left, y0, right, y1) boxes —
verified by the reference's own equationdetect_test.cc fixtures — and
the seeds2 path (a LEFT-indented partition passing the LOW density
threshold, equationdetect.cpp:540-545) feeds the paragraph kind
election alongside the high-density seeds1 gate.
"""

from __future__ import annotations

from ..functions.fonts import MATH_CHARSET

MATH_CHARS = frozenset(MATH_CHARSET)

K_MATH_DIGIT_DENSITY_TH1 = 0.25  # equationdetect.cpp:78
K_SEED_BLOBS_COUNT_TH = 10  # equationdetect.cpp:82
K_SEED_MATH_BLOBS_COUNT = 2  # equationdetect.cpp:946
K_SEED_MATH_DIGIT_BLOBS_COUNT = 5  # equationdetect.cpp:947


def _counts(text: str) -> tuple[int, int, int]:
    glyphs = [c for c in text if not c.isspace()]
    math = sum(1 for c in glyphs if c in MATH_CHARS)
    digit = sum(1 for c in glyphs if c.isdigit())
    return len(glyphs), math, digit


def is_equation_text(text: str) -> bool:
    """Display-equation seed test over one partition's decoded text
    (CheckSeedBlobsCount + CheckSeedDensity with kMathDigitDensityTh1)."""
    n, math, digit = _counts(text)
    if (
        n < K_SEED_BLOBS_COUNT_TH
        or math <= K_SEED_MATH_BLOBS_COUNT
        or math + digit <= K_SEED_MATH_DIGIT_BLOBS_COUNT
    ):
        return False
    return (math + digit) / n > K_MATH_DIGIT_DENSITY_TH1


# ---------------------------------------------------------------------------
# Geometric core, ported exactly (boxes are (left, y0, right, y1) with
# y0 <= y1 in ANY consistent frame — every predicate below is interval
# arithmetic, so the reference's y-up TBOX fixtures and this engine's
# y-down page boxes both work unchanged)

# BlobSpecialTextType (blobbox.h:93-101)
BSTT_NONE = 0
BSTT_ITALIC = 1
BSTT_DIGIT = 2
BSTT_MATH = 3
BSTT_UNCLEAR = 4

K_MATH_DIGIT_DENSITY_TH2 = 0.1  # equationdetect.cpp:79
K_LEFT_INDENT_ALIGNMENT_COUNT_TH = 1  # equationdetect.cpp:81

# EstimateTypeForUnichar's punctuation exclusions
# (equationdetect.cpp:229-232)
_PUNCT_NOT_MATH = frozenset("'`\"\\,.〈〉《》」「")


def estimate_type_for_unichar(ch: str) -> int:
    """EstimateTypeForUnichar (equationdetect.cpp:218-248): alphas are
    plain text; punctuation is math unless in the confusables list;
    digits (plus '|') are digits; everything else is math."""
    if ch.isalpha():
        return BSTT_NONE
    is_punct = not ch.isalnum() and not ch.isspace()
    if is_punct and ch in _PUNCT_NOT_MATH:
        return BSTT_NONE
    if ch.isdigit() or ch == "|":
        return BSTT_DIGIT
    return BSTT_MATH  # remaining punctuation and symbols alike


def x_gap(a, b) -> int:
    """TBOX::x_gap (rect.h:238): negative = overlap amount."""
    return max(a[0], b[0]) - min(a[2], b[2])


def y_gap(a, b) -> int:
    return max(a[1], b[1]) - min(a[3], b[3])


def x_overlap(a, b) -> bool:
    return a[0] <= b[2] and b[0] <= a[2]


def y_overlap(a, b) -> bool:
    return a[1] <= b[3] and b[1] <= a[3]


def major_x_overlap(a, b) -> bool:
    """Overlap by more than half the narrower box's width (rect.h:251)."""
    ov = min(a[2], b[2]) - max(a[0], b[0])
    return ov * 2 > min(a[2] - a[0], b[2] - b[0])


def major_y_overlap(a, b) -> bool:
    ov = min(a[3], b[3]) - max(a[1], b[1])
    return ov * 2 > min(a[3] - a[1], b[3] - b[1])


def count_alignment(sorted_vec: list[int], val: int, resolution: int = 300) -> int:
    """CountAlignment (equationdetect.cpp:727-751): entries within
    0.03 * resolution of val, scanned out from the insertion point."""
    if not sorted_vec:
        return 0
    import bisect

    dist_th = round(0.03 * resolution)
    pos = bisect.bisect_right(sorted_vec, val)
    if pos > 0:
        pos -= 1
    count = 0
    i = pos
    while i >= 0 and abs(val - sorted_vec[i]) < dist_th:
        count += 1
        i -= 1
    i = pos + 1
    while i < len(sorted_vec) and sorted_vec[i] - val < dist_th:
        count += 1
        i += 1
    return count


def check_seed_blobs_count(n_blobs: int, math_blobs: int, digit_blobs: int) -> bool:
    """CheckSeedBlobsCount (equationdetect.cpp:942-957)."""
    return not (
        n_blobs < K_SEED_BLOBS_COUNT_TH
        or math_blobs <= K_SEED_MATH_BLOBS_COUNT
        or math_blobs + digit_blobs <= K_SEED_MATH_DIGIT_BLOBS_COUNT
    )


# IndentType (equationdetect.h)
NO_INDENT, LEFT_INDENT, RIGHT_INDENT, BOTH_INDENT = 0, 1, 2, 3


def is_indented(neighbor_boxes: list, part_box, resolution: int = 300) -> int:
    """IsIndented (equationdetect.cpp:976-1040): search neighbours
    within 3*resolution of the part's centre; a same-line close
    neighbour means an over-segmented fragment (NO_INDENT); an
    above/below neighbour within 0.5*resolution whose edges extend past
    the part's marks the left/right indent."""
    x_gap_th = round(0.5 * resolution)
    radius_th = round(3.0 * resolution)
    y_gap_th = round(0.5 * resolution)
    cx = (part_box[0] + part_box[2]) / 2
    cy = (part_box[1] + part_box[3]) / 2
    left_ind = right_ind = False
    # distance-ordered walk = the grid radius search
    def dist(nb):
        nx = min(max(cx, nb[0]), nb[2])
        ny = min(max(cy, nb[1]), nb[3])
        return max(abs(nx - cx), abs(ny - cy))

    for nb in sorted(neighbor_boxes, key=dist):
        if nb == part_box or dist(nb) > radius_th:
            continue
        if major_y_overlap(part_box, nb) and x_gap(part_box, nb) < x_gap_th:
            return NO_INDENT  # fragment of an over-segmented partition
        if not x_overlap(part_box, nb) or y_overlap(part_box, nb):
            continue
        if y_gap(part_box, nb) < y_gap_th:
            if part_box[0] - nb[0] > x_gap_th:
                left_ind = True
            if nb[2] - part_box[2] > x_gap_th:
                right_ind = True
        if left_ind and right_ind:
            break
    if left_ind and right_ind:
        return BOTH_INDENT
    if left_ind:
        return LEFT_INDENT
    if right_ind:
        return RIGHT_INDENT
    return NO_INDENT


def is_near_small_neighbor(seed_box, part_box, resolution: int = 300) -> bool:
    """IsNearSmallNeighbor (equationdetect.cpp:1213-1229)."""
    x_gap_th = round(0.25 * resolution)
    y_gap_th = round(0.05 * resolution)
    if (part_box[3] - part_box[1]) > (seed_box[3] - seed_box[1]) or (
        part_box[2] - part_box[0]
    ) > (seed_box[2] - seed_box[0]):
        return False
    if (
        not major_x_overlap(part_box, seed_box)
        or y_gap(part_box, seed_box) > y_gap_th
    ) and (
        not major_y_overlap(part_box, seed_box)
        or x_gap(part_box, seed_box) > x_gap_th
    ):
        return False
    return True


def foreground_density(ink, tbox) -> float:
    """ComputeForegroundDensity (equationdetect.cpp:586-597): ink
    fraction inside a y-UP TBOX over a y-down image array."""
    h = ink.shape[0]
    l, b, r, t = tbox
    sub = ink[max(0, h - t) : max(0, h - b), max(0, l) : max(0, r)]
    return float(sub.mean()) if sub.size else 0.0


def cps_super_bbox(boxes: list) -> tuple:
    """ComputeCPsSuperBBox (equationdetect.cpp:761-770)."""
    return (
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    )


def split_cp_hor_lite(boxes: list, median_width: int) -> list:
    """SplitCPHorLite (equationdetect.cpp:670-706): union runs of
    left-sorted blob boxes, breaking where the next left edge clears
    the running right edge by > 3 * median width."""
    out: list = []
    if median_width == 0:
        return out
    threshold = median_width * 3.0
    union = None
    prev_right = None
    for box in boxes:
        if prev_right is not None and box[0] - prev_right > threshold:
            out.append(union)
            prev_right = None
        if prev_right is None:
            union = tuple(box)
        else:
            union = (
                min(union[0], box[0]),
                min(union[1], box[1]),
                max(union[2], box[2]),
                max(union[3], box[3]),
            )
        prev_right = max(prev_right if prev_right is not None else box[2],
                         box[2])
    if prev_right is not None:
        out.append(union)
    return out


def split_cp_hor(boxes: list, median_width: int) -> list:
    """SplitCPHor (equationdetect.cpp:620-668): like the lite variant
    but returning each piece's blob group (the partition split)."""
    groups: list = []
    if median_width == 0 or not boxes:
        return groups
    threshold = median_width * 3.0
    cur: list = []
    prev_right = None
    for box in boxes:
        if prev_right is not None and box[0] - prev_right > threshold:
            groups.append(cur)
            cur = []
            prev_right = None
        cur.append(tuple(box))
        prev_right = max(prev_right if prev_right is not None else box[2],
                         box[2])
    if cur:
        groups.append(cur)
    return groups


def is_equation_para(
    text: str,
    part_box=None,
    neighbor_boxes: list | None = None,
    resolution: int = 300,
) -> bool:
    """The paragraph-level seed election: seeds1 = the high-density
    gate (is_equation_text); seeds2 (equationdetect.cpp:540-545) = a
    LEFT-indented paragraph passing CheckSeedBlobsCount and the LOW
    density threshold kMathDigitDensityTh2."""
    if is_equation_text(text):
        return True
    if part_box is None or not neighbor_boxes:
        return False
    n, math, digit = _counts(text)
    if not check_seed_blobs_count(n, math, digit):
        return False
    if (math + digit) / n <= K_MATH_DIGIT_DENSITY_TH2:
        return False
    indent = is_indented(neighbor_boxes, part_box, resolution)
    return indent in (LEFT_INDENT, BOTH_INDENT)


# ---------------------------------------------------------------------------
# Seed expansion + satellite merge (ExpandSeed, equationdetect.cpp:1038-1077;
# ExpandSeedHorizontal :1080-1129; ExpandSeedVertical :1132-1210;
# SearchByOverlap :447-491; ProcessMathBlockSatelliteParts :1248-1293)
# over a text region's top-down paragraph list.  The reference expands on
# ColPartitions in a BBGrid; a region's paragraphs are the partition set
# here (full-width row groups), so the grid searches reduce to ordered
# scans of the paragraph list — same predicates, same constants.

K_UNCLEAR_DENSITY_TH = 0.25  # equationdetect.cpp:81


def x_overlap_fraction(a, b) -> float:
    """TBOX::x_overlap_fraction (rect.h:463): overlap as a fraction of
    A's width (degenerate width: 1.0 if contained)."""
    w = a[2] - a[0]
    if w == 0:
        return 1.0 if b[0] <= a[0] <= b[2] else 0.0
    return max(0.0, (min(a[2], b[2]) - max(a[0], b[0])) / w)


def y_overlap_fraction(a, b) -> float:
    h = a[3] - a[1]
    if h == 0:
        return 1.0 if b[1] <= a[1] <= b[3] else 0.0
    return max(0.0, (min(a[3], b[3]) - max(a[1], b[1])) / h)


def check_seed_neighbor_density(text: str) -> bool:
    """CheckSeedNeighborDensity (equationdetect.cpp:1232-1245): few
    glyphs skip the check; else math+digit density must clear the HIGH
    threshold.  (The unclear-blob branch is structurally absent here:
    glyphs are decoded, so BSTT_UNCLEAR density is always 0.)"""
    n, math, digit = _counts(text)
    if n < K_SEED_BLOBS_COUNT_TH:
        return True
    return (math + digit) / n > K_MATH_DIGIT_DENSITY_TH1


def _union(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


_GRID_BIG = 1 << 40  # unbounded query side (BoxGrid clamps to its extent)


def _cand_indices(grid, dirty, window, n):
    """Candidate indices for one partner scan: the BBGrid-style bucket
    query (boxgrid.py; the reference's GridSearch over ColPartitionGrid,
    colpartitiongrid.cpp:1212) plus every index whose box GREW since the
    grid was built (absorbing seeds) — an exact superset of the flat
    scan, so the predicates below see identical candidates."""
    if grid is None:
        return range(n)
    idx = grid.query(window)
    if dirty:
        import numpy as _np

        idx = _np.union1d(idx, _np.fromiter(dirty, dtype=_np.int64))
    return idx.tolist()


def _expand_vertical(
    s: int,
    down: bool,
    box: list,
    kinds: list[str],
    texts: list[str],
    alive: list[bool],
    resolution: int,
    grid=None,
    dirty=(),
) -> list[int]:
    """ExpandSeedVertical (equationdetect.cpp:1132-1210) in one
    direction.  ``down`` = toward larger y (the page's y-down frame;
    direction flips are pure interval arithmetic)."""
    y_gap_th = round(0.2 * resolution)
    x_ov_th = 0.4
    sb = box[s]
    window = (-_GRID_BIG, sb[1] - y_gap_th, _GRID_BIG, sb[3] + y_gap_th)
    cands = [
        i
        for i in _cand_indices(grid, dirty, window, len(box))
        if alive[i] and i != s and y_gap(box[i], sb) <= y_gap_th
        # part must extend beyond the seed's edge in the search direction
        and ((box[i][3] > sb[3]) if down else (box[i][1] < sb[1]))
    ]
    picked: list[int] = []
    # the skipped-part fence: a candidate entirely beyond a skipped
    # non-equation part must not be jumped over (:1196-1209)
    skipped_far = None
    for i in sorted(cands, key=lambda i: y_gap(box[i], sb)):
        if kinds[i] != "equation":
            if not (
                is_near_small_neighbor(sb, box[i], resolution)
                and check_seed_neighbor_density(texts[i])
            ):
                # fence value = the skipped part's FAR edge (the
                # reference's skipped_max_bottom / skipped_min_top): a
                # later candidate entirely beyond it is fenced off
                if down:
                    skipped_far = (
                        box[i][3]
                        if skipped_far is None
                        else min(skipped_far, box[i][3])
                    )
                else:
                    skipped_far = (
                        box[i][1]
                        if skipped_far is None
                        else max(skipped_far, box[i][1])
                    )
                continue
        elif (
            x_overlap_fraction(box[i], sb) < x_ov_th
            and x_overlap_fraction(sb, box[i]) < x_ov_th
        ):
            continue
        picked.append(i)
    if skipped_far is not None:
        picked = [
            i
            for i in picked
            if (box[i][1] < skipped_far if down else box[i][3] > skipped_far)
        ]
    return picked


def _expand_horizontal(
    s: int,
    left: bool,
    box: list,
    kinds: list[str],
    texts: list[str],
    alive: list[bool],
    resolution: int,
    grid=None,
    dirty=(),
) -> list[int]:
    """ExpandSeedHorizontal (equationdetect.cpp:1080-1129)."""
    x_gap_th = round(0.2 * resolution)
    y_ov_th = 0.6
    sb = box[s]
    window = (sb[0] - x_gap_th, -_GRID_BIG, sb[2] + x_gap_th, _GRID_BIG)
    picked: list[int] = []
    for i in _cand_indices(grid, dirty, window, len(box)):
        if not alive[i] or i == s or x_gap(box[i], sb) > x_gap_th:
            continue
        if (box[i][0] >= sb[0]) if left else (box[i][2] <= sb[2]):
            continue
        if kinds[i] != "equation":
            if not (
                is_near_small_neighbor(sb, box[i], resolution)
                and check_seed_neighbor_density(texts[i])
            ):
                continue
        elif (
            y_overlap_fraction(box[i], sb) < y_ov_th
            and y_overlap_fraction(sb, box[i]) < y_ov_th
        ):
            continue
        picked.append(i)
    return picked


def _search_by_overlap(
    s: int, box: list, kinds: list[str], alive: list[bool],
    grid=None, dirty=(),
) -> list[int]:
    """SearchByOverlap (equationdetect.cpp:447-491): absorb parts the
    expanded seed box now overlaps."""
    sb = box[s]
    picked = []
    for i in _cand_indices(grid, dirty, tuple(sb), len(box)):
        if not alive[i] or i == s:
            continue
        xf, yf = x_overlap_fraction(box[i], sb), y_overlap_fraction(box[i], sb)
        if (xf >= 0.95 and yf >= 0.95) or (
            (xf > 0.4 and yf > 0.0) or (xf > 0.0 and yf > 0.5)
        ):
            picked.append(i)
    return picked


def expand_equation_paragraphs(
    boxes: list, texts: list[str], resolution: int = 300
) -> tuple[list[list[int]], list[bool]]:
    """Full post-seed pass over one region's paragraphs: seed election
    (seeds1 density + seeds2 indent, equationdetect.cpp:510-545), four-way
    seed expansion with absorb (:1038-1077), overlap sweep, then the
    math-block satellite merge (:1248-1293).

    Returns ``(groups, is_equation)``: ``groups`` partitions the original
    paragraph indices (each group ascending, groups ordered by first
    member); ``is_equation[k]`` forces the merged group's span kind —
    absorbed text keeps the seed's PT_EQUATION type (ColPartition::Absorb
    keeps the absorbing partition's type) even where dilution would fail
    the density gate on the merged text.
    """
    n = len(boxes)
    kinds = [
        "equation"
        if is_equation_para(
            texts[i],
            boxes[i],
            [b for j, b in enumerate(boxes) if j != i],
            resolution,
        )
        else "text"
        for i in range(n)
    ]
    if "equation" not in kinds or n == 1:
        return [[i] for i in range(n)], [k == "equation" for k in kinds]

    box = list(boxes)
    alive = [True] * n
    members: list[list[int]] = [[i] for i in range(n)]
    # BBGrid-style bucket index over the INITIAL boxes (the reference
    # expands seeds through GridSearch over a ColPartitionGrid,
    # equationdetect.cpp:1080/1132).  Boxes that grow via Absorb go in
    # `dirty` and are re-included in every scan, so candidate sets stay
    # exactly the flat scan's.  Small regions skip the index.
    if n >= 64:
        from .boxgrid import BoxGrid

        grid = BoxGrid(box, gridsize=max(16, round(0.2 * resolution)))
    else:
        grid = None
    dirty: set[int] = set()

    def absorb(s: int, parts: list[int]) -> bool:
        did = False
        for p in parts:
            if not alive[p] or p == s:
                continue
            alive[p] = False
            members[s].extend(members[p])
            box[s] = _union(box[s], box[p])
            did = True
        if did:
            dirty.add(s)
        return did

    for s in range(n):
        if kinds[s] != "equation" or not alive[s]:
            continue
        # iterate until this seed stops growing (the reference re-queues
        # seeds whose Absorb expanded the box)
        while True:
            parts = (
                _expand_horizontal(s, True, box, kinds, texts, alive,
                                   resolution, grid, dirty)
                + _expand_horizontal(s, False, box, kinds, texts, alive,
                                     resolution, grid, dirty)
                + _expand_vertical(s, False, box, kinds, texts, alive,
                                   resolution, grid, dirty)
                + _expand_vertical(s, True, box, kinds, texts, alive,
                                   resolution, grid, dirty)
                + _search_by_overlap(s, box, kinds, alive, grid, dirty)
            )
            if not absorb(s, parts):
                break

    # ---- ProcessMathBlockSatelliteParts (:1248-1293) ----------------------
    text_idx = [i for i in range(n) if alive[i] and kinds[i] != "equation"]
    if text_idx and any(alive[i] and kinds[i] == "equation" for i in range(n)):
        heights = sorted(box[i][3] - box[i][1] for i in text_idx)
        m = len(heights)
        med_h = heights[m // 2]
        if m % 2 == 0 and m > 1:
            med_h = round(0.5 * (heights[m // 2 - 1] + med_h))
        nn_gap_th = round(0.5 * resolution)
        near_th = round(0.1 * resolution)
        for t in text_idx:
            if not alive[t] or box[t][3] - box[t][1] > med_h:
                continue
            # nearest vertical neighbors (SearchNNVertical, :1352-1385)
            nn_window = (box[t][0], box[t][1] - nn_gap_th,
                         box[t][2], box[t][3] + nn_gap_th)
            nn_cands = _cand_indices(grid, dirty, nn_window, n)
            nbrs = []
            for up in (False, True):
                best, best_gap = None, None
                for i in nn_cands:
                    if i == t or not alive[i]:
                        continue
                    g = y_gap(box[i], box[t])
                    if g > nn_gap_th or not major_x_overlap(box[i], box[t]):
                        continue
                    if up and box[i][1] > box[t][1]:
                        continue
                    if not up and box[i][3] < box[t][3]:
                        continue
                    if best_gap is None or g < best_gap:
                        best, best_gap = i, g
                nbrs.append((best, best_gap))
            if nbrs[0][0] is not None and nbrs[0][0] == nbrs[1][0]:
                nbrs[1] = (None, None)
            found = [x for x in nbrs if x[0] is not None]
            if not found:
                continue
            lo = min(box[i][0] for i, _ in found)
            hi = max(box[i][2] for i, _ in found)
            if box[t][0] < lo or box[t][2] > hi:
                continue
            found.sort(key=lambda x: x[1])
            near, near_gap = found[0]
            # IsNearMathNeighbor (:1388-1394)
            if kinds[near] != "equation" or near_gap > near_th:
                continue
            blocks = [near]
            if len(found) > 1:
                far, far_gap = found[1]
                if kinds[far] == "equation" and far_gap <= near_th:
                    blocks.append(far)
            # text_part becomes PT_EQUATION and absorbs the math blocks
            kinds[t] = "equation"
            absorb(t, blocks)

    order = sorted((i for i in range(n) if alive[i]), key=lambda i: min(members[i]))
    return (
        [sorted(members[i]) for i in order],
        [kinds[i] == "equation" for i in order],
    )


def inline_equation_words(words: list[str]) -> list[int]:
    """Indices of inline-equation words: math-dense tokens embedded in a
    line that is NOT itself an equation (PT_INLINE_EQUATION,
    equationdetect.cpp:805-820 — a math partition with same-line text
    neighbours keeps the text flow)."""
    if is_equation_text(" ".join(words)):
        return []  # the whole line is a display equation
    out = []
    for i, w in enumerate(words):
        n, math, digit = _counts(w)
        if n >= 3 and math >= 1 and (math + digit) / n > 0.5:
            out.append(i)
    return out
