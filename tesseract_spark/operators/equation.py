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
