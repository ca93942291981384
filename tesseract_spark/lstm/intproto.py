"""Legacy static shape classifier: micro-features, class pruner, matcher.

The OEM_TESSERACT_ONLY static half of the classify subsystem,
re-expressed over the fixture font:

- **Outline tracing** (``ConvertBlob`` / edgblob.cpp): each blob's outer
  boundary and every hole boundary become closed point loops (Moore
  neighbor tracing; holes are background components not touching the
  crop border).
- **Micro-features** (``BlobMicroFeatures`` src/classify/mfx.cpp:54-78):
  outline segments between direction-change extremities
  (``MarkDirectionChanges`` / ``NextExtremity``,
  src/classify/mfoutline.cpp:103-203), each described by
  (x, y, length, direction) — ``ExtractMicroFeature`` mfx.cpp:127-143 —
  in char-normalized coordinates (the cn_denorm role: x about the blob
  centroid, y about the canonical strip frame so baseline position
  survives, both scaled by the cell height).
- **Class pruner** (``ClassPruner`` src/classify/intmatcher.cpp:127-260;
  NUM_CP_BUCKETS intproto.h:55): features quantize into an
  (x, y, direction) bucket grid; classes owning a prototype in the same
  or neighboring bucket collect votes, and classes below a fraction of
  the best vote are pruned before the expensive match.
- **Integer matcher** (``IntegerMatcher::Match``
  src/classify/intmatcher.cpp:450-520): two-way evidence — every blob
  feature must be explained by some prototype AND every prototype must
  be covered by some feature (the proto/config evidence product) — so a
  partial glyph matches poorly even when all its strokes fit.

The prototype bank is built from the rendered fixture font itself (the
role of inttemp built by mftraining over the training set).  This is the
static complement of the ADAPTIVE classifier in lstm/adaptive.py
(AdaptMatch's two halves, src/classify/adaptmatch.cpp:202-440), and the
chop pass in templates.chop_run gives joined blobs the
chopper.cpp/segsearch.cpp treatment.

Feature-set note: the reference also derives pico-features and
char-norm features from the same outlines (src/classify/picofeat.cpp:
30-180); the micro-feature path implemented here is the one its
shape classifier scores with, and the int encoding covers the
uint8 domain both share (intproto.h:121-131).
"""

from __future__ import annotations

import numpy as np

from ..functions.fonts import CELL_H, CHARSET, get_font

# quantization grid (NUM_CP_BUCKETS=24 over a 256-unit frame,
# intproto.h:55; scaled down to the 16-px canonical cell)
CP_XY_BUCKETS = 12
CP_DIR_BUCKETS = 8
# pruner keep fraction (classify_class_pruner_threshold semantics,
# intmatcher.cpp:229-247: classes below a fraction of the best count die)
CP_KEEP_FRACTION = 0.55
# matcher similarity kernel widths (normalized units)
SIGMA_XY = 0.12
SIGMA_DIR = 0.15  # in turns (circular)
SIGMA_LEN = 0.25

_NBR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

# Moore neighborhood in clockwise order starting East
_MOORE = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def trace_boundary(mask: np.ndarray, start: tuple[int, int]) -> list[tuple[int, int]]:
    """Moore-neighbor boundary trace of the component containing
    ``start`` (a boundary pixel with its West neighbor OFF).  Returns the
    closed loop of boundary pixel coordinates (r, c)."""
    h, w = mask.shape

    def on(r: int, c: int) -> bool:
        return 0 <= r < h and 0 <= c < w and bool(mask[r, c])

    loop = [start]
    # backtrack starts West of the start pixel
    prev = (start[0], start[1] - 1)
    cur = start
    while True:
        # find prev in the Moore ring of cur, scan clockwise from it
        ring = [(cur[0] + dr, cur[1] + dc) for dr, dc in _MOORE]
        try:
            k = ring.index(prev)
        except ValueError:
            k = 0
        nxt = None
        for j in range(1, 9):
            cand = ring[(k + j) % 8]
            if on(*cand):
                nxt = cand
                prev = ring[(k + j - 1) % 8]
                break
        if nxt is None:
            return loop  # isolated pixel
        if nxt == start and len(loop) > 1:
            return loop
        loop.append(nxt)
        cur = nxt
        if len(loop) > 4 * h * w:  # safety net
            return loop


def blob_outlines(mask: np.ndarray) -> list[list[tuple[int, int]]]:
    """All boundary loops of a blob mask: the outer boundary of each ink
    component plus the boundary of every hole (ConvertBlob's outline
    list — 'o' yields two outlines)."""
    from ..functions.image_ops import label_and_stats

    loops: list[list[tuple[int, int]]] = []
    labels, n, stats = label_and_stats(mask)
    for i in range(n):
        l, t, _r, _b, _a = (int(v) for v in stats[i])
        # leftmost ink pixel of the top row of the component
        comp = labels == i + 1
        rs, cs = np.nonzero(comp)
        j = np.lexsort((cs, rs))[0]
        loops.append(trace_boundary(comp, (int(rs[j]), int(cs[j]))))
    # holes: background components not touching the border
    bg = ~mask
    blab, bn, bstats = label_and_stats(bg, connectivity=4)
    h, w = mask.shape
    for i in range(bn):
        l, t, r, b, _a = (int(v) for v in bstats[i])
        if l == 0 or t == 0 or r == w or b == h:
            continue  # touches border: not a hole
        comp = blab == i + 1
        rs, cs = np.nonzero(comp)
        j = np.lexsort((cs, rs))[0]
        loops.append(trace_boundary(comp, (int(rs[j]), int(cs[j]))))
    return loops


def _extremities(loop: list[tuple[int, int]]) -> list[int]:
    """Indices of direction-change points (MarkDirectionChanges,
    mfoutline.cpp:165-182): walk the loop in coarse steps and mark where
    the 8-quantized direction changes."""
    n = len(loop)
    if n < 3:
        return list(range(n))
    step = max(1, n // 32)  # coarse sampling smooths pixel jitter
    idxs = list(range(0, n, step))
    dirs = []
    for k, i in enumerate(idxs):
        j = idxs[(k + 1) % len(idxs)]
        dr = loop[j][0] - loop[i][0]
        dc = loop[j][1] - loop[i][1]
        dirs.append(int(np.round(np.arctan2(dr, dc) / (np.pi / 4))) % 8)
    marks = [
        idxs[k]
        for k in range(len(idxs))
        if dirs[k] != dirs[(k - 1) % len(idxs)]
    ]
    return marks if len(marks) >= 2 else [idxs[0], idxs[len(idxs) // 2]]


def micro_features(mask: np.ndarray, y_frame: int = 0) -> np.ndarray:
    """Blob mask -> micro-feature array [n, 4] of (x, y, length, dir).

    x is centroid-relative, y is frame-relative (``y_frame`` = the row of
    this crop inside the canonical strip, so baseline position survives
    normalization — the cn_denorm role), both in units of CELL_H.
    Direction is in turns [0, 1); length in cell units.
    (BlobMicroFeatures mfx.cpp:54-78 + ExtractMicroFeature :127-143.)
    """
    rs, cs = np.nonzero(mask)
    if len(rs) == 0:
        return np.zeros((0, 4), dtype=np.float32)
    cx = float(cs.mean())
    feats = []
    for loop in blob_outlines(mask):
        marks = _extremities(loop)
        m = len(marks)
        for k in range(m):
            i, j = marks[k], marks[(k + 1) % m]
            p1, p2 = loop[i], loop[j]
            if p1 == p2:
                continue
            fx = ((p1[1] + p2[1]) / 2.0 - cx) / CELL_H
            fy = ((p1[0] + p2[0]) / 2.0 + y_frame) / CELL_H
            dr, dc = p2[0] - p1[0], p2[1] - p1[1]
            length = float(np.hypot(dr, dc)) / CELL_H
            direction = (np.arctan2(dr, dc) / (2 * np.pi)) % 1.0
            feats.append((fx, fy, length, direction))
    return np.asarray(feats, dtype=np.float32)


def int_features(feats: np.ndarray) -> np.ndarray:
    """INT_FEATURE_STRUCT re-encoding (intfx.cpp ExtractFeatures ->
    intproto.h:121-131: uint8 X, Y, Theta over the normalized char
    frame, INT_CHAR_NORM_RANGE=256 angular units): X maps [-1,1) cell
    units to 0..255, Y maps [0,2) to 0..255, Theta is the direction in
    256ths of a turn.  Returns [n, 4] uint8/float rows
    (X, Y, Theta, length) — length stays float because the reference
    implicitly carries it by emitting one unit-step feature per outline
    pixel while this matcher's kernel keeps the mfx length term (noted
    divergence; resolution is what the encoding proves)."""
    if len(feats) == 0:
        return np.zeros((0, 4), dtype=np.float32)
    X = np.clip(np.round((feats[:, 0] + 1.0) * 128.0), 0, 255)
    Y = np.clip(np.round(feats[:, 1] * 128.0), 0, 255)
    T = np.round(feats[:, 3] * 256.0).astype(np.int64) % 256
    return np.stack(
        [X, Y, T.astype(np.float64), feats[:, 2]], axis=1
    ).astype(np.float32)


def dequantize_int_features(ifeats: np.ndarray) -> np.ndarray:
    """uint8 (X, Y, Theta, length) back to the matcher's float frame —
    the integer matcher consumes the uint8 domain directly via lookup
    tables (intmatcher.cpp); here the dequantized features feed the
    same kernels, proving the uint8 resolution carries the decode."""
    if len(ifeats) == 0:
        return np.zeros((0, 4), dtype=np.float32)
    fx = ifeats[:, 0] / 128.0 - 1.0
    fy = ifeats[:, 1] / 128.0
    fd = (ifeats[:, 2] / 256.0) % 1.0
    return np.stack([fx, fy, ifeats[:, 3], fd], axis=1).astype(np.float32)


def _quantize(feats: np.ndarray) -> set[tuple[int, int, int]]:
    """(x, y, dir) bucket triples of a feature set (the ClassPruner
    quantization, intmatcher.cpp:166-172)."""
    out = set()
    for fx, fy, _ln, fd in feats:
        qx = int(np.clip((fx + 0.5) * CP_XY_BUCKETS, 0, CP_XY_BUCKETS - 1))
        qy = int(np.clip(fy * CP_XY_BUCKETS / 1.25, 0, CP_XY_BUCKETS - 1))
        qd = int(fd * CP_DIR_BUCKETS) % CP_DIR_BUCKETS
        out.add((qx, qy, qd))
    return out


def _pair_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[n, m] gaussian similarity between two micro-feature sets."""
    dx = a[:, None, 0] - b[None, :, 0]
    dy = a[:, None, 1] - b[None, :, 1]
    dl = a[:, None, 2] - b[None, :, 2]
    dd = np.abs(a[:, None, 3] - b[None, :, 3])
    dd = np.minimum(dd, 1.0 - dd)  # circular direction distance
    d2 = (
        (dx * dx + dy * dy) / (SIGMA_XY * SIGMA_XY)
        + (dd * dd) / (SIGMA_DIR * SIGMA_DIR)
        + (dl * dl) / (SIGMA_LEN * SIGMA_LEN)
    )
    return np.exp(-0.5 * d2)


class StaticShapeClassifier:
    """Prototype bank over the fixture font (the inttemp role) with the
    pruner + two-way-evidence match of the integer matcher."""

    def __init__(self, glyphs: str = CHARSET) -> None:
        font = get_font()
        self.glyphs = glyphs
        self.protos: list[np.ndarray] = []
        self.cells: list[set[tuple[int, int, int]]] = []
        for ch in glyphs:
            f = micro_features(font[ch].astype(bool), y_frame=0)
            self.protos.append(f)
            self.cells.append(_quantize(f))

    def prune(self, feats: np.ndarray) -> list[int]:
        """ClassPruner (intmatcher.cpp:127-260): bucket votes with
        one-bucket neighborhood tolerance; classes under
        CP_KEEP_FRACTION of the best vote are pruned."""
        cells = _quantize(feats)
        grown = set()
        for qx, qy, qd in cells:
            for dx, dy in _NBR_OFFSETS:
                for dd in (-1, 0, 1):
                    grown.add(
                        (qx + dx, qy + dy, (qd + dd) % CP_DIR_BUCKETS)
                    )
        # per-class normalization (the ClassPrunerNormCount role,
        # intmatcher.cpp:229-247): coverage of the class's own cells, so
        # a proto-rich class cannot crowd out a small glyph — a clean
        # glyph's true class always scores 1.0 and survives any cutoff
        votes = np.array(
            [len(grown & c) / max(1, len(c)) for c in self.cells],
            dtype=np.float64,
        )
        if votes.max() <= 0:
            return list(range(len(self.glyphs)))
        keep = votes >= CP_KEEP_FRACTION * votes.max()
        return [i for i in range(len(self.glyphs)) if keep[i]]

    def rate(self, feats: np.ndarray, class_i: int) -> float:
        """IntegerMatcher::Match (intmatcher.cpp:450-520) two-way
        evidence: mean best-match similarity of features against protos
        (feature evidence) times protos against features (proto
        evidence), geometric mean."""
        protos = self.protos[class_i]
        if len(feats) == 0 or len(protos) == 0:
            return 0.0
        sim = _pair_similarity(feats, protos)
        fe = float(sim.max(axis=1).mean())
        pe = float(sim.max(axis=0).mean())
        return float(np.sqrt(fe * pe))

    def classify(
        self, mask: np.ndarray, y_frame: int = 0, top_k: int = 3,
        disabled: frozenset[int] | None = None,
        int_encode: bool = False,
    ) -> list[tuple[str, float]]:
        """Blob mask -> [(char, rating)] best-first, pruner then match
        (CharNormClassifier -> PruneClasses -> Match, the adaptmatch
        static path, adaptmatch.cpp:1290-1360).

        ``disabled``: class indices suppressed by the char white/black
        lists — the pruner drops them before matching (the
        get_enabled gates, intmatcher.cpp:244 / adaptmatch.cpp:1133).

        ``int_encode``: round-trip the features through the uint8
        INT_FEATURE encoding (intfx.cpp) before matching — the
        reference's integer feature domain."""
        feats = micro_features(mask, y_frame)
        if int_encode and len(feats):
            feats = dequantize_int_features(int_features(feats))
        if len(feats) == 0:
            return []
        cand = self.prune(feats)
        if disabled:
            cand = [i for i in cand if i not in disabled]
        scored = [(self.glyphs[i], self.rate(feats, i)) for i in cand]
        scored.sort(key=lambda cr: (-cr[1], cr[0]))
        return scored[:top_k]


_STATIC: StaticShapeClassifier | None = None


def get_static_classifier() -> StaticShapeClassifier:
    """Worker singleton (the shared inttemp of a Tesseract instance)."""
    global _STATIC
    if _STATIC is None:
        _STATIC = StaticShapeClassifier()
    return _STATIC
