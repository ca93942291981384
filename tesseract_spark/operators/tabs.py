"""Tab vectors: aligned blob-edge columns (tabfind.cpp re-expression).

The reference finds tab stops — vertical lines through aligned blob
edges with clear gutters beside them — as its primary column-structure
evidence (``TabFind::FindInitialTabVectors`` src/textord/tabfind.cpp:512
over ``AlignedBlob::FindVerticalAlignment`` src/textord/alignedblob.cpp
:252-340 — the edge-stepping search this module's x-edge clustering
replaces,
candidate boxes :FindTabBoxes, merge/sort/evaluate :938-1080).  Here the
same evidence comes from box statistics:

- candidate tab edges: blob left (right) edges clustered within an
  alignment tolerance, supported by >= kMinAlignedBlobs blobs from
  distinct rows;
- gutter check: a tab edge only counts when the adjacent gutter side is
  ink-free over the vector's y-span (left tabs need empty space to the
  left, right tabs to the right — FindTabBoxes' gutter requirement);
- evaluation (``EvaluateTabs``): vectors are scored by aligned-blob
  count, near-duplicates merge (MergeSimilarTabVectors), and the list
  sorts by x (SortVectors).

The page stage's column-set vote (page._column_sets) consumes gap
evidence directly; tab vectors complement it for ragged-edge layouts
where a gutter is only clean on one side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K_MIN_ALIGNED_BLOBS = 3  # a real tab stop spans several rows
K_ALIGN_TOL = 2  # px: edge alignment tolerance (aligned_gap_fraction role)
K_GUTTER_W = 8  # px of clear space required on the outside of the edge


@dataclass
class TabVector:
    x: int
    y0: int
    y1: int
    kind: str  # 'left' | 'right'
    n_blobs: int


@dataclass
class TabVectorSeg:
    """The reference TabVector's line-segment geometry
    (src/textord/tabvector.h:160-260): a start/end point pair with the
    integer-arithmetic queries the tab grid uses.  The dataframe-side
    TabVector above is the axis-aligned (deskewed) special case; this
    scalar form carries slope for sheared pages and is the parity
    anchor for unittest/tabvector_test.cc (ported in
    tests/test_tabvector_colpartition.py)."""

    sx: int = 0
    sy: int = 0
    ex: int = 0
    ey: int = 0

    def set_startpt(self, x: int, y: int) -> None:
        self.sx, self.sy = int(x), int(y)

    def set_endpt(self, x: int, y: int) -> None:
        self.ex, self.ey = int(x), int(y)

    def x_at_y(self, y: int) -> int:
        # tabvector.h:181-188 — C++ integer division truncates toward 0.
        height = self.ey - self.sy
        if height != 0:
            num = (y - self.sy) * (self.ex - self.sx)
            q = abs(num) // abs(height)
            return (q if (num >= 0) == (height > 0) else -q) + self.sx
        return self.sx

    def v_overlap(self, top_y: int, bottom_y: int) -> int:
        # tabvector.h:195-198 — may be negative when disjoint.
        return min(top_y, self.ey) - max(bottom_y, self.sy)

    def v_overlap_vector(self, other: "TabVectorSeg") -> int:
        return min(other.ey, self.ey) - max(other.sy, self.sy)

    def xy_flip(self) -> None:
        # tabvector.h:247-255 — swap axes (vertical<->horizontal search).
        self.sx, self.sy = self.sy, self.sx
        self.ex, self.ey = self.ey, self.ex


def columns_overlap(first_a: int, last_a: int, first_b: int, last_b: int) -> bool:
    """ColPartition::IsInSameColumnAs (colpartition.cpp:2268-2274):
    column-index ranges count as the same column unless one lies
    completely to the side of the other (shared borders count)."""
    return last_a >= first_b and first_a <= last_b


def _edge_clusters(edges: np.ndarray, tol: int) -> list[np.ndarray]:
    """Anchor clustering: every member within tol of the cluster's FIRST
    (leftmost) edge.  Chained linkage would let a staircase of edges
    (each step <= tol, total spread unbounded) masquerade as one aligned
    line; anchoring bounds the spread at tol, like the reference's
    tolerance around the fitted tab line."""
    order = np.argsort(edges, kind="stable")
    groups: list[list[int]] = []
    anchor = None
    for i in order:
        if groups and anchor is not None and edges[i] - anchor <= tol:
            groups[-1].append(int(i))
        else:
            groups.append([int(i)])
            anchor = edges[i]
    return [np.asarray(g) for g in groups]


def find_tab_vectors(stats: np.ndarray) -> list[TabVector]:
    """Blob boxes (l, t, r, b, area) -> evaluated, x-sorted tab vectors."""
    if len(stats) == 0:
        return []
    out: list[TabVector] = []
    for kind, col in (("left", 0), ("right", 2)):
        for g in _edge_clusters(stats[:, col], K_ALIGN_TOL):
            if len(g) < K_MIN_ALIGNED_BLOBS:
                continue
            sub = stats[g]
            # distinct rows: tops must not all overlap one band
            tops = np.sort(sub[:, 1])
            distinct = 1 + int((np.diff(tops) > 2).sum())
            if distinct < K_MIN_ALIGNED_BLOBS:
                continue
            x = int(round(float(sub[:, col].mean())))
            y0, y1 = int(sub[:, 1].min()), int(sub[:, 3].max())
            # gutter check over the vector's y-span, measured OUTSIDE the
            # cluster's own extreme edge so members cannot self-shadow
            # an intrusion (FindTabBoxes' gutter requirement)
            if kind == "left":
                edge = int(sub[:, 0].min())
                lo, hi = edge - K_GUTTER_W, edge - 1
            else:
                edge = int(sub[:, 2].max())
                lo, hi = edge + 1, edge + K_GUTTER_W
            others = np.ones(len(stats), dtype=bool)
            others[g] = False
            ob = stats[others]
            intrudes = (
                (ob[:, 0] <= hi)
                & (ob[:, 2] >= lo)
                & (ob[:, 1] <= y1)
                & (ob[:, 3] >= y0)
            ).any()
            if intrudes:
                continue
            out.append(TabVector(x, y0, y1, kind, len(g)))
    # MergeSimilarTabVectors: same kind, overlapping y, close x
    merged: list[TabVector] = []
    for v in sorted(out, key=lambda v: (v.kind, v.x)):
        if (
            merged
            and merged[-1].kind == v.kind
            and abs(merged[-1].x - v.x) <= K_ALIGN_TOL * 2
            and v.y0 <= merged[-1].y1
            and merged[-1].y0 <= v.y1
        ):
            m = merged[-1]
            total = m.n_blobs + v.n_blobs
            merged[-1] = TabVector(
                (m.x * m.n_blobs + v.x * v.n_blobs) // total,
                min(m.y0, v.y0),
                max(m.y1, v.y1),
                m.kind,
                total,
            )
        else:
            merged.append(v)
    # SortVectors: by x then kind; EvaluateTabs already applied (support)
    merged.sort(key=lambda v: (v.x, v.kind))
    return merged
