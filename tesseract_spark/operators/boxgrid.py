"""BBGrid-style spatial bucketing for per-page partner/merge searches.

The reference accelerates every partner/merge scan over ColPartitions
with a uniform bounding-box grid (``src/textord/bbgrid.h``;
``ColPartitionGrid::FindPartitionPartners`` colpartitiongrid.cpp:1212
walks only the grid cells a radius-dilated box covers).  The engine's
page stage runs inside Arrow batches, so the analogue is a numpy-backed
uniform grid: boxes index into cells once (vectorized), and a query
returns only the candidates whose cells intersect the query rect —
turning the flat O(parts) scan per seed/partner probe into O(local
density).  A pathological 10k-blob page stays bounded instead of
becoming the partition's straggler task.
"""

from __future__ import annotations

import numpy as np


class BoxGrid:
    """Uniform-cell spatial index over [l, t, r, b] boxes (y-down frame;
    any consistent frame works — only overlap queries are answered).

    gridsize mirrors BBGrid's cell granularity (the reference uses
    ~2x the median blob size, colfind.cpp kMinGutterWidthGrid context);
    64 px is a good default for 300-dpi pages.
    """

    def __init__(self, boxes, gridsize: int = 64):
        self.boxes = np.asarray(boxes, dtype=np.int64).reshape(-1, 4)
        self.gridsize = int(gridsize)
        n = len(self.boxes)
        if n == 0:
            self._bucket_keys = np.empty(0, dtype=np.int64)
            self._bucket_starts = np.empty(0, dtype=np.int64)
            self._entries = np.empty(0, dtype=np.int64)
            self._x0 = self._y0 = 0
            self._nx = self._ny = 1
            return
        g = self.gridsize
        cx0 = self.boxes[:, 0] // g
        cx1 = self.boxes[:, 2] // g
        cy0 = self.boxes[:, 1] // g
        cy1 = self.boxes[:, 3] // g
        self._x0 = int(cx0.min())
        self._y0 = int(cy0.min())
        self._nx = int(cx1.max()) - self._x0 + 1
        self._ny = int(cy1.max()) - self._y0 + 1
        # vectorized insertion: one (cell, box) pair per covered cell
        nx_span = (cx1 - cx0 + 1).astype(np.int64)
        ny_span = (cy1 - cy0 + 1).astype(np.int64)
        counts = nx_span * ny_span
        idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        # per-pair offset within its box's cell rectangle
        offs = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        span_x = np.repeat(nx_span, counts)
        dx = offs % span_x
        dy = offs // span_x
        cell_x = np.repeat(cx0, counts) + dx - self._x0
        cell_y = np.repeat(cy0, counts) + dy - self._y0
        keys = cell_y * self._nx + cell_x
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        self._entries = idx[order]
        # bucket directory: unique keys + start offsets
        self._bucket_keys, self._bucket_starts = np.unique(
            keys, return_index=True
        )

    def __len__(self) -> int:
        return len(self.boxes)

    def query(self, rect) -> np.ndarray:
        """Indices of boxes whose cells intersect ``rect`` = [l, t, r, b]
        (superset of true overlaps — callers re-check exactly, like
        GridSearch consumers do)."""
        if len(self.boxes) == 0:
            return np.empty(0, dtype=np.int64)
        g = self.gridsize
        qx0 = max(int(rect[0]) // g - self._x0, 0)
        qx1 = min(int(rect[2]) // g - self._x0, self._nx - 1)
        qy0 = max(int(rect[1]) // g - self._y0, 0)
        qy1 = min(int(rect[3]) // g - self._y0, self._ny - 1)
        if qx1 < qx0 or qy1 < qy0:
            return np.empty(0, dtype=np.int64)
        out = []
        n_keys = len(self._bucket_keys)
        ends = np.append(self._bucket_starts[1:], len(self._entries))
        for cy in range(qy0, qy1 + 1):
            lo = cy * self._nx + qx0
            hi = cy * self._nx + qx1
            a = np.searchsorted(self._bucket_keys, lo, side="left")
            b = np.searchsorted(self._bucket_keys, hi, side="right")
            for k in range(a, min(b, n_keys)):
                out.append(
                    self._entries[self._bucket_starts[k]:ends[k]]
                )
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))

    def overlapping(self, rect) -> np.ndarray:
        """Indices of boxes that truly overlap ``rect`` (closed-interval
        overlap, the reference's TBOX::overlap semantics)."""
        cand = self.query(rect)
        if len(cand) == 0:
            return cand
        b = self.boxes[cand]
        keep = (
            (b[:, 0] <= rect[2])
            & (b[:, 2] >= rect[0])
            & (b[:, 1] <= rect[3])
            & (b[:, 3] >= rect[1])
        )
        return cand[keep]
