"""K-D tree with circular-dimension support — the clusterer's
nearest-pair accelerator (src/classify/kdtree.cpp).

The reference's agglomerative clusterer never scans all pairs: samples
live in a k-d tree (``MakeKDTree`` kdtree.cpp:186-210, ``KDStore``
:215-240, ``KDDelete`` :252-287, ``KDNearestNeighborSearch``
:303-330) and ``CreateClusterTree`` (cluster.cpp:1719-1770) drives a
best-first merge heap over per-cluster nearest neighbors.  This module
is that tree: axis-cycling binary insert, bounded-box nearest-k search
with hypersphere pruning (``KDTreeSearch::SearchRec``,
kdtree.cpp:397-442 — the search box shrinks to the current k-th-best
radius), and wraparound distance on dimensions declared circular
(``PARAM_DESC::Circular``; ``ComputeDistance`` kdtree.cpp:460-480
folds differences beyond HalfRange back around).

Divergence (documented): ``KDDelete`` unlinks the node and re-descends
its subtree; here deletion tombstones the node (search skips it) and
the tree rebuilds itself when more than half its nodes are dead — same
amortized complexity, no pointer surgery.  Python object nodes, not an
Arrow path: the tree only ever runs driver- or executor-local inside
one class's clustering step (a few thousand points), never on the
Spark data plane.
"""

from __future__ import annotations

import numpy as np

_MINSEARCH = -np.finfo(np.float64).max  # kdtree.cpp:198 MINSEARCH
_MAXSEARCH = np.finfo(np.float64).max


class _Node:
    __slots__ = ("key", "data", "left", "right", "dead")

    def __init__(self, key: np.ndarray, data) -> None:
        self.key = key
        self.data = data
        self.left: _Node | None = None
        self.right: _Node | None = None
        self.dead = False


class KDTree:
    """MakeKDTree (kdtree.cpp:186-210): ``circular`` lists per-dim
    (min, max) ranges for wraparound dims, None for linear ones."""

    def __init__(
        self, n_dims: int, circular: list[tuple[float, float] | None] | None = None
    ) -> None:
        self.n_dims = n_dims
        self.circular = list(circular) if circular else [None] * n_dims
        if len(self.circular) != n_dims:
            raise ValueError("circular spec length != n_dims")
        self.root: _Node | None = None
        self.n_alive = 0
        self.n_dead = 0

    @classmethod
    def from_items(
        cls,
        n_dims: int,
        items: list,
        circular: list[tuple[float, float] | None] | None = None,
    ) -> "KDTree":
        """Balanced median-split bulk load (keeps search recursion
        O(log n) even for adversarially ordered keys)."""
        tree = cls(n_dims, circular)
        tree._bulk([(np.asarray(k, dtype=np.float64), d) for k, d in items], 0)
        return tree

    # -- insert / delete ----------------------------------------------

    def store(self, key: np.ndarray, data) -> None:
        """KDStore (kdtree.cpp:215-240): descend cycling dims, left on
        key[dim] < node.key[dim]."""
        key = np.asarray(key, dtype=np.float64)
        node = _Node(key, data)
        if self.root is None:
            self.root = node
        else:
            cur, level = self.root, 0
            while True:
                dim = level % self.n_dims
                branch = "left" if key[dim] < cur.key[dim] else "right"
                nxt = getattr(cur, branch)
                if nxt is None:
                    setattr(cur, branch, node)
                    break
                cur = nxt
                level += 1
        self.n_alive += 1

    def delete(self, key: np.ndarray, data) -> bool:
        """KDDelete (kdtree.cpp:252-287) semantics: remove the node
        whose key AND data match.  Tombstoned, not unlinked; a rebuild
        triggers once dead nodes outnumber live ones."""
        key = np.asarray(key, dtype=np.float64)
        cur, level = self.root, 0
        while cur is not None:
            if not cur.dead and cur.data == data and np.array_equal(cur.key, key):
                cur.dead = True
                self.n_alive -= 1
                self.n_dead += 1
                if self.n_dead > self.n_alive:
                    self._rebuild()
                return True
            dim = level % self.n_dims
            cur = cur.left if key[dim] < cur.key[dim] else cur.right
            level += 1
        return False

    def _rebuild(self) -> None:
        items = [(n.key, n.data) for n in self._walk_nodes()]
        self.root, self.n_alive, self.n_dead = None, 0, 0
        # median-split rebuild keeps the rebuilt tree balanced
        self._bulk(items, 0)

    def _bulk(self, items: list, level: int) -> None:
        if not items:
            return
        dim = level % self.n_dims
        items = sorted(items, key=lambda kd: float(kd[0][dim]))
        mid = len(items) // 2
        self.store(*items[mid])
        self._bulk(items[:mid], level + 1)
        self._bulk(items[mid + 1 :], level + 1)

    def _walk_nodes(self):
        """KDWalk (kdtree.cpp:333-345): in-order live nodes."""
        stack, out = [self.root], []
        while stack:
            n = stack.pop()
            if n is None:
                continue
            if not n.dead:
                out.append(n)
            stack.append(n.left)
            stack.append(n.right)
        return out

    def walk(self):
        return [(n.key, n.data) for n in self._walk_nodes()]

    # -- distance -----------------------------------------------------

    def _dist(self, a: np.ndarray, b: np.ndarray) -> float:
        """ComputeDistance (kdtree.cpp:460-480): per-dim difference,
        circular dims folded past HalfRange back around the ring."""
        d = a - b
        for i, circ in enumerate(self.circular):
            if circ is not None:
                rng = circ[1] - circ[0]
                di = abs(d[i]) % rng
                if di > rng / 2:
                    di = rng - di
                d[i] = di
        return float(np.sqrt((d * d).sum()))

    # -- nearest-k search ---------------------------------------------

    def nearest(self, key: np.ndarray, k: int = 1):
        """KDNearestNeighborSearch (kdtree.cpp:303-330): the k nearest
        (data, distance) pairs, nearest first.  Deterministic: distance
        ties rank by data (the heap consumer needs a stable order).
        Box pruning as in KDTreeSearch::SearchRec — a subtree is
        skipped when the query hypersphere of the current k-th-best
        radius cannot intersect its half-space; circular dims never
        prune (the wrap can re-enter from either side), matching the
        reference's conservative Min/Max branch bounds for Circular."""
        key = np.asarray(key, dtype=np.float64)
        best: list[tuple[float, object]] = []  # kept sorted ascending

        def consider(node: _Node) -> None:
            if node.dead:
                return
            d = self._dist(key, node.key)
            entry = (d, node.data)
            if len(best) < k:
                best.append(entry)
                best.sort(key=lambda e: (e[0], _ord(e[1])))
            elif (d, _ord(node.data)) < (best[-1][0], _ord(best[-1][1])):
                best[-1] = entry
                best.sort(key=lambda e: (e[0], _ord(e[1])))

        def radius() -> float:
            return _MAXSEARCH if len(best) < k else best[-1][0]

        def search(node: _Node | None, level: int) -> None:
            if node is None:
                return
            consider(node)
            dim = level % self.n_dims
            diff = key[dim] - node.key[dim]
            near, far = (
                (node.left, node.right) if diff < 0 else (node.right, node.left)
            )
            search(near, level + 1)
            # the far half-space is reachable iff the splitting plane is
            # within the current best radius (or the dim wraps)
            if self.circular[dim] is not None or abs(diff) <= radius():
                search(far, level + 1)

        search(self.root, 0)
        return [(data, d) for d, data in best]


def _ord(data):
    """Tie-break key: payloads are comparable ids in the clusterer."""
    return data
