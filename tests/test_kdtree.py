"""kdtree.py — the clusterer's nearest-pair accelerator
(src/classify/kdtree.cpp) and its CreateClusterTree consumer
(cluster.cpp:1719-1770)."""

import numpy as np
import pytest

from tesseract_spark.lstm.cluster import cluster_class_features
from tesseract_spark.lstm.kdtree import KDTree


def _brute_nearest(points, q, k, circular=None):
    def dist(a, b):
        d = np.asarray(a, float) - np.asarray(b, float)
        if circular:
            for i, circ in enumerate(circular):
                if circ is not None:
                    rng = circ[1] - circ[0]
                    di = abs(d[i]) % rng
                    d[i] = min(di, rng - di)
        return float(np.sqrt((d * d).sum()))

    ranked = sorted(
        ((dist(p, q), i) for i, p in enumerate(points)), key=lambda t: t
    )
    return ranked[:k]


def test_nearest_matches_brute_force():
    # KDNearestNeighborSearch (kdtree.cpp:303-330) vs exhaustive scan
    rng = np.random.RandomState(7)
    pts = rng.rand(300, 5)
    tree = KDTree.from_items(5, [(p, i) for i, p in enumerate(pts)])
    for qi in range(25):
        q = rng.rand(5)
        got = tree.nearest(q, k=3)
        want = _brute_nearest(pts, q, 3)
        assert [d for d, _ in want] == pytest.approx([d for _, d in got])
        assert [i for _, i in want] == [i for i, _ in got]


def test_circular_dimension_wraps():
    # ComputeDistance (kdtree.cpp:460-480): 0.95 and 0.05 on a [0,1)
    # ring are 0.10 apart, not 0.90
    tree = KDTree(1, circular=[(0.0, 1.0)])
    tree.store(np.array([0.95]), "a")
    tree.store(np.array([0.5]), "b")
    (data, d), = tree.nearest(np.array([0.05]), k=1)
    assert data == "a"
    assert d == pytest.approx(0.10)


def test_circular_no_false_prune():
    # a query near one ring edge must still find a neighbor stored on
    # the other side of the splitting plane across the wrap
    rng = np.random.RandomState(3)
    pts = rng.rand(120, 2)
    circ = [None, (0.0, 1.0)]
    tree = KDTree.from_items(2, [(p, i) for i, p in enumerate(pts)], circular=circ)
    for q in ([0.5, 0.999], [0.2, 0.001], [0.9, 0.98]):
        got = tree.nearest(np.array(q), k=2)
        want = _brute_nearest(pts, q, 2, circular=circ)
        assert [i for _, i in want] == [i for i, _ in got]


def test_delete_and_rebuild():
    # KDDelete (kdtree.cpp:252-287): deleted points stop matching; the
    # tombstone rebuild keeps the live set intact
    rng = np.random.RandomState(11)
    pts = rng.rand(64, 3)
    tree = KDTree.from_items(3, [(p, i) for i, p in enumerate(pts)])
    for i in range(0, 64, 2):
        assert tree.delete(pts[i], i)
    assert tree.n_alive == 32
    live = {d for _, d in tree.walk()}
    assert live == set(range(1, 64, 2))
    for qi in range(10):
        q = rng.rand(3)
        (data, d), = tree.nearest(q, k=1)
        want = _brute_nearest([pts[i] for i in sorted(live)], q, 1)
        assert d == pytest.approx(want[0][0])
    # delete with wrong data must not remove anything
    assert not tree.delete(pts[1], 999)


def test_store_after_delete_roundtrip():
    # the clusterer's merge step: delete two, insert one centroid
    tree = KDTree.from_items(2, [([0.0, 0.0], 0), ([1.0, 1.0], 1)])
    tree.delete(np.array([0.0, 0.0]), 0)
    tree.delete(np.array([1.0, 1.0]), 1)
    tree.store(np.array([0.5, 0.5]), 2)
    (data, d), = tree.nearest(np.array([0.4, 0.5]), k=1)
    assert data == 2 and d == pytest.approx(0.1)


def _jitter_samples(rng, base, n, scale=0.02):
    return [base + rng.normal(0.0, scale, size=base.shape) for _ in range(n)]


def test_cluster_tree_matches_brute_force_merge():
    # CreateClusterTree's heap order is the global-min merge order, so
    # the kd-tree path must reproduce the O(k^3) reference output
    def brute(sample_feats, merge_dist=1.0, min_sample_frac=0.5):
        from tesseract_spark.lstm.cluster import _to_feat, _to_vec

        pooled, owners = [], []
        for si, f in enumerate(sample_feats):
            if len(f):
                pooled.append(np.asarray(f, dtype=np.float32))
                owners.extend([si] * len(f))
        vecs = _to_vec(np.concatenate(pooled))
        sums = [v.copy() for v in vecs]
        counts = [1] * len(vecs)
        samples = [{owners[i]} for i in range(len(vecs))]
        alive = list(range(len(vecs)))
        while len(alive) > 1:
            cents = np.array([sums[i] / counts[i] for i in alive])
            d = np.linalg.norm(cents[:, None, :] - cents[None, :, :], axis=2)
            np.fill_diagonal(d, np.inf)
            i, j = np.unravel_index(np.argmin(d), d.shape)
            if d[i, j] >= merge_dist:
                break
            a, b = sorted((alive[i], alive[j]))
            sums[a] += sums[b]
            counts[a] += counts[b]
            samples[a] |= samples[b]
            alive.remove(b)
        min_n = max(1, int(np.ceil(min_sample_frac * len(sample_feats))))
        protos = [
            _to_feat(sums[i] / counts[i])
            for i in alive
            if len(samples[i]) >= min_n
        ]
        order = np.lexsort(
            tuple(np.array([p[k] for p in protos]) for k in (3, 2, 1, 0))
        )
        return np.stack([protos[k] for k in order])

    rng = np.random.RandomState(5)
    for _ in range(4):
        base = np.column_stack(
            [
                rng.rand(3) * 0.8,
                rng.rand(3) * 0.8,
                0.1 + rng.rand(3) * 0.2,
                rng.rand(3),
            ]
        ).astype(np.float32)
        samples = [
            np.concatenate(_jitter_samples(rng, base, 1)).astype(np.float32)
            for _ in range(8)
        ]
        got = cluster_class_features(samples)
        want = brute(samples)
        np.testing.assert_allclose(got, want, atol=1e-5)
