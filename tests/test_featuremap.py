"""Ports of unittest/indexmapbidi_test.cc and intfeaturemap_test.cc."""

import numpy as np

from tesseract_spark.lstm.featuremap import (
    K_INT_FEATURE_EXTENT,
    K_NUM_OFFSET_MAPS,
    IndexMap,
    IndexMapBiDi,
    IntFeatureMap,
    IntFeatureSpace,
)

K_PRIME_LIMIT = 1000

# Random re-quantization (intfeaturemap_test.cc:18-21).
K_X_BUCKETS = 16
K_Y_BUCKETS = 24
K_THETA_BUCKETS = 13


def compute_primes(m: IndexMapBiDi) -> None:
    """Sieve of Eratosthenes (indexmapbidi_test.cc:36-52)."""
    m.init(K_PRIME_LIMIT + 1, False)
    m.set_map(2, True)
    for i in range(3, K_PRIME_LIMIT + 1, 2):
        m.set_map(i, True)
    factor_limit = int((1.0 + K_PRIME_LIMIT) ** 0.5)
    for f in range(3, factor_limit + 1, 2):
        if m.sparse_to_compact(f) >= 0:
            mult = 2
            while mult * f <= K_PRIME_LIMIT:
                m.set_map(f * mult, False)
                mult += 1
    m.setup()


def check_primes(m) -> None:
    """indexmapbidi_test.cc:54-71."""
    # The 168th prime is 997, compact index 167 (0-based).
    assert m.sparse_to_compact(997) == 167
    assert m.compact_to_sparse(167) == 997
    for np_ in (995, 996, 998, 999):
        assert m.sparse_to_compact(np_) == -1
    assert m.compact_to_sparse(166) == 991
    assert m.compact_size() == 168
    assert m.sparse_size == K_PRIME_LIMIT + 1 or m.sparse_size_() == K_PRIME_LIMIT + 1


class TestIndexMapBiDi:
    def test_primes(self):
        """indexmapbidi_test.cc:75-99 Primes."""
        m = IndexMapBiDi()
        compute_primes(m)
        check_primes(m)
        # Assignment to another bidi map.
        m2 = IndexMapBiDi()
        m2.copy_from(m)
        check_primes(m2)
        # Assignment to the base class (binary-search lookup).
        base = IndexMap()
        base.copy_from(m)
        check_primes(base)
        # Serialization round trip.
        data = m.serialize()
        rm = IndexMapBiDi.deserialize(data)
        check_primes(rm)

    def test_many_to_one(self):
        """indexmapbidi_test.cc:102-121 ManyToOne — the example in the
        CompleteMerges comment."""
        m = IndexMapBiDi()
        m.init(13, False)
        for i in (2, 4, 7, 9, 11):
            m.set_map(i, True)
        m.setup()
        m.merge(m.sparse_to_compact(2), m.sparse_to_compact(9))
        m.merge(m.sparse_to_compact(4), m.sparse_to_compact(11))
        m.complete_merges()
        assert m.compact_size() == 3
        assert m.sparse_size_() == 13 or len(m.sparse_map) == 13
        assert m.sparse_to_compact(4) == 1
        assert m.compact_to_sparse(1) == 4
        assert m.sparse_to_compact(11) == 1


class TestIntFeatureMap:
    def test_exhaustive(self):
        """intfeaturemap_test.cc:42-124 Exhaustive."""
        space = IntFeatureSpace()
        space.init(K_X_BUCKETS, K_Y_BUCKETS, K_THETA_BUCKETS)
        fmap = IntFeatureMap()
        fmap.init(space)
        ext = K_INT_FEATURE_EXTENT
        total_size = ext * ext * ext
        # Fill the features with every (x, y, theta) value, in the
        # reference's f_index order.
        yy, xx, tt = np.meshgrid(np.arange(ext), np.arange(ext), np.arange(ext), indexing="ij")
        features = np.stack([xx.ravel(), yy.ravel(), tt.ravel()], axis=1).astype(np.uint8)
        index_features = fmap.index_and_sort_features(features)
        assert len(index_features) == total_size
        total_buckets = K_X_BUCKETS * K_Y_BUCKETS * K_THETA_BUCKETS
        map_features, misses = fmap.map_indexed_features(index_features)
        assert misses == 0
        assert len(map_features) == total_buckets
        assert np.array_equal(map_features, np.arange(total_buckets))
        assert fmap.compact_size() == total_buckets
        assert fmap.sparse_size() == total_buckets

        # Every offset feature stays within one bucket of the origin.
        dx = ext // K_X_BUCKETS + 1
        dy = ext // K_Y_BUCKETS + 1
        dtheta = ext // K_THETA_BUCKETS + 1
        bad_offsets = 0
        for index in range(total_buckets):
            for direction in range(-K_NUM_OFFSET_MAPS, K_NUM_OFFSET_MAPS + 1):
                offset_index = fmap.offset_feature(index, direction)
                if direction == 0:
                    assert offset_index == index
                elif offset_index >= 0:
                    f = fmap.inverse_index_feature(index)
                    f2 = fmap.inverse_index_feature(offset_index)
                    assert f != f2
                    assert abs(f[0] - f2[0]) <= dx
                    assert abs(f[1] - f2[1]) <= dy
                    theta_delta = abs(f[2] - f2[2])
                    if theta_delta > ext // 2:
                        theta_delta = ext - theta_delta
                    assert theta_delta <= dtheta
                else:
                    bad_offsets += 1
        assert bad_offsets <= (K_X_BUCKETS + K_Y_BUCKETS) * K_THETA_BUCKETS

        # Delete the first and last map feature and test again.
        fmap.delete_map_feature(0)
        fmap.delete_map_feature(total_buckets - 1)
        fmap.finalize_mapping()
        index_features = fmap.index_and_sort_features(features)
        assert len(index_features) == total_size
        map_features, misses = fmap.map_indexed_features(index_features)
        expected_misses = (ext // K_X_BUCKETS) * (ext // K_Y_BUCKETS) * (ext // K_THETA_BUCKETS + 1)
        expected_misses += (ext // K_X_BUCKETS) * (ext // K_Y_BUCKETS + 1) * (ext // K_THETA_BUCKETS)
        assert misses == expected_misses
        assert len(map_features) == total_buckets - 2
        assert np.array_equal(map_features, np.arange(total_buckets - 2))
        assert fmap.compact_size() == total_buckets - 2
        assert fmap.sparse_size() == total_buckets
