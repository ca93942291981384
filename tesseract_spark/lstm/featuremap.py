"""Sparse/compact feature-index mapping for the static classifier.

Ports, at unit-test granularity:

- ``IndexMap`` / ``IndexMapBiDi`` (src/ccutil/indexmapbidi.{h,cpp}):
  the bidirectional map between a sparse feature space and the compact
  subspace that actually occurs in training data, including the
  many-to-one ``Merge``/``CompleteMerges`` compaction and the
  compact-map-only serialization (indexmapbidi.cpp:215-256) —
  fixtures in unittest/indexmapbidi_test.cc;
- ``IntFeatureSpace`` (src/classify/intfeaturespace.{h,cpp}): the
  (x, y, theta) -> scalar quantization of INT_FEATURE_STRUCT with the
  rounded theta bucket so vertical/horizontal sit mid-bucket;
- ``IntFeatureMap`` (src/training/common/intfeaturemap.{h,cpp}): the
  two layered together plus the perpendicular-shift / rotation offset
  feature tables — fixtures in unittest/intfeaturemap_test.cc.

The bulk calls (IndexAndSortFeatures / MapFeatures) are numpy
vectorized: the exhaustive fixture pushes 256^3 features through them,
and at engine scale these run inside Arrow batches on executors, so
the per-feature work must stay out of the Python interpreter loop.
"""

from __future__ import annotations

import math
import struct

import numpy as np

K_INT_FEATURE_EXTENT = 256  # intfeaturespace.h:25
K_NUM_OFFSET_MAPS = 2  # intfeaturemap.h:33
K_MAX_OFFSET_DIST = 32  # intfeaturemap.cpp:31


def _trunc_div(a: int, b: int) -> int:
    """C integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def div_rounded(a: int, b: int) -> int:
    """helpers.h:176-181 DivRounded."""
    if b < 0:
        return -div_rounded(a, -b)
    return _trunc_div(a + b // 2, b) if a >= 0 else _trunc_div(a - b // 2, b)


def int_cast_rounded(x: float) -> int:
    """helpers.h:184-189 IntCastRounded."""
    return int(x + 0.5) if x >= 0.0 else -int(-x + 0.5)


def feature_direction(theta: int) -> tuple[float, float]:
    """intfx.cpp:52-66: unit vector of a binary-degree angle; the
    table bakes in the +pi phase."""
    ang = theta * 2.0 * math.pi / K_INT_FEATURE_EXTENT + math.pi
    return math.cos(ang), math.sin(ang)


class BitVector:
    """Fast bit array with serialization (src/ccutil/bitvector.h:30-150,
    bitvector.cpp): 32-bit word storage, NumSetBits via per-byte
    popcount (the reference's hamming_table_), NextSetBit scan (its
    lsb_index_/lsb_eroded_ tables), byte format = int32 bit count then
    the little-endian uint32 words.  The membership structure behind
    IndexMapBiDi's sparse maps and the ambig/DAWG used-flag sets.
    Fixture parity: unittest/bitvector_test.cc ported in
    tests/test_bitvector.py."""

    K_BIT_FACTOR = 32

    def __init__(self, length: int = 0) -> None:
        self.bit_size = 0
        self.words: list[int] = []
        if length:
            self.init(length)

    def _word_length(self) -> int:
        return (self.bit_size + self.K_BIT_FACTOR - 1) // self.K_BIT_FACTOR

    def init(self, length: int) -> None:
        self.bit_size = int(length)
        self.words = [0] * self._word_length()

    def size(self) -> int:
        return self.bit_size

    def set_bit(self, index: int) -> None:
        self.words[index // 32] |= 1 << (index & 31)

    def reset_bit(self, index: int) -> None:
        self.words[index // 32] &= ~(1 << (index & 31)) & 0xFFFFFFFF

    def set_value(self, index: int, value: bool) -> None:
        (self.set_bit if value else self.reset_bit)(index)

    def at(self, index: int) -> bool:
        return bool(self.words[index // 32] & (1 << (index & 31)))

    __getitem__ = at

    def set_all_true(self) -> None:
        self.words = [0xFFFFFFFF] * self._word_length()

    def set_all_false(self) -> None:
        self.words = [0] * self._word_length()

    def num_set_bits(self) -> int:
        return sum(bin(w).count("1") for w in self.words)

    def next_set_bit(self, prev_bit: int = -1) -> int:
        # bitvector.cpp:139-180 semantics: first set index > prev_bit,
        # -1 when exhausted (indices past bit_size are never reported
        # because set_bit is never called past the size).
        next_bit = prev_bit + 1
        if next_bit >= self.bit_size:
            return -1
        word_index = next_bit // 32
        word = self.words[word_index] >> (next_bit & 31)
        if word:
            return next_bit + (word & -word).bit_length() - 1
        for wi in range(word_index + 1, self._word_length()):
            word = self.words[wi]
            if word:
                return wi * 32 + (word & -word).bit_length() - 1
        return -1

    def copy(self) -> "BitVector":
        out = BitVector()
        out.bit_size = self.bit_size
        out.words = list(self.words)
        return out

    def serialize(self) -> bytes:
        return struct.pack("<i", self.bit_size) + struct.pack(
            f"<{self._word_length()}I", *self.words)

    @classmethod
    def deserialize(cls, data: bytes) -> "BitVector":
        (bit_size,) = struct.unpack_from("<I", data, 0)
        if bit_size > 500000000:  # bitvector.cpp:106 sanity cap
            raise ValueError("bitvector: unreasonable size")
        out = cls()
        out.init(bit_size)
        out.words = list(
            struct.unpack_from(f"<{out._word_length()}I", data, 4))
        return out


class IndexMap:
    """Forward-only compact map (indexmapbidi.cpp:28-74)."""

    def __init__(self) -> None:
        self.sparse_size = 0
        self.compact_map: list[int] = []

    def sparse_to_compact(self, sparse_index: int) -> int:
        """Binary search (indexmapbidi.cpp:33-40)."""
        import bisect

        pos = bisect.bisect_right(self.compact_map, sparse_index)
        if pos > 0:
            pos -= 1
        if pos < len(self.compact_map) and self.compact_map[pos] == sparse_index:
            return pos
        return -1

    def compact_to_sparse(self, compact_index: int) -> int:
        return self.compact_map[compact_index]

    def compact_size(self) -> int:
        return len(self.compact_map)

    def sparse_size_(self) -> int:
        return self.sparse_size

    def copy_from(self, src: "IndexMap | IndexMapBiDi") -> None:
        if isinstance(src, IndexMapBiDi):
            self.sparse_size = src.sparse_size_()
            self.compact_map = list(src.compact_map)
        else:
            self.sparse_size = src.sparse_size
            self.compact_map = list(src.compact_map)

    def serialize(self) -> bytes:
        out = struct.pack("<i", self.sparse_size)
        out += struct.pack("<I", len(self.compact_map))
        out += struct.pack(f"<{len(self.compact_map)}i", *self.compact_map)
        return out

    @staticmethod
    def _read_vec(data: bytes, off: int) -> tuple[list[int], int]:
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
        vec = list(struct.unpack_from(f"<{n}i", data, off))
        return vec, off + 4 * n


class IndexMapBiDi(IndexMap):
    """Bidirectional map with O(1) sparse->compact and merge support
    (indexmapbidi.cpp:80-256)."""

    def __init__(self) -> None:
        super().__init__()
        self.sparse_map = np.zeros(0, dtype=np.int32)

    # -- setup -------------------------------------------------------
    def init(self, size: int, all_mapped: bool) -> None:
        if all_mapped:
            self.sparse_map = np.arange(size, dtype=np.int32)
        else:
            self.sparse_map = np.full(size, -1, dtype=np.int32)

    def init_and_setup_range(self, sparse_size: int, start: int, end: int) -> None:
        self.init(sparse_size, False)
        self.sparse_map[start:end] = 0
        self.setup()

    def set_map(self, sparse_index: int, mapped: bool) -> None:
        self.sparse_map[sparse_index] = 0 if mapped else -1

    def setup(self) -> None:
        """indexmapbidi.cpp:117-135."""
        mapped = self.sparse_map >= 0
        self.sparse_map[mapped] = np.arange(int(mapped.sum()), dtype=np.int32)
        self.compact_map = list(np.flatnonzero(mapped).astype(int))
        self.sparse_size = len(self.sparse_map)

    def copy_from(self, src: "IndexMapBiDi") -> None:
        self.sparse_map = src.sparse_map.copy()
        self.compact_map = list(src.compact_map)
        self.sparse_size = len(self.sparse_map)

    # -- lookup ------------------------------------------------------
    def sparse_to_compact(self, sparse_index: int) -> int:
        return int(self.sparse_map[sparse_index])

    def compact_size(self) -> int:
        return len(self.compact_map)

    def is_compact_deleted(self, index: int) -> bool:
        return self.master_compact_index(index) < 0

    def master_compact_index(self, compact_index: int) -> int:
        """Chase the merge-parent chain (indexmapbidi.h:168-173)."""
        while (
            compact_index >= 0
            and self.sparse_map[self.compact_map[compact_index]] != compact_index
        ):
            compact_index = int(self.sparse_map[self.compact_map[compact_index]])
        return compact_index

    # -- merging -----------------------------------------------------
    def merge(self, compact_index1: int, compact_index2: int) -> bool:
        """indexmapbidi.cpp:144-165. merge(-1, i) deletes i."""
        compact_index1 = self.master_compact_index(compact_index1)
        compact_index2 = self.master_compact_index(compact_index2)
        if compact_index1 > compact_index2:
            compact_index1, compact_index2 = compact_index2, compact_index1
        elif compact_index1 == compact_index2:
            return False
        self.sparse_map[self.compact_map[compact_index2]] = compact_index1
        if compact_index1 >= 0:
            self.compact_map[compact_index2] = self.compact_map[compact_index1]
        return True

    def complete_merges(self) -> None:
        """indexmapbidi.cpp:171-211."""
        compact_size = 0
        for i in range(len(self.sparse_map)):
            ci = self.master_compact_index(int(self.sparse_map[i]))
            self.sparse_map[i] = ci
            if ci >= compact_size:
                compact_size = ci + 1
        self.compact_map = [-1] * compact_size
        for i in range(len(self.sparse_map)):
            ci = int(self.sparse_map[i])
            if ci >= 0 and self.compact_map[ci] == -1:
                self.compact_map[ci] = i
        tmp = [-1] * compact_size
        new_size = 0
        for i in range(compact_size):
            if self.compact_map[i] >= 0:
                tmp[i] = new_size
                self.compact_map[new_size] = self.compact_map[i]
                new_size += 1
        del self.compact_map[new_size:]
        live = self.sparse_map >= 0
        remap = np.asarray(tmp + [-1], dtype=np.int32)
        self.sparse_map[live] = remap[self.sparse_map[live]]

    # -- bulk --------------------------------------------------------
    def map_features(self, sparse: np.ndarray) -> tuple[np.ndarray, int]:
        """indexmapbidi.cpp:262-283 MapFeatures: sorted sparse indices
        -> sorted, uniqued compact indices + miss count. Vectorized:
        the dedupe-of-adjacent on a sorted input equals np.unique."""
        feats = self.sparse_map[np.asarray(sparse, dtype=np.int64)]
        missed = int((feats < 0).sum())
        good = feats[feats >= 0]
        # The reference dedupes only adjacent equal values; input is
        # sorted so the result is exactly the unique set, sorted.
        return np.unique(good), missed

    # -- serialization -----------------------------------------------
    def serialize(self) -> bytes:
        """indexmapbidi.cpp:215-233: the compact map plus only the
        many-to-one remainder pairs."""
        out = IndexMap.serialize(self)
        pairs: list[int] = []
        for i in range(len(self.sparse_map)):
            ci = int(self.sparse_map[i])
            if ci >= 0 and self.compact_map[ci] != i:
                pairs.append(i)
                pairs.append(ci)
        out += struct.pack("<I", len(pairs))
        out += struct.pack(f"<{len(pairs)}i", *pairs)
        return out

    @classmethod
    def deserialize(cls, data: bytes) -> "IndexMapBiDi":
        """indexmapbidi.cpp:237-256."""
        (sparse_size,) = struct.unpack_from("<i", data, 0)
        m = cls()
        m.sparse_size = sparse_size
        m.compact_map, off = cls._read_vec(data, 4)
        pairs, _ = cls._read_vec(data, off)
        m.sparse_map = np.full(sparse_size, -1, dtype=np.int32)
        for i, si in enumerate(m.compact_map):
            m.sparse_map[si] = i
        for k in range(0, len(pairs), 2):
            m.sparse_map[pairs[k]] = pairs[k + 1]
        return m


class IntFeatureSpace:
    """Quantizer from (X, Y, Theta) uint8 features to scalar indices
    (intfeaturespace.{h,cpp})."""

    def __init__(self, x_buckets: int = 0, y_buckets: int = 0, theta_buckets: int = 0):
        self.x_buckets = x_buckets
        self.y_buckets = y_buckets
        self.theta_buckets = theta_buckets

    def init(self, xb: int, yb: int, tb: int) -> None:
        self.x_buckets, self.y_buckets, self.theta_buckets = xb, yb, tb

    def size(self) -> int:
        return self.x_buckets * self.y_buckets * self.theta_buckets

    # scalar paths (intfeaturespace.h:76-90)
    def x_bucket(self, x: int) -> int:
        return min(max(x * self.x_buckets // K_INT_FEATURE_EXTENT, 0), self.x_buckets - 1)

    def y_bucket(self, y: int) -> int:
        return min(max(y * self.y_buckets // K_INT_FEATURE_EXTENT, 0), self.y_buckets - 1)

    def theta_bucket(self, theta: int) -> int:
        return div_rounded(theta * self.theta_buckets, K_INT_FEATURE_EXTENT) % self.theta_buckets

    def index(self, x: int, y: int, theta: int) -> int:
        return (self.x_bucket(x) * self.y_buckets + self.y_bucket(y)) * self.theta_buckets + self.theta_bucket(theta)

    def index_features(self, feats: np.ndarray) -> np.ndarray:
        """Vectorized Index over an (N, 3) uint8 [X, Y, Theta] array."""
        f = np.asarray(feats, dtype=np.int64)
        xb = np.clip(f[:, 0] * self.x_buckets // K_INT_FEATURE_EXTENT, 0, self.x_buckets - 1)
        yb = np.clip(f[:, 1] * self.y_buckets // K_INT_FEATURE_EXTENT, 0, self.y_buckets - 1)
        # DivRounded on non-negative input is (a + b/2) / b.
        tb = (f[:, 2] * self.theta_buckets + K_INT_FEATURE_EXTENT // 2) // K_INT_FEATURE_EXTENT
        tb %= self.theta_buckets
        return ((xb * self.y_buckets + yb) * self.theta_buckets + tb).astype(np.int64)

    def index_and_sort_features(self, feats: np.ndarray) -> np.ndarray:
        return np.sort(self.index_features(feats))

    def position_from_index(self, index: int) -> tuple[int, int, int]:
        """intfeaturespace.cpp:51-55 + 115-121 (bucket centers)."""
        xb = index // (self.y_buckets * self.theta_buckets)
        yb = index // self.theta_buckets % self.y_buckets
        tb = index % self.theta_buckets
        x = (xb * K_INT_FEATURE_EXTENT + K_INT_FEATURE_EXTENT // 2) // self.x_buckets
        y = (yb * K_INT_FEATURE_EXTENT + K_INT_FEATURE_EXTENT // 2) // self.y_buckets
        theta = div_rounded(tb * K_INT_FEATURE_EXTENT, self.theta_buckets)
        return x, y, theta % 256


class IntFeatureMap:
    """IntFeatureSpace + IndexMapBiDi + offset tables
    (intfeaturemap.{h,cpp})."""

    def __init__(self) -> None:
        self.feature_space = IntFeatureSpace()
        self.feature_map = IndexMapBiDi()
        self.mapping_changed = True
        self.compact_size_ = 0
        self.offset_plus: list[np.ndarray] = []
        self.offset_minus: list[np.ndarray] = []

    # pseudo-accessors (intfeaturemap.cpp:44-68)
    def index_feature(self, x: int, y: int, theta: int) -> int:
        return self.feature_space.index(x, y, theta)

    def map_index_feature(self, index_feature: int) -> int:
        return self.feature_map.sparse_to_compact(index_feature)

    def inverse_index_feature(self, index_feature: int) -> tuple[int, int, int]:
        return self.feature_space.position_from_index(index_feature)

    def inverse_map_feature(self, map_feature: int) -> tuple[int, int, int]:
        return self.feature_space.position_from_index(self.feature_map.compact_to_sparse(map_feature))

    def delete_map_feature(self, map_feature: int) -> None:
        self.feature_map.merge(-1, map_feature)
        self.mapping_changed = True

    def is_map_feature_deleted(self, map_feature: int) -> bool:
        return self.feature_map.is_compact_deleted(map_feature)

    def compact_size(self) -> int:
        return self.compact_size_

    def sparse_size(self) -> int:
        return self.feature_space.size()

    def init(self, feature_space: IntFeatureSpace) -> None:
        """intfeaturemap.cpp:72-100: identity map + offset tables."""
        self.feature_space = feature_space
        self.mapping_changed = False
        sparse_size = feature_space.size()
        self.feature_map.init(sparse_size, True)
        self.feature_map.setup()
        self.compact_size_ = self.feature_map.compact_size()
        self.offset_plus = []
        self.offset_minus = []
        for d in range(1, K_NUM_OFFSET_MAPS + 1):
            plus = np.fromiter(
                (self._compute_offset_feature(i, d) for i in range(sparse_size)),
                dtype=np.int32,
                count=sparse_size,
            )
            minus = np.fromiter(
                (self._compute_offset_feature(i, -d) for i in range(sparse_size)),
                dtype=np.int32,
                count=sparse_size,
            )
            self.offset_plus.append(plus)
            self.offset_minus.append(minus)

    def offset_feature(self, index_feature: int, direction: int) -> int:
        """intfeaturemap.cpp:111-122."""
        if 0 < direction <= K_NUM_OFFSET_MAPS:
            return int(self.offset_plus[direction - 1][index_feature])
        if 0 > direction >= -K_NUM_OFFSET_MAPS:
            return int(self.offset_minus[-direction - 1][index_feature])
        if direction == 0:
            return index_feature
        return -1

    def index_and_sort_features(self, feats: np.ndarray) -> np.ndarray:
        return self.feature_space.index_and_sort_features(feats)

    def map_indexed_features(self, indexed: np.ndarray) -> tuple[np.ndarray, int]:
        """intfeaturemap.h MapIndexedFeatures -> IndexMapBiDi::MapFeatures."""
        return self.feature_map.map_features(indexed)

    def finalize_mapping(self) -> int:
        """intfeaturemap.cpp:156-166."""
        if self.mapping_changed:
            self.feature_map.complete_merges()
            self.compact_size_ = self.feature_map.compact_size()
            self.mapping_changed = False
        return self.compact_size_

    def _compute_offset_feature(self, index_feature: int, direction: int) -> int:
        """intfeaturemap.cpp:196-240: dir +/-1 walks perpendicular to
        the feature direction until the quantized index changes; dir
        +/-2 rotates theta one step at a time."""
        fx, fy, ftheta = self.inverse_index_feature(index_feature)
        if direction == 0:
            return index_feature
        if direction in (1, -1):
            dx, dy = feature_direction(ftheta)
            # rotate by FCOORD(0, 1): (x, y) -> (-y, x)
            dx, dy = -dy, dx
            for m in range(1, K_MAX_OFFSET_DIST):
                x = int_cast_rounded(fx + dx * (m * direction))
                y = int_cast_rounded(fy + dy * (m * direction))
                if 0 <= x <= 255 and 0 <= y <= 255:
                    offset_index = self.feature_space.index(x, y, ftheta)
                    if offset_index != index_feature and offset_index >= 0:
                        return offset_index
                else:
                    return -1
        elif direction in (2, -2):
            for m in range(1, K_MAX_OFFSET_DIST):
                theta = ftheta + _trunc_div(m * direction, 2)
                offset_index = self.feature_space.index(fx, fy, theta % 256)
                if offset_index != index_feature and offset_index >= 0:
                    return offset_index
        return -1
