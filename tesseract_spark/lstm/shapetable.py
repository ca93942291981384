"""Shape table — cross-font shape unification
(src/classify/shapetable.h/.cpp; merge criteria
src/training/common/mastertrainer.cpp ``ShapeDistance``:867-893 /
``ClusterShapes``:967-1020; prototype comparison mergenf.cpp
``CompareProtos``:66-119).

The reference's classifier does not classify unichars directly: it
classifies SHAPES — clusters of (unichar, font) pairs whose glyphs are
indistinguishable at the shape level ('l' and 'I' in a sans font, 'O'
and '0', the same letter across near-identical fonts) — and maps shape
results back to unichar candidates (``AddShapeToResults``,
shapetable.cpp:355).  The shape table is trained by a greedy
minimum-distance merge over per-class prototype banks, bounded by
``kMaxUnicharsPerCluster`` and a distance ceiling
(``kFontMergeDistance`` = 0.025 in the reference's evidence units).

Distance here: symmetric mean nearest-prototype distance between two
banks in the clusterer's sigma-normalized feature space
(cluster._to_vec) — the same space the prototypes were trained in; the
merge ceiling SHAPE_MERGE_DIST is calibrated to that space (documented
divergence from the evidence-based CompareProtos arithmetic, whose
pico-feature machinery lives with the intproto matcher).
"""

from __future__ import annotations

import numpy as np

from .cluster import _to_vec

K_MAX_UNICHARS_PER_CLUSTER = 2000  # mastertrainer.cpp:40 (shape size cap)
SHAPE_MERGE_DIST = 0.35  # kFontMergeDistance analogue in sigma units


class Shape:
    """shapetable.h:180-210: an ordered set of (unichar, font set)."""

    def __init__(self) -> None:
        self.unichars: dict[str, set[int]] = {}

    def add(self, unichar: str, font_id: int) -> None:
        self.unichars.setdefault(unichar, set()).add(font_id)

    def add_shape(self, other: "Shape") -> None:
        for u, fonts in other.unichars.items():
            self.unichars.setdefault(u, set()).update(fonts)

    def contains_unichar(self, unichar: str) -> bool:
        return unichar in self.unichars

    def contains_unichar_and_font(self, unichar: str, font_id: int) -> bool:
        return font_id in self.unichars.get(unichar, ())

    def is_subset_of(self, other: "Shape") -> bool:
        return all(
            fonts <= other.unichars.get(u, set())
            for u, fonts in self.unichars.items()
        )

    def is_equal_unichars(self, other: "Shape") -> bool:
        """Shape::IsEqualUnichars (shapetable.cpp:238-252): same unichar
        set, fonts ignored."""
        return set(self.unichars) == set(other.unichars)

    def size(self) -> int:
        return len(self.unichars)

    def font_count(self) -> int:
        """The sum of per-unichar font-list sizes — what the reference's
        MasterFontCount sums (shapetable.cpp:466-474: 'not the actual
        number of different fonts in the shape')."""
        return sum(len(f) for f in self.unichars.values())

    # Shape::Serialize/DeSerialize (shapetable.cpp:60-96): the field
    # walk (sorted flag, unichar count, per-unichar id + font list) in
    # the reference's order; ids here are the engine's unichar keys
    def serialize(self) -> bytes:
        import struct

        out = [struct.pack("<Bi", 1, len(self.unichars))]
        for u in sorted(self.unichars, key=str):
            # the reference serializes int32 unichar_ids; this engine's
            # keys may also be glyph strings — a type byte disambiguates
            if isinstance(u, int):
                out.append(struct.pack("<Bi", 0, u))
            else:
                ub = str(u).encode("utf-8")
                out.append(struct.pack("<Bi", 1, len(ub)))
                out.append(ub)
            fonts = sorted(self.unichars[u])
            out.append(struct.pack("<i", len(fonts)))
            out.append(struct.pack(f"<{len(fonts)}i", *fonts))
        return b"".join(out)

    @classmethod
    def deserialize(cls, data: bytes) -> "Shape":
        import struct

        s = cls()
        off = 5  # sorted flag + count
        (_sorted, n) = struct.unpack_from("<Bi", data, 0)
        for _ in range(n):
            (kind, val) = struct.unpack_from("<Bi", data, off)
            off += 5
            if kind == 0:
                u = val
            else:
                u = data[off : off + val].decode("utf-8")
                off += val
            (nf,) = struct.unpack_from("<i", data, off)
            off += 4
            fonts = struct.unpack_from(f"<{nf}i", data, off)
            off += 4 * nf
            for f in fonts:
                s.add(u, f)
        return s


class ShapeTable:
    """shapetable.h:260-330: the shape list with merge forwarding."""

    def __init__(self) -> None:
        self.shapes: list[Shape] = []
        self._dest: list[int] = []  # merge forwarding (MasterShape)

    def add_shape(self, unichar: str, font_id: int) -> int:
        s = Shape()
        s.add(unichar, font_id)
        self.shapes.append(s)
        self._dest.append(-1)
        return len(self.shapes) - 1

    def master_id(self, shape_id: int) -> int:
        while self._dest[shape_id] >= 0:
            shape_id = self._dest[shape_id]
        return shape_id

    def get_shape(self, shape_id: int) -> Shape:
        return self.shapes[self.master_id(shape_id)]

    def find_shape(self, unichar, font_id: int = -1) -> int:
        """FindShape (shapetable.cpp:385-401): first shape holding the
        unichar (with the font, unless font_id < 0), else -1."""
        for shape_id, shape in enumerate(self.shapes):
            if self.is_merged(shape_id):
                continue
            if unichar in shape.unichars and (
                font_id < 0 or font_id in shape.unichars[unichar]
            ):
                return shape_id
        return -1

    def is_merged(self, shape_id: int) -> bool:
        return self._dest[shape_id] >= 0

    def merge_shapes(self, s1: int, s2: int) -> None:
        """MergeShapes (shapetable.cpp:320): s2 folds into s1; lookups
        through s2 forward to s1."""
        a, b = self.master_id(s1), self.master_id(s2)
        if a == b:
            return
        if b < a:
            a, b = b, a
        self.shapes[a].add_shape(self.shapes[b])
        self._dest[b] = a
        self.shapes[b] = Shape()

    def merged_unichar_count(self, s1: int, s2: int) -> int:
        u = set(self.get_shape(s1).unichars) | set(self.get_shape(s2).unichars)
        return len(u)

    def live_shapes(self) -> list[int]:
        return [i for i in range(len(self.shapes)) if not self.is_merged(i)]

    def unichars_of(self, shape_id: int) -> list[str]:
        return sorted(self.get_shape(shape_id).unichars)

    def max_num_unichars(self) -> int:
        live = self.live_shapes()
        return max((self.shapes[i].size() for i in live), default=0)

    def add_whole_shape(self, shape: Shape) -> int:
        """ShapeTable::AddShape(Shape&) (shapetable.cpp:288-294)."""
        s = Shape()
        s.add_shape(shape)
        self.shapes.append(s)
        self._dest.append(-1)
        return len(self.shapes) - 1

    def num_shapes(self) -> int:
        return len(self.shapes)

    def delete_shape(self, shape_id: int) -> None:
        """ShapeTable::DeleteShape (shapetable.cpp:300-308)."""
        self.shapes.pop(shape_id)
        self._dest.pop(shape_id)
        self._dest = [
            d if d < shape_id else d - 1 for d in self._dest
        ]

    def any_multiple_unichars(self) -> bool:
        """shapetable.cpp:740-748: any live shape holding > 1 unichar."""
        return any(
            self.shapes[i].size() > 1 for i in self.live_shapes()
        )

    def master_unichar_count(self, shape_id: int) -> int:
        """MasterUnicharCount (shapetable.cpp:458-462)."""
        return self.get_shape(shape_id).size()

    def master_font_count(self, shape_id: int) -> int:
        """MasterFontCount (shapetable.cpp:466-474): the SUM of font
        lists across the shape's unichars."""
        return self.get_shape(shape_id).font_count()

    def master_destination_index(self, shape_id: int) -> int:
        """MasterDestinationIndex (shapetable.cpp:478-486)."""
        return self.master_id(shape_id)

    def num_master_shapes(self) -> int:
        return len(self.live_shapes())

    def append_master_shapes(self, other: "ShapeTable") -> list[int]:
        """AppendMasterShapes (shapetable.cpp:752-764): copy the live
        (master) shapes of ``other``; returns their new ids."""
        return [
            self.add_whole_shape(other.shapes[i])
            for i in other.live_shapes()
        ]


def bank_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric mean nearest-prototype distance between two [n, 4]
    prototype banks in the clusterer's sigma-normalized space — the
    UnicharDistance analogue ShapeDistance averages."""
    if len(a) == 0 or len(b) == 0:
        return np.inf
    va, vb = _to_vec(np.asarray(a, np.float32)), _to_vec(np.asarray(b, np.float32))
    d = np.linalg.norm(va[:, None, :] - vb[None, :, :], axis=2)
    return float((d.min(axis=1).mean() + d.min(axis=0).mean()) / 2.0)


def cluster_shapes(
    banks: dict[tuple[str, int], np.ndarray],
    max_dist: float = SHAPE_MERGE_DIST,
    max_shape_unichars: int = K_MAX_UNICHARS_PER_CLUSTER,
    min_shapes: int = 1,
) -> ShapeTable:
    """MasterTrainer::ClusterShapes (mastertrainer.cpp:967-1020): start
    with one shape per (unichar, font) bank, greedily merge the
    closest pair while the distance stays under the ceiling and the
    merged shape respects the unichar cap.  ShapeDistance between
    multi-char shapes is the mean over cross pairs (:875-884)."""
    table = ShapeTable()
    keys = sorted(banks)
    for u, f in keys:
        table.add_shape(u, f)

    def shape_dist(i: int, j: int) -> float:
        ci = [keys[k] for k in range(len(keys)) if table.master_id(k) == table.master_id(i)]
        cj = [keys[k] for k in range(len(keys)) if table.master_id(k) == table.master_id(j)]
        ds = [bank_distance(banks[a], banks[b]) for a in ci for b in cj]
        return float(np.mean(ds)) if ds else np.inf

    max_merges = len(keys) - min_shapes
    merged = 0
    # pairs whose merge would exceed the unichar cap are skipped, not
    # loop-terminating (the reference marks the pair's distance
    # infinite and keeps merging others, mastertrainer.cpp:1000-1006)
    blocked: set[tuple[int, int]] = set()
    while merged < max_merges:
        live = table.live_shapes()
        best = (np.inf, -1, -1)
        for x in range(len(live)):
            for y in range(x + 1, len(live)):
                if (live[x], live[y]) in blocked:
                    continue
                d = shape_dist(live[x], live[y])
                if d < best[0]:
                    best = (d, live[x], live[y])
        if best[1] < 0 or best[0] >= max_dist:
            break
        if table.merged_unichar_count(best[1], best[2]) > max_shape_unichars:
            blocked.add((best[1], best[2]))
            continue
        table.merge_shapes(best[1], best[2])
        merged += 1
    return table


def expand_shape_results(
    table: ShapeTable, ranked: list[tuple[int, float]]
) -> list[tuple[str, float]]:
    """AddShapeToResults (shapetable.cpp:355-375): a shape result fans
    out to its unichars at the shape's rating; a unichar already seen
    from a better-rated shape keeps the better rating.  Downstream the
    dictionary arbitrates among the shape's members — the reason 'l'
    and 'I' can share a shape at all."""
    best: dict[str, float] = {}
    order: list[str] = []
    for shape_id, rating in ranked:
        for u in table.unichars_of(shape_id):
            if u not in best or rating > best[u]:
                if u not in best:
                    order.append(u)
                best[u] = rating
    return sorted(
        ((u, best[u]) for u in order), key=lambda t: (-t[1], t[0])
    )
