"""Shape table (shapetable.cpp / mastertrainer ClusterShapes /
mergenf merge criteria): cross-font shape unification."""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import get_font
from tesseract_spark.lstm.cluster import cluster_class_features
from tesseract_spark.lstm.intproto import micro_features
from tesseract_spark.lstm.shapetable import (
    Shape,
    ShapeTable,
    bank_distance,
    cluster_shapes,
)


def _bank(mask) -> np.ndarray:
    return cluster_class_features([micro_features(np.asarray(mask, bool))])


def test_shape_table_merge_forwarding():
    t = ShapeTable()
    a = t.add_shape("l", 0)
    b = t.add_shape("I", 1)
    c = t.add_shape("o", 0)
    t.merge_shapes(a, b)
    assert t.master_id(b) == a
    assert t.unichars_of(a) == ["I", "l"]
    assert t.unichars_of(b) == ["I", "l"]  # lookups forward
    assert t.unichars_of(c) == ["o"]
    assert set(t.live_shapes()) == {a, c}
    assert t.max_num_unichars() == 2


def test_shape_subset_and_contains():
    s1, s2 = Shape(), Shape()
    s1.add("a", 0)
    s2.add("a", 0)
    s2.add("a", 1)
    s2.add("b", 0)
    assert s1.is_subset_of(s2)
    assert not s2.is_subset_of(s1)
    assert s2.contains_unichar_and_font("a", 1)
    assert not s1.contains_unichar_and_font("a", 1)


def test_cluster_merges_identical_glyphs_across_fonts():
    # two "fonts" where l/I share one glyph mask: their banks are
    # identical and must unify into ONE shape; distinct glyphs stay
    font = get_font()
    same = font["l"]
    banks = {
        ("l", 0): _bank(same),
        ("I", 1): _bank(same),
        ("o", 0): _bank(font["o"]),
        ("x", 0): _bank(font["x"]),
    }
    assert bank_distance(banks[("l", 0)], banks[("I", 1)]) == pytest.approx(0.0)
    table = cluster_shapes(banks)
    live = table.live_shapes()
    merged = [table.unichars_of(s) for s in live]
    assert ["I", "l"] in merged
    assert ["o"] in merged and ["x"] in merged
    assert len(live) == 3


def test_unichar_cap_blocks_but_does_not_stop():
    # a blocked over-cap pair must not terminate the merge loop: the
    # remaining identical pair still merges
    font = get_font()
    banks = {
        ("a", 0): _bank(font["a"]),
        ("b", 0): _bank(font["a"]),  # identical to a: candidate pair 1
        ("c", 0): _bank(font["c"]),
        ("d", 0): _bank(font["c"]),  # identical to c: candidate pair 2
    }
    table = cluster_shapes(banks, max_shape_unichars=2)
    live = table.live_shapes()
    assert len(live) == 2
    groups = sorted(tuple(table.unichars_of(s)) for s in live)
    assert groups == [("a", "b"), ("c", "d")]


def test_distance_ceiling_respected():
    font = get_font()
    banks = {
        ("o", 0): _bank(font["o"]),
        ("x", 0): _bank(font["x"]),
    }
    table = cluster_shapes(banks, max_dist=0.01)
    assert len(table.live_shapes()) == 2


def test_expand_shape_results_and_dict_arbitration():
    from tesseract_spark.lstm.dawg import Dawg
    from tesseract_spark.lstm.langmodel import choose_segmentation
    from tesseract_spark.lstm.shapetable import expand_shape_results
    from tesseract_spark.lstm.templates import get_net

    t = ShapeTable()
    a = t.add_shape("l", 0)
    t.merge_shapes(a, t.add_shape("I", 1))
    o = t.add_shape("o", 0)
    # one shape result expands to both members; dict picks the word
    cands = expand_shape_results(t, [(a, 0.95), (o, 0.40)])
    assert [u for u, _ in cands][:2] == ["I", "l"]
    d = Dawg(get_net().charset, ["lot"])
    words = [("lot", 0.1), ("Iot", 0.1)]
    assert choose_segmentation(words, dawg=d).text == "lot"
