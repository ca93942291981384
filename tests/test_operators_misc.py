"""Diacritic reattachment, bidi reading order, orientation detection."""

import numpy as np
import pytest

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.operators.bidi import resolve_directions, textline_order
from tesseract_spark.operators.diacritics import assign_diacritics
from tesseract_spark.operators.osd import detect_orientation


def test_diacritics_attach_to_overlapping_word():
    words = np.array([[10, 20, 50, 36], [60, 20, 100, 36]])
    noise = np.array(
        [
            [30, 14, 33, 17],  # above word 0, gap 3 -> attach 0
            [70, 38, 72, 40],  # below word 1, gap 2 -> attach 1
            [30, 5, 33, 8],  # gap 12 -> too far
            [105, 20, 108, 24],  # no horizontal overlap
        ]
    )
    got = assign_diacritics(noise, words, max_gap=6)
    assert got.tolist() == [0, 1, -1, -1]


def test_diacritics_tie_breaks_to_closest():
    words = np.array([[10, 20, 50, 30], [10, 40, 50, 50]])
    dot = np.array([[20, 32, 23, 35]])  # gap 2 to word 0, gap 5 to word 1
    assert assign_diacritics(dot, words).tolist() == [0]


def test_bidi_ltr_paragraph_with_rtl_run():
    # resultiterator.cpp:256-330 semantics: RTL run reversed in place
    dirs = ["L", "L", "R", "R", "R", "L"]
    assert textline_order(dirs, base_rtl=False) == [0, 1, 4, 3, 2, 5]


def test_bidi_pure_rtl_line():
    assert textline_order(["R", "R", "R"], base_rtl=True) == [2, 1, 0]


def test_bidi_rtl_paragraph_with_ltr_embed():
    dirs = ["R", "L", "L", "R"]
    # rightmost run first: [3], then LTR embed in order [1,2], then [0]
    assert textline_order(dirs, base_rtl=True) == [3, 1, 2, 0]


def test_bidi_neutral_resolution():
    assert resolve_directions(["L", "N", "L"], base_rtl=False) == ["L", "L", "L"]
    assert resolve_directions(["R", "N", "L"], base_rtl=False) == ["R", "L", "L"]
    assert resolve_directions(["N"], base_rtl=True) == ["R"]
    assert textline_order([], base_rtl=False) == []


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_osd_detects_rotation(rot):
    """unittest/osd_test.cc MatchOrientationDegrees at fixture scale:
    the reference runs DetectOrientationScript over phototest rotations
    of 0/90/180/270 and asserts the exact degrees; same contract here
    over the fixture page (its tessdata-repo images aren't shipped)."""
    page = compose_page(
        PageSpec(paragraphs=[["the quick brown fox", "jumps over the dog"]])
    )
    img = np.rot90(page.image, k=rot // 90)
    best, scores = detect_orientation(img)
    assert best == rot, scores


def test_fixed_pitch_detection():
    from tesseract_spark.operators.pitch import detect_pitch

    rng = np.random.default_rng(0)
    fixed = np.arange(20) * 12.0 + rng.uniform(-0.5, 0.5, 20)
    ok, pitch = detect_pitch(fixed)
    assert ok and abs(pitch - 12.0) < 0.5
    prop = np.cumsum(rng.uniform(6, 18, 20))
    ok2, _ = detect_pitch(prop)
    assert not ok2


def test_fixed_pitch_word_segmentation():
    from tesseract_spark.operators.pitch import segment_fixed_pitch_words

    # three glyphs, 2-cell gap, two glyphs
    centers = np.array([0.0, 12.0, 24.0, 60.0, 72.0])
    words = segment_fixed_pitch_words(centers, pitch=12.0)
    assert words == [[0, 1, 2], [3, 4]]


def test_knn_lsh_join_recall_vs_brute():
    """The multi-table sign-LSH kNN join must retrieve >= the documented
    fraction of the brute-force top-10 neighbour sets (the recall contract
    of q_knn_lsh_join; brute path = q_knn_label_accuracy's pair ranking)."""
    import duckdb

    from tesseract_spark.queries import (
        K_KNN_LSH_DOC_RECALL,
        ORACLE_KNN_LSH_JOIN,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    brute = con.execute(
        """
        WITH e AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        pairs AS (SELECT a.vec_id, b.vec_id AS nid,
          round(list_sum(list_transform(generate_series(1, len(a.v)),
                                        i -> a.v[i] * b.v[i])) /
            (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
             sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS cosine
          FROM e a, e b WHERE a.vec_id <> b.vec_id)
        SELECT vec_id, nid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY cosine DESC, nid) AS r FROM pairs)
        WHERE r <= 10
        """
    ).fetchdf()
    lsh = con.execute(
        f"SELECT vec_id, nid FROM ({ORACLE_KNN_LSH_JOIN}) t"
    ).fetchdf()
    bs = set(map(tuple, brute.values))
    ls = set(map(tuple, lsh.values))
    recall = len(bs & ls) / len(bs)
    assert recall >= K_KNN_LSH_DOC_RECALL, recall


def test_script_detection_latin_page():
    """ScriptDetector (osdetect.cpp:357-530): a letters page votes Latin
    with max confidence; a digits-only page yields no non-Common
    evidence (digits are script Common, skipped by update_best_script)."""
    from tesseract_spark.operators.osd import detect_script, get_osd_text

    page = compose_page(
        PageSpec(paragraphs=[["the quick brown fox", "jumps over the dog"]])
    )
    script, conf = detect_script(page.image)
    assert script == "Latin" and conf == 2.0
    osd = get_osd_text(page.image, page_number=3)
    assert "Page number: 3" in osd
    assert "Orientation in degrees: 0" in osd
    assert "Script: Latin" in osd
    assert "Script confidence: 2.00" in osd
    digits = compose_page(PageSpec(paragraphs=[["0123 456 789 01"]]))
    script_d, conf_d = detect_script(digits.image)
    assert conf_d == 0.0  # no script evidence from Common-only blobs


def test_script_vote_mechanics():
    """The vote core: unambiguous blobs vote +1 for their top script;
    a runner-up within kNonAmbiguousMargin voids the blob's vote; the
    confidence is (first/second - 1)/(ratio - 1) with 2.0 uncontested
    (osdetect.cpp:78-99, 455-510)."""
    from tesseract_spark.operators.osd import best_script, script_vote

    votes = script_vote(
        [
            [("Latin", -1.0), ("Han", -5.0)],   # clear Latin vote
            [("Latin", -1.0), ("Han", -1.5)],   # ambiguous (margin 1.0): no vote
            [("Han", -0.5), ("Latin", -9.0)],   # clear Han vote
            [("Latin", -2.0)],                  # single choice: Latin
        ]
    )
    assert votes == {"Latin": 2.0, "Han": 1.0}
    script, conf = best_script(votes)
    assert script == "Latin"
    assert conf == round((2.0 / 1.0 - 1.0) / 0.3, 2)
    assert best_script({"Latin": 3.0}) == ("Latin", 2.0)
    assert best_script({"Common": 9.0}) == ("Latin", 0.0)


def test_osd_rotated_page_script_stable():
    """Script detection deskews through the orientation result first:
    the same Latin verdict at every rotation."""
    from tesseract_spark.operators.osd import detect_script

    page = compose_page(
        PageSpec(paragraphs=[["the quick brown fox", "jumps over the dog"]])
    )
    for rot in (0, 90, 180, 270):
        img = np.rot90(page.image, k=rot // 90)
        script, conf = detect_script(img)
        assert (script, conf) == ("Latin", 2.0), rot


def test_tab_vectors_two_column_page():
    """Two columns yield four tab stops: each column's aligned left and
    right edges with clean gutters outside them (FindInitialTabVectors,
    tabfind.cpp:512; evaluation/sort :938-1080)."""
    from tesseract_spark.functions.image_ops import binarize_otsu, label_and_stats
    from tesseract_spark.operators.tabs import find_tab_vectors

    page = compose_page(
        PageSpec(
            paragraphs=[["left col one", "left col two", "left col xyz"]],
            column2=[["right col one", "right col two", "right col abc"]],
        )
    )
    stats = label_and_stats(binarize_otsu(page.image))[2]
    vs = find_tab_vectors(stats)
    kinds = [v.kind for v in vs]
    assert kinds == ["left", "right", "left", "right"], vs
    # left tabs at the two column origins (margin 12, column 2 start)
    assert abs(vs[0].x - 12) <= 2
    assert vs[2].x > vs[1].x  # column 2 starts right of column 1's end
    assert all(v.n_blobs >= 3 for v in vs)


def test_tab_vectors_ragged_right():
    """A ragged-right column keeps its left tab but yields no right tab
    (right edges unaligned) — the ragged case EvaluateTabs distinguishes."""
    import numpy as np

    from tesseract_spark.functions.fonts import render_line
    from tesseract_spark.functions.image_ops import binarize_otsu, label_and_stats
    from tesseract_spark.operators.tabs import find_tab_vectors
    from tesseract_spark.functions.fonts import mask_to_gray

    lines = ["short", "much longer line", "mid size"]
    W = 220
    mask = np.zeros((110, W), dtype=bool)
    for i, t in enumerate(lines):
        lm = render_line(t)
        mask[12 + i * 22 : 12 + i * 22 + lm.shape[0], 12 : 12 + lm.shape[1]] |= lm
    stats = label_and_stats(binarize_otsu(mask_to_gray(mask)))[2]
    vs = find_tab_vectors(stats)
    assert any(v.kind == "left" and abs(v.x - 12) <= 2 for v in vs)
    assert not any(v.kind == "right" for v in vs)


def test_tab_vectors_reject_staircase_edges():
    """A staircase of left edges (each consecutive gap <= tol but total
    spread beyond it) is NOT an aligned tab stop — anchor clustering
    bounds the spread (regression for chained-linkage false positives)."""
    import numpy as np

    from tesseract_spark.operators.tabs import find_tab_vectors

    # blobs at left edges 10, 12, 14, 16: pairwise steps of 2 (== tol)
    # but 6px total spread — no common line within +-2
    stats = np.array(
        [
            [10, 10, 40, 20, 100],
            [12, 30, 42, 40, 100],
            [14, 50, 44, 60, 100],
            [16, 70, 46, 80, 100],
        ]
    )
    assert find_tab_vectors(stats) == []
