"""Golden page tests: composed pages -> exact span-sequence equality.

The pure-numpy analogue of baseapi_test.cc golden text equality,
layout_test.cc block ordering, paragraphs_test.cc paragraph splits, and
pagesegmode_test.cc single-line modes — over every fixture family.
"""

import numpy as np
import pytest

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.fixtures import FAMILIES, make_page_spec
from tesseract_spark.operators.page import analyze_page
from tesseract_spark.operators.recognize import recognize_page

CASES = {
    "single_line": PageSpec(paragraphs=[["hello world"]]),
    "single_block": PageSpec(
        paragraphs=[["The quick brown fox", "jumps over the lazy dog"]]
    ),
    "multi_para": PageSpec(
        paragraphs=[["first para line one", "line two"], ["second para"], ["third"]]
    ),
    "indent": PageSpec(
        paragraphs=[["no indent start", "continued"], ["indented", "flush again"]],
        indent_paras=(1,),
    ),
    "scale2": PageSpec(paragraphs=[["bigger text here", "second line"]], scale=2),
    "scale3": PageSpec(paragraphs=[["huge glyphs"]], scale=3),
    "skew_pos": PageSpec(paragraphs=[["skewed baseline text", "second line"]], skew=0.02),
    "skew_neg": PageSpec(paragraphs=[["negative skew here", "line two"]], skew=-0.035),
    "skew_scale2": PageSpec(paragraphs=[["two scale skew", "more text"]], scale=2, skew=0.03),
    "inverted": PageSpec(paragraphs=[["white on black text"]], inverted=True),
    "noise": PageSpec(paragraphs=[["noisy margins here", "still reads"]], noise_dots=12),
    "two_column": PageSpec(
        paragraphs=[["left col one", "left col two"]],
        column2=[["right col one", "right col two"]],
    ),
    "mixed_media": PageSpec(
        paragraphs=[["text before photo"], ["text after photo"]], photos=((0, 60, 50),)
    ),
    "rule": PageSpec(paragraphs=[["above the rule"], ["below"]], rules=(0,)),
    "empty": PageSpec(paragraphs=[]),
    "punct": PageSpec(paragraphs=[["Qty: 42 (net), price 3.14!"]]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_span_equality(name):
    spec = CASES[name]
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi)
    assert [(s.kind, s.text) for s in spans] == page.golden


@pytest.mark.parametrize("family", FAMILIES)
def test_family_generator_roundtrip(family):
    rng = np.random.default_rng(7)
    spec = make_page_spec(family, rng)
    page = compose_page(spec)
    spans, _ = recognize_page(page.image, spec.dpi)
    assert [(s.kind, s.text) for s in spans] == page.golden


def test_skew_estimate_exact_on_grid():
    for skew in (-0.05, -0.02, 0.0, 0.015, 0.04):
        spec = PageSpec(paragraphs=[["exact skew recovery line", "two rows"]], skew=skew)
        page = compose_page(spec)
        layout = analyze_page(page.image)
        assert layout.skew == pytest.approx(skew, abs=1e-9)


def test_word_boxes_and_metrics():
    spec = PageSpec(paragraphs=[["three word line"]])
    page = compose_page(spec)
    layout = analyze_page(page.image)
    row = layout.regions[0].rows[0]
    assert len(row.word_boxes) == 3
    assert row.x_height == 8 and row.scale == 1
    assert row.baseline_y == 12 + 12  # margin + BASELINE


def test_empty_page_short_circuit():
    img = np.full((64, 64), 235, dtype=np.uint8)
    layout = analyze_page(img)
    assert layout.regions == [] and layout.n_blobs == 0


def test_exact_slope_recovery_across_corpus_grid():
    """The discrete-shear skew estimator recovers every corpus-envelope
    grid slope exactly at both render scales (the continuous-center model
    it replaced missed by one step on sparse scale-1 pages, dropping
    narrow glyphs after deskew — found via flagship oracle mismatch)."""
    import numpy as np

    from tesseract_spark.functions.compose import PageSpec, compose_page
    from tesseract_spark.functions.image_ops import binarize_otsu, label_and_stats
    from tesseract_spark.operators.page import estimate_skew
    from tesseract_spark.operators.recognize import recognize_page

    lines = ["big table a a", "big sort data data", "query a key a"]
    for s in (-0.03, -0.02, -0.01, 0.0, 0.01, 0.02, 0.03):
        for scale in (1, 2):
            page = compose_page(
                PageSpec(paragraphs=[lines], scale=scale, skew=s)
            )
            stats = label_and_stats(binarize_otsu(page.image))[2]
            assert estimate_skew(stats) == s, (s, scale)
        spans, _ = recognize_page(
            compose_page(PageSpec(paragraphs=[lines], scale=1, skew=s)).image
        )
        assert [t.text for t in spans] == ["\n".join(lines)], s


def test_all_descender_row_recovered_via_alt_baseline():
    """A row of only descender glyphs is baseline-ambiguous (every bottom
    sits at baseline+4s); the alternative-hypothesis retry recovers it."""
    import numpy as np

    from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page

    line = render_line("gy jyg")
    page = np.zeros((CELL_H + 24, line.shape[1] + 24), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + line.shape[1]] = line
    spans, _ = recognize_page(mask_to_gray(page))
    assert [s.text for s in spans if s.kind == "text"] == ["gy jyg"]


def test_skewed_page_media_bbox_in_deskewed_frame():
    """Media regions on a skewed page report bboxes in the same (deskewed)
    frame as text regions: render the SAME text+photo page flat and
    skewed; the skewed page's photo bbox, after analyze_page's deskew
    transform, must match the flat layout's photo bbox within the shear
    rounding tolerance (exercises the skew!=0 media-bbox branch in
    page.analyze_page)."""
    from tesseract_spark.functions.compose import PageSpec, compose_page
    from tesseract_spark.operators.page import analyze_page

    lines = ["big table a a", "big sort data data", "query a key a"]
    spec_flat = PageSpec(paragraphs=[lines], photos=((0, 60, 48),), skew=0.0)
    lay_flat = analyze_page(compose_page(spec_flat).image)
    flat_photos = [g for g in lay_flat.regions if g.kind == "photo"]
    flat_texts = [g for g in lay_flat.regions if g.kind == "text"]
    assert len(flat_photos) == 1 and len(flat_texts) == 1  # fixture sanity

    def rel(photo, text):
        # photo bbox relative to the text region of the SAME layout —
        # frame-offset-free, so it compares across render canvases
        pl, pt, pr, pb = photo.bbox
        tl, tt, _tr, _tb = text.bbox
        return (pl - tl, pt - tt, pr - tl, pb - tt)

    flat_rel = rel(flat_photos[0], flat_texts[0])
    for s in (-0.02, 0.02):
        spec_skew = PageSpec(paragraphs=[lines], photos=((0, 60, 48),), skew=s)
        lay_skew = analyze_page(compose_page(spec_skew).image)
        assert lay_skew.skew == s
        skew_photos = [g for g in lay_skew.regions if g.kind == "photo"]
        skew_texts = [g for g in lay_skew.regions if g.kind == "text"]
        assert len(skew_photos) == 1 and len(skew_texts) == 1
        skew_rel = rel(skew_photos[0], skew_texts[0])
        # x extents untouched by a vertical shear; y extents agree with the
        # flat frame within 2px (per-column integer shift rounding)
        assert skew_rel[0] == flat_rel[0] and skew_rel[2] == flat_rel[2], s
        assert abs(skew_rel[1] - flat_rel[1]) <= 2, (s, skew_rel, flat_rel)
        assert abs(skew_rel[3] - flat_rel[3]) <= 2, (s, skew_rel, flat_rel)
        # reading order (text before photo) unchanged by the skew
        assert [g.kind for g in lay_skew.regions] == [
            g.kind for g in lay_flat.regions
        ], s


def test_two_column_with_pullout_golden():
    """Column-set selection survives a full-width pullout heading
    (colfind.cpp:548-927 column DP; layout_test.cc:191-214 analogue):
    the whole-page x-projection sees NO gutter on this page — only the
    strip-banded vote finds the two-column body."""
    from tesseract_spark.functions.compose import PageSpec, compose_page
    from tesseract_spark.operators.recognize import recognize_page

    for scale in (1, 2):
        spec = PageSpec(
            paragraphs=[["table a key", "sort by data"]],
            column2=[["query the rows", "scan all keys"]],
            pullout_lines=["big headline spanning both columns wide"],
            scale=scale,
        )
        page = compose_page(spec)
        spans, layout = recognize_page(page.image)
        texts = [g for g in layout.regions if g.kind == "text"]
        assert len(texts) == 3, [g.bbox for g in texts]
        # reading order: pullout band, then column 1, column 2
        want = [t for k, t in page.golden if k == "text"]
        got = [s.text for s in spans if s.kind == "text"]
        assert got == want, (scale, got)


def test_mid_page_pullout_run_order():
    """A pullout BETWEEN column bands reads after the band above and
    before the band below (run-major block order, the case the round-1
    gutter projection could not represent)."""
    import numpy as np

    from tesseract_spark.functions.fonts import mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page

    rows = [
        ("left one", 12, 12), ("right one", 200, 12),
        ("left two", 12, 34), ("right two", 200, 34),
        ("a wide pullout caption across the gutter", 12, 64),
        ("left three", 12, 94), ("right three", 200, 94),
        ("left four", 12, 116), ("right four", 200, 116),
    ]
    W, H = 360, 150
    mask = np.zeros((H, W), dtype=bool)
    for text, x, y in rows:
        lm = render_line(text)
        mask[y : y + lm.shape[0], x : x + lm.shape[1]] |= lm
    spans, layout = recognize_page(mask_to_gray(mask))
    got = [s.text for s in spans if s.kind == "text"]
    assert got == [
        "left one\nleft two",
        "right one\nright two",
        "a wide pullout caption across the gutter",
        "left three\nleft four",
        "right three\nright four",
    ], got


def test_pullout_with_media_elements():
    """A pullout heading combined with photos/rules must shift the media
    coordinates down with the text (regression: the y-shift used to
    crash on media elements)."""
    spec = PageSpec(
        paragraphs=[["table a key", "sort by data"]],
        column2=[["query the rows", "scan all keys"]],
        pullout_lines=["big headline spanning both columns wide"],
        photos=((0, 60, 48),),
    )
    page = compose_page(spec)
    spans, layout = recognize_page(page.image)
    kinds = [g.kind for g in layout.regions]
    assert "photo" in kinds
    # the photo sits below the pullout band, not overlapping it
    photo = next(g for g in layout.regions if g.kind == "photo")
    pull = next(g for g in layout.regions if g.kind == "text")
    assert photo.bbox[1] > pull.bbox[3]


def test_alt_baseline_row_reports_true_baseline():
    """When the all-descender alternative hypothesis wins, word records
    report the TRUE baseline (one descender band above the bbox bottom),
    not the primary estimate (regression: hOCR baseline offset was 0 on
    such rows)."""
    import numpy as np

    from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page_detail

    line = render_line("gy jyg")
    page = np.zeros((CELL_H + 24, line.shape[1] + 24), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + line.shape[1]] = line
    spans, words, layout = recognize_page_detail(mask_to_gray(page))
    assert [s.text for s in spans if s.kind == "text"] == ["gy jyg"]
    row = layout.regions[0].rows[0]
    assert row.alt_strip is not None  # fixture really is ambiguous
    bottom = max(w.top + w.height for w in words)
    for w in words:
        assert w.baseline == bottom - 4 * row.scale, (w.baseline, bottom)


def test_column_layout_change_down_the_page():
    """A page whose column layout CHANGES between vertical bands — a
    long single-column head over a two-column body — assigns a
    different column set per band (AssignColumns' modal ranges,
    colfind.cpp:715-765), the case a single global gutter vote cannot
    represent: the head's full-width lines would out-vote the body's
    gutter and flatten the page to one column."""
    import numpy as np

    from tesseract_spark.functions.fonts import mask_to_gray, render_line
    from tesseract_spark.operators.recognize import recognize_page

    head = [
        "a very long single column heading line here",
        "and a second full width heading line too",
        "and a third one so the head has the votes",
        "plus a fourth full width line of the head",
    ]
    body = [
        ("left one", "right one"),
        ("left two", "right two"),
        ("left three", "right three"),
    ]
    W, H = 380, 240
    mask = np.zeros((H, W), dtype=bool)
    y = 12
    for text in head:
        lm = render_line(text)
        mask[y : y + lm.shape[0], 12 : 12 + lm.shape[1]] |= lm
        y += 22
    y += 10
    for lt, rt in body:
        for text, x in ((lt, 12), (rt, 220)):
            lm = render_line(text)
            mask[y : y + lm.shape[0], x : x + lm.shape[1]] |= lm
        y += 22
    spans, _layout = recognize_page(mask_to_gray(mask))
    got = [s.text for s in spans if s.kind == "text"]
    assert got == [
        "\n".join(head),
        "left one\nleft two\nleft three",
        "right one\nright two\nright three",
    ], got


def test_small_photo_below_absolute_gate_is_still_media():
    """A small halftone (50x36 — under the 40x40 absolute photo gate and
    under imagefind's kMinImageFindSize page minimum) on small-print
    text: the RELATIVE photo gate (filter_blobs' size-vs-text semantics,
    tordmain.cpp:290-310) must lift it, else it reaches the row builder
    and decodes as an empty garbage line (the trailing-newline
    regression this pins).  Both photos emit media spans in order."""
    spec = PageSpec(
        paragraphs=[["text between photos"], ["lower text here"]],
        photos=((0, 60, 40), (1, 50, 36)),
    )
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi)
    assert [(s.kind, s.text) for s in spans] == page.golden
