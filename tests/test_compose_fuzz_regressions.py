"""Regression pins from the round-4 composition fuzzer.

A seeded fuzzer over PageSpec (random paragraphs, unbalanced second
columns, photos, rules, skew, inversion, noise, indents — 120 cases)
found five distinct layout/detection bugs; every failing spec is pinned
here verbatim.  The bugs, and the fixes they drove:

1. Bridged two-column strips concatenated text across the gutter
   (column-set DP emitted one block for a cost-INF strip) — fixed by
   per-interval pullout splitting in ``_column_sets``.
2. Unbalanced columns (short column 2 beside a tall column 1) split the
   page into vertical runs and interleaved reading order — fixed by
   margin-extended column candidates (colpartition.h:171-178
   left_key/right_key semantics: margins run to the neighbouring
   partition's ink edge / page edge, columns overlap in gutters,
   membership is containment via fit_col, assignment is per-partition).
3. Grid-aligned checkerboard photos vanished under the rank-4 seed
   cascade (a 2px dot field OR-reduces to a 1px checkerboard) — fixed
   by the pixCloseSafeBrick-analogue closing before the cascades
   (leptonica pixGenerateHalftoneMask, called at imagefind.cpp:264).
4. Block-aligned halftone mask windows swallowed neighbouring text rows
   and diluted the region verdict — fixed by scoring the seed-touching
   ink components over their tight bbox (with a 1200 px² solid-path
   floor so a dense glyph pair doesn't read as an image) and retaining
   the mask only there (imagefind.cpp:1106-1180 partition filtering).
5. At the skew grid's outer edge (|s| >= 0.055) the bbox vote can be
   decisively one step off (documented envelope), mangling glyphs at
   rounding boundaries — fixed by gating the pixel-roughness refinement
   on |estimate| >= 0.0495 as well as on ambiguity.
"""

import pytest

from tesseract_spark.functions.compose import PageSpec, compose_page
from tesseract_spark.lstm.templates import get_net
from tesseract_spark.operators.recognize import recognize_page

CASES = {
    # --- bug 2: unbalanced two-column reading order ---
    "col2_unbalanced_tall_left": PageSpec(
        paragraphs=[
            ["vow discotheques", "with brown 42"],
            ["quick brown lazy", "provide five quartz"],
            ["sphinx 2026 quartz", "7 2026 provide black", "dozen brown"],
        ],
        column2=[["box amazingly dozen", "7 lazy quick"]],
        scale=2,
    ),
    "col2_wider_text_below_band": PageSpec(
        paragraphs=[
            ["fox brown", "over fox quartz"],
            ["few amazingly 2026 jukeboxes", "quartz fox",
             "the provide box jukeboxes"],
        ],
        column2=[["liquor quartz five", "five my dozen"]],
        scale=1, noise_dots=7, indent_paras=(0,),
    ),
    "col2_with_rule": PageSpec(
        paragraphs=[
            ["jumps dog dog liquor", "brown jumps", "jugs the box jukeboxes"],
            ["pack 99", "13 amazingly 13 over"],
            ["my liquor"],
        ],
        column2=[["of brown jumps", "jumps my my"]],
        scale=1, rules=(1,),
    ),
    "col2_skewed_with_rule": PageSpec(
        paragraphs=[
            ["my liquor", "42 7"],
            ["brown quartz my", "brown jugs"],
            ["jukeboxes of quartz", "2026 quick 2026",
             "discotheques 7 discotheques"],
        ],
        column2=[["black my sphinx", "13 discotheques judge"]],
        scale=1, skew=-0.045, rules=(2,),
    ),
    "col2_skewed_inverted": PageSpec(
        paragraphs=[["fox jugs 42"], ["the amazingly"]],
        column2=[["dozen jukeboxes vow", "13 judge box"]],
        scale=2, skew=0.03, inverted=True, rules=(0,),
    ),
    "col2_small_page_skew": PageSpec(
        paragraphs=[["jukeboxes black jukeboxes"]],
        column2=[["dog black dozen", "of box box"]],
        scale=1, skew=0.02, noise_dots=4, rules=(0,),
    ),
    "col2_inverted_steep": PageSpec(
        paragraphs=[["of jukeboxes jukeboxes with"]],
        column2=[["quick 7 my", "42 dog judge"]],
        scale=1, skew=-0.05, inverted=True,
    ),
    "col2_indented_first_para": PageSpec(
        paragraphs=[
            ["provide jugs my jukeboxes"],
            ["dog five jumps"],
            ["liquor lazy sphinx with", "black 7", "discotheques my"],
        ],
        column2=[["with 42 my", "quick jukeboxes sphinx"]],
        scale=2, skew=0.01, indent_paras=(0,),
    ),
    # --- bugs 3/4: photo detection ---
    "photo_aligned_checkerboard_scale2": PageSpec(
        paragraphs=[
            ["black dog"],
            ["lazy the", "with five jukeboxes 2026", "jumps fox lazy judge"],
        ],
        scale=2, photos=((1, 74, 31),),
    ),
    "photo_small_page_below_findimages_floor": PageSpec(
        paragraphs=[["judge my sphinx", "five quartz"], ["judge dog 2026"]],
        scale=1, photos=((0, 50, 32),),
    ),
    "photo_with_col2_and_indent": PageSpec(
        paragraphs=[
            ["amazingly judge 42 lazy", "quartz 42 vow", "brown dozen judge"],
            ["discotheques my provide five"],
            ["over amazingly sphinx amazingly", "jukeboxes of fox",
             "13 jumps fox"],
        ],
        column2=[["jugs amazingly dog", "liquor brown liquor"]],
        scale=2, indent_paras=(0,), photos=((0, 49, 36),),
    ),
    "photo_skewed_col2": PageSpec(
        paragraphs=[
            ["13 few", "vow black quick box", "jugs jukeboxes sphinx my"],
            ["42 jukeboxes jukeboxes"],
            ["vow jumps box", "sphinx sphinx 2026 fox"],
        ],
        column2=[["black provide few", "over my dog"]],
        scale=2, skew=0.015, photos=((2, 68, 37),),
    ),
    # --- round-2 fuzz batch: composer width + small-page FindImages ---
    # (6) compose_page sized the page from text ink only, so a photo
    #     wider than every text line rendered out of bounds; and (7) the
    #     reference's kMinImageFindSize=100 guard — a leptonica error-
    #     path bound, not semantics — left photos on small pages to the
    #     row builder (now documented-divergent: the numpy cascade runs
    #     from 32px pages up).
    "photo_wider_than_text": PageSpec(
        paragraphs=[["my 2026"]], scale=1, photos=((0, 86, 43),), rules=(0,),
    ),
    "photo_on_page_below_reference_guard": PageSpec(
        paragraphs=[["quick 7"]], scale=2, photos=((0, 70, 37),), rules=(0,),
    ),
    # --- round-3 fuzz batch (wide axes): thin photos at large scales ---
    # (8) photos whose height is at or below the surrounding glyph
    #     height defeat every size gate (a 26px photo strip is SHORTER
    #     than scale-3 glyphs); the texture pass in _grade_blobs now
    #     catches them by lake structure — the largest 4-connected
    #     background component inside a halftone/solid block's bbox is a
    #     tiny interior gap, while any glyph bbox holds large concavities
    #     — with a window-local unshear retry for sheared pages.
    "thin_photo_glyph_height_scale2": PageSpec(
        paragraphs=[["brown my jukeboxes sphinx", "provide jugs"]],
        scale=2, photos=((0, 38, 27), (0, 57, 45)),
    ),
    "thin_photo_shorter_than_scale3_glyphs": PageSpec(
        paragraphs=[
            ["lazy vow box"],
            ["liquor 2026 liquor quick", "quartz jukeboxes jumps brown"],
            ["the sphinx five quartz", "five 13"],
        ],
        column2=[["sphinx my fox"]],
        scale=3, indent_paras=(1, 0), photos=((0, 80, 25),),
    ),
    "thin_photos_inverted_scale3": PageSpec(
        paragraphs=[
            ["dozen dozen my"],
            ["black jumps jugs box", "my 13 box", "my 42 judge quartz"],
        ],
        scale=3, inverted=True, noise_dots=6, photos=((0, 86, 26), (0, 50, 41)),
    ),
    "thin_photo_sheared_lake_chain": PageSpec(
        paragraphs=[
            ["dog dozen with", "7 jugs with few"],
            ["vow discotheques fox amazingly", "amazingly 2026 jukeboxes quick",
             "dozen brown jukeboxes"],
        ],
        scale=1, skew=-0.02, noise_dots=2, photos=((1, 51, 36), (0, 41, 26)),
        pullout_lines=["black brown jukeboxes with"],
    ),
    # --- round-4 fuzz batch: three-column pages ---
    # (9) column3 support exercises the column-set DP at k=3; the
    #     sheared case pinned a rule-finder gap — the deskew retry was
    #     gated on an EMPTY first pass, so a sheared page where the
    #     straight morphology caught one of three collinear bars never
    #     re-looked for the others (they vanished as pseudo-underlines);
    #     the retry now always runs on sheared pages and appends.
    "three_columns_balanced": PageSpec(
        paragraphs=[["quick brown fox", "jumps over dog"]],
        column2=[["pack my box", "five dozen"]],
        column3=[["sphinx of black", "judge my vow"]],
        scale=2,
    ),
    "three_columns_unbalanced_with_pullout": PageSpec(
        paragraphs=[["the quick brown", "fox jumps"]],
        column2=[["pack my", "box with", "five dozen"]],
        column3=[["jugs few"]],
        scale=2, pullout_lines=["amazingly few discotheques provide"],
    ),
    "three_columns_sheared_collinear_rules": PageSpec(
        paragraphs=[["over jukeboxes five"]],
        column2=[["box discotheques jumps", "brown judge the"]],
        column3=[["my the", "five box"]],
        scale=1, skew=0.04, inverted=True, rules=(0,),
    ),
    # --- bug 5: skew-grid outer edge ---
    "skew_grid_edge_inverted": PageSpec(
        paragraphs=[["pack dozen", "quartz sphinx"]],
        scale=2, skew=-0.06, inverted=True, rules=(0,),
    ),
    # --- round-4 continuation campaign (seeds 101/202/303/404/606):
    #     ten fixes, each pinned by the case that found it ---
    # (m) narrow single-line page at |skew|=0.05: the pixel-roughness
    #     refinement moved a CORRECT bbox estimate one grid step off
    #     (hamming saturates on narrow pages) — now a neighbour slope
    #     needs hamming AND row-concentration agreement to replace it
    "narrow_line_skew_refine_misfire": PageSpec(
        paragraphs=[["quick quick"]], scale=1, skew=-0.05, noise_dots=4,
    ),
    # (n) a neighbour column's rule overhanging 19% into the next column
    #     split that column's paragraph (separator ownership rule)
    "rule_overhang_splits_neighbour_para": PageSpec(
        paragraphs=[["2026 vow jumps the", "discotheques liquor provide"]],
        column2=[["dozen 42 jumps"],
                 ["box over", "7 amazingly jumps", "jumps five"]],
        column3=[["99 lazy 7", "amazingly 13 vow provide",
                  "quartz jumps 2026 lazy"]],
        scale=1, rules=(0,), pullout_lines=["dozen 7 pack black"],
    ),
    # (o) three same-y per-column rules: the middle rule's own ink
    #     passed the gap-bridging test and chained the outer two into a
    #     page-wide separator (merge order + in-gap separator block)
    "three_collinear_rules_no_chain": PageSpec(
        paragraphs=[["liquor black", "13 quick brown", "few liquor my"]],
        column2=[["black quartz", "black jukeboxes 13 sphinx",
                  "sphinx amazingly five"],
                 ["five quartz provide box", "jugs box", "five judge"],
                 ["fox brown few pack"]],
        column3=[["quick 13 the", "dozen brown liquor",
                  "quick dozen dozen quick"],
                 ["7 box my", "dog few", "five amazingly"]],
        scale=3, rules=(0,), pullout_lines=["jukeboxes pack quick 99"],
    ),
    # (p) a text row crossing the rule band in the gutter passed the
    #     .any() bridge test (now every gap column must carry band ink)
    "text_row_does_not_bridge_rules": PageSpec(
        paragraphs=[["the 7 judge", "over of pack my", "box black"]],
        column2=[["black discotheques",
                  "quartz discotheques brown over"],
                 ["few of liquor", "black provide dozen"],
                 ["42 vow", "99 quartz"]],
        column3=[["discotheques of", "jukeboxes lazy", "42 quick fox"],
                 ["few jukeboxes jugs black", "sphinx fox"]],
        scale=2, photos=((0, 44, 32), (0, 43, 30)), rules=(0,),
    ),
    # (q) a separator overhanging a text row clipped the glyph tops
    #     collinear with it; the clipped '3' read 0.89 and was dropped
    #     by the 0.9 exact gate (degraded-glyph static fallback)
    "rule_clipped_glyph_degraded_fallback": PageSpec(
        paragraphs=[["dog black judge", "dozen amazingly jukeboxes jumps",
                     "pack jugs"]],
        column2=[["provide judge", "13 black quartz"],
                 ["five liquor the vow"],
                 ["sphinx quick vow box", "quick over"]],
        column3=[["over amazingly"],
                 ["13 provide jugs jukeboxes", "lazy jugs"]],
        scale=2, skew=-0.035, noise_dots=7, rules=(0,),
    ),
    # (r) short-middle-column pages: the margin-extended coarse set
    #     outranked the true column set (CommonWidth-based quality from
    #     gutter-evidencing strips + more-columns vote tiebreak)
    "short_middle_column_column_major": PageSpec(
        paragraphs=[["quartz quick"], ["2026 42 99", "7 of", "brown my"],
                    ["provide the 7 2026", "sphinx lazy", "fox quick"]],
        column2=[["dozen 2026 99"]],
        column3=[["judge sphinx"], ["few five", "over over"]],
        scale=1, inverted=True, rules=(2,),
        pullout_lines=["brown brown lazy discotheques"],
    ),
    "short_middle_column_2col_pullout": PageSpec(
        paragraphs=[["black 13 7", "quartz 2026", "the with"]],
        column2=[["13 liquor five 7"]],
        scale=2, skew=0.045, rules=(0,),
        pullout_lines=["jumps liquor provide sphinx"],
    ),
    "short_middle_column_tall_col3": PageSpec(
        paragraphs=[["the quartz"], ["five few"],
                    ["judge quartz of", "pack 42"]],
        column2=[["13 jumps"]],
        column3=[["of 99 of fox", "jukeboxes discotheques",
                  "with jukeboxes jukeboxes"], ["13 pack"]],
        scale=2, noise_dots=4,
        pullout_lines=["judge lazy jukeboxes quartz"],
    ),
    # (s) a narrow column of short lines across a wide gutter fused
    #     into the neighbouring column's textline (gutter-width
    #     adjacent-pair rule in compat)
    "narrow_column_not_fused_across_gutter": PageSpec(
        paragraphs=[["liquor vow five"]],
        column2=[["42 my", "with quick", "quartz jukeboxes"],
                 ["the discotheques lazy", "of jumps of 2026",
                  "over vow"]],
        column3=[["pack amazingly", "liquor 2026 black lazy"],
                 ["lazy pack", "dog box of box"]],
        scale=1, rules=(0,),
        pullout_lines=["discotheques liquor over dog"],
    ),
    # (t) a rule owned by the neighbour column ending mid-block no
    #     longer bounds this block's paragraphs (ownership: starts at
    #     the block's left margin, or spans the block)
    "rule_ownership_bounds_own_column": PageSpec(
        paragraphs=[["2026 jumps pack jumps", "jukeboxes quartz sphinx 7",
                     "liquor judge judge"],
                    ["with over fox five",
                     "discotheques jukeboxes over jugs"]],
        column2=[["with few"]],
        column3=[["2026 dozen", "provide jukeboxes 99 black",
                  "fox brown discotheques 13"],
                 ["over quartz the", "box judge with",
                  "pack jukeboxes discotheques quick"]],
        scale=2, skew=-0.005, photos=((1, 69, 42),), rules=(0,),
        pullout_lines=["over 2026 over provide"],
    ),
    # (u) two photos stacked in one 8x mask block column: the union
    #     bbox failed the solidity test and BOTH vanished, the smaller
    #     re-entering the text pipeline as a phantom row (per-component
    #     retention in _reclaim_text)
    "stacked_photos_per_component_retention": PageSpec(
        paragraphs=[["13 quartz the", "quick the"],
                    ["dog amazingly 7 2026", "jugs my", "jugs with 42"]],
        column2=[["sphinx dog provide"]],
        column3=[["my box"], ["lazy lazy jugs", "provide 42 judge"]],
        scale=1, skew=-0.025, indent_paras=(0, 1),
        photos=((1, 39, 46), (1, 77, 26)), rules=(0,),
        pullout_lines=["dog discotheques my dog"],
    ),
    # --- underline axis (default-on in the fuzzer since round 5):
    #     abutting bars = classic merged underlines; the bar must be
    #     erased, characters restored, golden text unchanged, NO media
    #     emitted.  The round-4 KNOWN OPEN (a scale-1 underline with the
    #     next line ~6 px below covering BOTH sides of the one-sided
    #     test) is CLOSED by the gap-asymmetry arbitration in
    #     _filter_false_positives: an underline abuts its text (near
    #     depth <= ~6 px) while the far side's coverage starts a full
    #     interline gap away (>= near + 4); equal gaps (strike-through,
    #     between-paragraph separators) keep the separator path. ---
    # (r5-a) a rule struck THROUGH a neighbouring column's photo is
    #     removed first (reference order), carving a slot and leaving a
    #     thin residue tail fused to the photo — the merged component's
    #     pseudo-lake and tail-stretched bbox defeated every photo gate
    #     and it re-entered the text pipeline as a phantom row, splitting
    #     the column's paragraph (dense-column-core + slot-healed lake
    #     retry in _grade_blobs)
    "rule_through_photo_core_retry": PageSpec(
        paragraphs=[["sphinx with of", "99 amazingly sphinx jukeboxes"]],
        column2=[["amazingly jugs"]],
        column3=[["vow jukeboxes provide brown", "quick the", "dog quick"]],
        scale=1, skew=0.015, photos=((0, 75, 44),), rules=(0,),
    ),
    "underline_scale1_first_line": PageSpec(
        paragraphs=[["pack my box", "five dozen jugs"]],
        scale=1, underlines=((0, 0),),
    ),
    "underline_scale1_between_lines": PageSpec(
        paragraphs=[["pack my box", "five dozen jugs", "the quick fox"]],
        scale=1, underlines=((0, 1),),
    ),
    "underline_scale2_second_line": PageSpec(
        paragraphs=[["pack my box", "five dozen jugs"]],
        scale=2, underlines=((0, 1),),
    ),
    "underline_scale3_with_rule": PageSpec(
        paragraphs=[["pack the"]], scale=3, rules=(0,),
        underlines=((0, 0),),
    ),
    "underline_two_columns": PageSpec(
        paragraphs=[["quick brown fox"]], column2=[["pack my box"]],
        underlines=((0, 0),),
    ),
    # (v) media fused AFTER the deskew bbox expansion manufactured a
    #     phantom photo+rule overlap at |skew|=0.06 (fuse before the
    #     shear mapping, while boxes are tight)
    "high_skew_media_no_phantom_fuse": PageSpec(
        paragraphs=[["my jumps jukeboxes 42",
                     "discotheques jumps the jumps"],
                    ["of lazy discotheques vow",
                     "discotheques sphinx quartz amazingly",
                     "few jugs box sphinx"],
                    ["over pack the few", "sphinx 13 vow",
                     "provide 99 few"]],
        column2=[["quick 2026", "judge my jugs 7"],
                 ["of the liquor", "7 box dog"]],
        column3=[["sphinx provide"]],
        scale=3, skew=0.06, indent_paras=(2,),
        photos=((2, 60, 35), (2, 64, 28)), rules=(2,),
    ),
    # (w) a column rule below a SHORT line read as that line's
    #     underline and vanished from the separator path (extent check:
    #     an underline hugs its text's x-extent)
    "separator_under_short_line_stays_rule": PageSpec(
        paragraphs=[["provide brown"], ["99 jumps",
                     "with judge discotheques judge", "my my pack"],
                    ["13 few provide", "with 99 dozen", "42 13"]],
        column2=[["my five 42"]],
        column3=[["sphinx five sphinx brown", "13 quartz quick",
                  "brown brown black 2026"],
                 ["box sphinx jumps 99", "discotheques 2026",
                  "provide black 42 liquor"]],
        scale=1, inverted=True, noise_dots=7, rules=(0,),
        pullout_lines=["box liquor over 42"],
    ),
}


@pytest.fixture(scope="module")
def net():
    return get_net()


@pytest.mark.parametrize("name", sorted(CASES))
def test_fuzz_regression(name, net):
    spec = CASES[name]
    page = compose_page(spec)
    spans, _layout = recognize_page(page.image, spec.dpi, None, net)
    got = [(s.kind, s.text) for s in spans]
    assert got == page.golden, f"{name}: {got} != {page.golden}"
