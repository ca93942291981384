"""4-pass paragraph model vs the reference's ASCII fixtures.

Fixtures ported from unittest/paragraphs_test.cc:206-640 (TextAndModel
tables + EvaluateParagraphDetection): each row is (text, type, model,
crown, is_list) where type is PSTART/PCONT/PNONE, model is
(justification, margin, first_indent, body_indent), crown is the PARA
is_very_first_or_continuation flag.
"""

import pandas as pd
import pytest

from tesseract_spark.operators.paragraphs import (
    Paragraph,
    ParagraphModel,
    RowInfo,
    ascii_likely_list_item,
    detect_paragraphs,
    detect_paragraphs_df,
)

PSTART, PCONT, PNONE = "start", "cont", "none"
L, R, C, NA = "left", "right", "center", None


def M(j, margin=0, first=0, body=0):
    return ParagraphModel(j, margin, first, body)


def run_fixture(fixture, seed_models=None):
    rows = [RowInfo(t) for t, *_ in fixture]
    paras, owners = detect_paragraphs(rows, seed_models=seed_models)
    return paras, owners


def evaluate(fixture, paras, owners):
    """EvaluateParagraphDetection (paragraphs_test.cc:151-205): break
    agreement + model comparability + crown + list flags."""
    n = len(fixture)
    errors = []
    # break agreement over the PNONE-compressed row sequence (the
    # reference harness assigns blank rows to a neighboring PARA, so
    # adjacent-pointer comparison is PNONE-transparent there too)
    seq = [i for i in range(n) if fixture[i][1] != PNONE]
    for a, b in zip(seq, seq[1:]):
        has_break = fixture[b][1] != PCONT
        detected = owners[a] != owners[b]
        if has_break and not detected:
            errors.append(f"row {b}: missed break")
        if detected and not has_break:
            errors.append(f"row {b}: incorrect break")
    for i in range(n):
        text, typ, model, crown, is_list = fixture[i]
        if typ == PNONE:
            if owners[i] is not None:
                errors.append(f"row {i}: expected PNONE")
            continue
        if typ != PSTART:
            continue
        if owners[i] is None:
            errors.append(f"row {i}: no paragraph")
            continue
        p = paras[owners[i]]
        if model is not None and (
            p.model is None or not model.comparable(p.model)
        ):
            errors.append(f"row {i}: model {p.model} != {model}")
        if bool(crown) != p.crown:
            errors.append(f"row {i}: crown {p.crown} != {crown}")
        if bool(is_list) != p.is_list:
            errors.append(f"row {i}: is_list {p.is_list} != {is_list}")
    assert not errors, "\n".join(errors)


def test_list_items_identified():
    """ListItemsIdentified (paragraphs_test.cc:206-227)."""
    for w in ("iii", "A.", "B.", "C.", "1.", "2.", "3.", "1", "2", "3",
              "[[1]]", "A-1.", "A-2", "(A)(i)"):
        assert ascii_likely_list_item(w), w
    for w in ("The", "first", "house", "Oregonian.", "on."):
        assert not ascii_likely_list_item(w), w


K_TWO_SIMPLE = [
    ("  Look here, I have a paragraph.", PSTART, M(L, 0, 20, 0), False, False),
    ("This paragraph starts at the top", PCONT, None, False, False),
    ("of the page and takes 3 lines.  ", PCONT, None, False, False),
    ("  Here I have a second paragraph", PSTART, M(L, 0, 20, 0), False, False),
    ("which indicates that the first  ", PCONT, None, False, False),
    ("paragraph is not a continuation ", PCONT, None, False, False),
    ("from a previous page, as it is  ", PCONT, None, False, False),
    ("indented just like this second  ", PCONT, None, False, False),
    ("paragraph.                      ", PCONT, None, False, False),
]


def test_simple_paragraph_detection():
    evaluate(K_TWO_SIMPLE, *run_fixture(K_TWO_SIMPLE))


K_FEW_CLUES_CROWN = [
    ("This paragraph starts at the top", PSTART, M(L, 0, 20, 0), True, False),
    ("of the page and takes two lines.", PCONT, None, False, False),
    ("  Here I have a second paragraph", PSTART, M(L, 0, 20, 0), False, False),
    ("which indicates that the first  ", PCONT, None, False, False),
    ("paragraph is a continuation from", PCONT, None, False, False),
    ("a previous page, as it is       ", PCONT, None, False, False),
    ("indented just like this second  ", PCONT, None, False, False),
    ("paragraph.                      ", PCONT, None, False, False),
]


def test_few_clues_with_crown():
    evaluate(K_FEW_CLUES_CROWN, *run_fixture(K_FEW_CLUES_CROWN))


K_CROWNED = [
    ("The first paragraph on a page is", PSTART, M(L, 0, 20, 0), True, False),
    ("often not indented as the rest  ", PCONT, None, False, False),
    ("of the paragraphs are.  Nonethe-", PCONT, None, False, False),
    ("less it should be counted as the", PCONT, None, False, False),
    ("same type of paragraph.         ", PCONT, None, False, False),
    ("  The second and third para-    ", PSTART, M(L, 0, 20, 0), False, False),
    ("graphs are both indented two    ", PCONT, None, False, False),
    ("spaces.                         ", PCONT, None, False, False),
    ("  The first paragraph has what  ", PSTART, M(L, 0, 20, 0), False, False),
    ("fmt refers to as a 'crown.'     ", PCONT, None, False, False),
]


def test_crown_paragraph_detection():
    evaluate(K_CROWNED, *run_fixture(K_CROWNED))


K_FLUSH_LEFT = [
    ("It  is sometimes  the case  that", PSTART, M(L, 0, 0, 0), False, False),
    ("flush  left   paragraphs  (those", PCONT, None, False, False),
    ("with  no  body  indent)  are not", PCONT, None, False, False),
    ("actually crowns.                ", PCONT, None, False, False),
    ("Instead,  further paragraphs are", PSTART, M(L, 0, 0, 0), False, False),
    ("also flush left aligned.  Usual-", PCONT, None, False, False),
    ("ly,  these  paragraphs  are  set", PCONT, None, False, False),
    ("apart vertically  by some white-", PCONT, None, False, False),
    ("space,  but you can also  detect", PCONT, None, False, False),
    ("them by observing  the big empty", PCONT, None, False, False),
    ("space at the  ends  of the para-", PCONT, None, False, False),
    ("graphs.                         ", PCONT, None, False, False),
]


def test_real_flush_left_paragraphs():
    evaluate(K_FLUSH_LEFT, *run_fixture(K_FLUSH_LEFT))


K_FULL_PAGE_CONTINUATION = [
    ("sometimes a page is one giant", PSTART, M(L, 0, 20, 0), True, False),
    ("continuation.  It flows  from", PCONT, None, False, False),
    ("line to  line, using the full", PCONT, None, False, False),
    ("column  width  with  no clear", PCONT, None, False, False),
    ("paragraph  break,  because it", PCONT, None, False, False),
    ("actually doesn't have one. It", PCONT, None, False, False),
    ("is the  middle of one monster", PCONT, None, False, False),
    ("paragraph continued  from the", PCONT, None, False, False),
    ("previous page and  continuing", PCONT, None, False, False),
    ("onto the  next  page.  There-", PCONT, None, False, False),
    ("fore,  it  ends  up   getting", PCONT, None, False, False),
    ("marked  as a  crown  and then", PCONT, None, False, False),
    ("getting re-marked as any  ex-", PCONT, None, False, False),
    ("isting model.  Not great, but", PCONT, None, False, False),
]


def test_single_full_page_continuation():
    """TestSingleFullPageContinuation: a pre-seeded model (the previous
    page's) adopts the whole page as one crown paragraph."""
    paras, owners = run_fixture(
        K_FULL_PAGE_CONTINUATION, seed_models=[M(L, 0, 20, 0)]
    )
    evaluate(K_FULL_PAGE_CONTINUATION, paras, owners)


K_RIGHT_ALIGNED = [
    ("Right-aligned paragraphs are", PSTART, M(R, 0, 0, 0), False, False),
    ("   uncommon in Left-to-Right", PCONT, None, False, False),
    ("      languages, but they do", PCONT, None, False, False),
    ("                      exist.", PCONT, None, False, False),
    ("    Mostly, however, they're", PSTART, M(R, 0, 0, 0), False, False),
    (" horribly tiny paragraphs in", PCONT, None, False, False),
    ("  tables on which we have no", PCONT, None, False, False),
    ("             chance anyways.", PCONT, None, False, False),
]


def test_right_aligned_paragraph():
    evaluate(K_RIGHT_ALIGNED, *run_fixture(K_RIGHT_ALIGNED))


K_TINY = [
    ("  Occasionally, interspersed with", PSTART, M(L, 0, 20, 0), False, False),
    ("obvious paragraph text, you might", PCONT, None, False, False),
    ("find short exchanges of dialogue ", PCONT, None, False, False),
    ("between characters.              ", PCONT, None, False, False),
    ("  'Oh?'                          ", PSTART, M(L, 0, 20, 0), False, False),
    ("  'Don't be confused!'           ", PSTART, M(L, 0, 20, 0), False, False),
    ("  'Not me!'                      ", PSTART, M(L, 0, 20, 0), False, False),
    ("  One naive approach would be to ", PSTART, M(L, 0, 20, 0), False, False),
    ("mark a new paragraph whenever one", PCONT, None, False, False),
    ("of the statistics (left, right or", PCONT, None, False, False),
    ("center)  changes  from  one text-", PCONT, None, False, False),
    ("line  to  the  next.    Such   an", PCONT, None, False, False),
    ("approach  would  misclassify  the", PCONT, None, False, False),
    ("tiny paragraphs above as a single", PCONT, None, False, False),
    ("paragraph.                       ", PCONT, None, False, False),
]


def test_tiny_paragraphs():
    evaluate(K_TINY, *run_fixture(K_TINY))


K_COMPLEX_1 = [
    ("       Awesome                  ", PSTART, M(C, 0, 0, 0), False, False),
    ("   Centered Title               ", PCONT, None, False, False),
    (" Paragraph Detection            ", PCONT, None, False, False),
    ("      OCR TEAM                  ", PCONT, None, False, False),
    ("  10 November 2010              ", PCONT, None, False, False),
    ("                                ", PNONE, None, False, False),
    ("  Look here, I have a paragraph.", PSTART, M(L, 0, 20, 0), False, False),
    ("This paragraph starts at the top", PCONT, None, False, False),
    ("of the page and takes 3 lines.  ", PCONT, None, False, False),
    ("  Here I have a second paragraph", PSTART, M(L, 0, 20, 0), False, False),
    ("which indicates that the first  ", PCONT, None, False, False),
    ("paragraph is not a continuation ", PCONT, None, False, False),
    ("from a previous page, as it is  ", PCONT, None, False, False),
    ("indented just like this second  ", PCONT, None, False, False),
    ("paragraph.                      ", PCONT, None, False, False),
    ("   Here is a block quote. It    ", PSTART, M(L, 30, 0, 0), True, False),
    ("   looks like the prior text    ", PCONT, None, False, False),
    ("   but it  is indented  more    ", PCONT, None, False, False),
    ("   and is fully justified.      ", PCONT, None, False, False),
    ("  So how does one deal with     ", PSTART, M(L, 0, 20, 0), False, False),
    ("centered text, block quotes,    ", PCONT, None, False, False),
    ("normal paragraphs, and lists    ", PCONT, None, False, False),
    ("like what follows?              ", PCONT, None, False, False),
    ("1. Make a plan.                 ", PSTART, M(L, 0, 0, 30), False, True),
    ("2. Use a heuristic, for example,", PSTART, M(L, 0, 0, 30), False, True),
    ("   looking for lines where the  ", PCONT, None, False, False),
    ("   first word of the next line  ", PCONT, None, False, False),
    ("   would fit on the previous    ", PCONT, None, False, False),
    ("   line.                        ", PCONT, None, False, False),
    ("8. Try to implement the plan in ", PSTART, M(L, 0, 0, 30), False, True),
    ("   Python and try it out.       ", PCONT, None, False, False),
    ("4. Determine how to fix the     ", PSTART, M(L, 0, 0, 30), False, True),
    ("   mistakes.                    ", PCONT, None, False, False),
    ("5. Repeat.                      ", PSTART, M(L, 0, 0, 30), False, True),
    ("  For extra painful penalty work", PSTART, M(L, 0, 20, 0), False, False),
    ("you can try to identify source  ", PCONT, None, False, False),
    ("code.  Ouch!                    ", PCONT, None, False, False),
]


def test_complex_page_1():
    evaluate(K_COMPLEX_1, *run_fixture(K_COMPLEX_1))


# kComplexPage2 (paragraphs_test.cc:141-179): identical page, wider
# column.  The reference's own table marks "1. Make a plan." as PCONT
# with a "// BUG!!" comment — its detector misses that list-item break.
# This engine takes the list-item clue and DOES break there, so the
# fixture below carries the CORRECT expectation (documented divergence:
# we fix the reference's acknowledged bug).
K_COMPLEX_2 = [
    ("       Awesome                     ", PSTART, M(C, 0, 0, 0), False, False),
    ("   Centered Title                  ", PCONT, None, False, False),
    (" Paragraph Detection               ", PCONT, None, False, False),
    ("      OCR TEAM                     ", PCONT, None, False, False),
    ("  10 November 2010                 ", PCONT, None, False, False),
    ("                                   ", PNONE, None, False, False),
    ("  Look here, I have a paragraph.   ", PSTART, M(L, 0, 20, 0), False, False),
    ("This paragraph starts at the top of", PCONT, None, False, False),
    ("the page and takes 3 lines.        ", PCONT, None, False, False),
    ("  Here I have a second paragraph   ", PSTART, M(L, 0, 20, 0), False, False),
    ("which indicates that the first     ", PCONT, None, False, False),
    ("paragraph is not a continuation    ", PCONT, None, False, False),
    ("from a previous page, as it is in- ", PCONT, None, False, False),
    ("dented just like this second para- ", PCONT, None, False, False),
    ("graph.                             ", PCONT, None, False, False),
    ("   Here is a block quote. It       ", PSTART, M(L, 30, 0, 0), True, False),
    ("   looks like the prior text       ", PCONT, None, False, False),
    ("   but it  is indented  more       ", PCONT, None, False, False),
    ("   and is fully justified.         ", PCONT, None, False, False),
    ("  So how does one deal with center-", PSTART, M(L, 0, 20, 0), False, False),
    ("ed text, block quotes, normal para-", PCONT, None, False, False),
    ("graphs, and lists like what follow?", PCONT, None, False, False),
    ("1. Make a plan.                    ", PSTART, M(L, 0, 0, 30), False, True),
    ("2. Use a heuristic, for example,   ", PSTART, M(L, 0, 0, 30), False, True),
    ("   looking for lines where the     ", PCONT, None, False, False),
    ("   first word of the next line     ", PCONT, None, False, False),
    ("   would fit on the previous line. ", PCONT, None, False, False),
    ("8. Try to implement the plan in    ", PSTART, M(L, 0, 0, 30), False, True),
    ("   Python and try it out.          ", PCONT, None, False, False),
    ("4. Determine how to fix the        ", PSTART, M(L, 0, 0, 30), False, True),
    ("   mistakes.                       ", PCONT, None, False, False),
    ("5. Repeat.                         ", PSTART, M(L, 0, 0, 30), False, True),
    ("  For extra painful penalty work   ", PSTART, M(L, 0, 20, 0), False, False),
    ("you can try to identify source     ", PCONT, None, False, False),
    ("code.  Ouch!                       ", PCONT, None, False, False),
]


def test_complex_page_2():
    evaluate(K_COMPLEX_2, *run_fixture(K_COMPLEX_2))


K_SUBTLE_CROWN = [
    ("The first paragraph on a page is", PSTART, M(L, 0, 20, 0), True, False),
    ("often not indented as the rest  ", PCONT, None, False, False),
    ("of the paragraphs are.  Nonethe-", PCONT, None, False, False),
    ("less it should be counted as the", PCONT, None, False, False),
    ("same type of paragraph.         ", PCONT, None, False, False),
    ("  Even a short second paragraph ", PSTART, M(L, 0, 20, 0), False, False),
    ("should suffice.                 ", PCONT, None, False, False),
]


def test_subtle_crown():
    # the reference evaluates countof-1 rows (drops the stray "1235")
    evaluate(K_SUBTLE_CROWN, *run_fixture(K_SUBTLE_CROWN))


K_SUBTLE_CROWN_FULL = K_SUBTLE_CROWN + [
    ("             1235               ", PNONE, None, False, False),
]


def test_stray_line_in_block():
    """TestStrayLineInBlock (paragraphs_test.cc): the page-number stray
    row gets no paragraph (PNONE) and leaves the rest unchanged."""
    evaluate(K_SUBTLE_CROWN_FULL, *run_fixture(K_SUBTLE_CROWN_FULL))


def test_paragraphs_df_wrapper(spark):
    """The applyInPandas wrapper yields the same breaks as the local
    detector for the simple two-paragraph page."""
    rows = [
        ("d1", 0, i, t) for i, (t, *_rest) in enumerate(K_TWO_SIMPLE)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, block_id int, row_num int, text string"
    )
    out = (
        detect_paragraphs_df(df)
        .orderBy("row_num")
        .select("row_num", "para_num", "first_indent")
        .collect()
    )
    paras = [r.para_num for r in out]
    assert paras == [0, 0, 0, 1, 1, 1, 1, 1, 1]
    assert all(r.first_indent == 20 for r in out)


K_TABLE_OF_CONTENTS = [
    ("1 Hmong People ........... 1", PSTART, None, False, False),
    ("   Hmong Origins . . . . . 1", PSTART, None, False, False),
    ("    Language . . . . . . . 1", PSTART, None, False, False),
    ("     Proverbs . . . . . .  2", PSTART, None, False, False),
    ("        Discussion . . . . 2", PSTART, None, False, False),
    ("     Riddles . . . . . . . 2", PSTART, None, False, False),
    ("        Discussion . . . . 3", PSTART, None, False, False),
    ("     Appearance . . . . .  3", PSTART, None, False, False),
    ("   Hmong History . . . . . 4", PSTART, None, False, False),
    ("    Hmong in SE Asia . . . 4", PSTART, None, False, False),
    ("    Hmong in the West . . .5", PSTART, None, False, False),
    ("    Hmong in the USA . . . 5", PSTART, None, False, False),
    ("        Discussion . . . . 6", PSTART, None, False, False),
]


def test_splits_out_leader_lines():
    """TestSplitsOutLeaderLines (paragraphs_test.cc): every TOC leader
    row is its own paragraph (kUnknown model)."""
    paras, owners = run_fixture(K_TABLE_OF_CONTENTS)
    evaluate(K_TABLE_OF_CONTENTS, paras, owners)
    assert len({o for o in owners}) == len(K_TABLE_OF_CONTENTS)


K_NZ_INDEX = [
    ("Oats, 51                      ", PSTART, M(L, 0, 0, 30), False, False),
    ("O'Brien, Gregory, 175         ", PSTART, M(L, 0, 0, 30), False, False),
    ("Occupational composition, 110,", PSTART, M(L, 0, 0, 30), False, False),
    ("   138                        ", PCONT, None, False, False),
    ("OECD rankings, 155, 172       ", PSTART, M(L, 0, 0, 30), False, False),
    ("Okiato (original capital), 47 ", PSTART, M(L, 0, 0, 30), False, False),
    ("Oil shock: 1974, xxx, 143; 1979,", PSTART, M(L, 0, 0, 30), False, False),
    ("   145                        ", PCONT, None, False, False),
    ("Old Age Pensions, xxii, 89-90 ", PSTART, M(L, 0, 0, 30), False, False),
    ("Old World evils, 77           ", PSTART, M(L, 0, 0, 30), False, False),
    ("Oliver, W. H., 39, 77, 89     ", PSTART, M(L, 0, 0, 30), False, False),
    ("Olssen, Erik, 45, 64, 84      ", PSTART, M(L, 0, 0, 30), False, False),
    ("Olympic Games, 1924, 111, 144 ", PSTART, M(L, 0, 0, 30), False, False),
    ("Once on Chunuk Bair, 149      ", PSTART, M(L, 0, 0, 30), False, False),
    ("Once Were Warriors, xxxiii, 170", PSTART, M(L, 0, 0, 30), False, False),
    ("On-shore whaling, xvi         ", PSTART, M(L, 0, 0, 30), False, False),
    ("Opotiki, xix                  ", PSTART, M(L, 0, 0, 30), False, False),
    ("Orakau battle of, xviii, 57   ", PSTART, M(L, 0, 0, 30), False, False),
    ("O'Regan, Tipene, 170, 198-99  ", PSTART, M(L, 0, 0, 30), False, False),
    ("Organic agriculture, 177      ", PSTART, M(L, 0, 0, 30), False, False),
    ("Orwell, George, 151           ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago, xvii, 45, 49-50, 70    ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago block, xvii             ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago Daily Times, 67         ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago Girls' High School, xix, 61,", PSTART, M(L, 0, 0, 30), False, False),
    ("   85                         ", PCONT, None, False, False),
    ("Otago gold rushes, 61-63      ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago Peninsula, xx           ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otago Provincial Council, 68  ", PSTART, M(L, 0, 0, 30), False, False),
    ("Otaki, 33                     ", PSTART, M(L, 0, 0, 30), False, False),
    ("Owls Do Cry, 139              ", PSTART, M(L, 0, 0, 30), False, False),
]


def test_index_page():
    """IndexPageTest (paragraphs_test.cc kNewZealandIndex): every entry
    its own hanging-indent paragraph; wrapped page numbers continue."""
    evaluate(K_NZ_INDEX, *run_fixture(K_NZ_INDEX))


K_UNLV_REP3AO = [
    ("    Defined contribution plans cover employees in Australia, New", PSTART, M(L, 0, 50, 0), False, False),
    ("Zealand, Spain, the United Kingdom and some U.S. subsidiaries.  ", PCONT, None, False, False),
    ("In addition, employees in the U.S. are eligible to participate in    ", PCONT, None, False, False),
    ("defined contribution plans (Employee Savings Plans) by contribut-", PCONT, None, False, False),
    ("ing a portion of their compensation. The Company matches com- ", PCONT, None, False, False),
    ("pensation, depending on Company profit levels. Contributions    ", PCONT, None, False, False),
    ("charged to income for defined contribution plans were $92 in    ", PCONT, None, False, False),
    ("1993, $98 in 1992 and $89 in 1991.                             ", PCONT, None, False, False),
    ("     In addition to providing pension benefits, the Company pro- ", PSTART, M(L, 0, 50, 0), False, False),
    ("vides certain health care and life insurance benefits to retired     ", PCONT, None, False, False),
    ("employees. As discussed in Note A, the Company adopted FASB   ", PCONT, None, False, False),
    ("Statement No. 106 effective January 1, 1992. Previously, the     ", PCONT, None, False, False),
    ("Company recognized the cost of providing these benefits as the     ", PCONT, None, False, False),
    ("benefits were paid. These pretax costs amounted to $53 in 1991.   ", PCONT, None, False, False),
    ("The Company continues to fund most of the cost of these medical ", PCONT, None, False, False),
]


def test_unlv_insurance_page():
    """TestUnlvInsurance (paragraphs_test.cc kUnlvRep3AO, leading rows):
    5-space first-line-indent financial prose."""
    evaluate(K_UNLV_REP3AO, *run_fixture(K_UNLV_REP3AO))


K_OLD_MAN = [
    # NOTE (documented divergence): the reference truth marks row 0
    # crown=false although the text IS a mid-sentence continuation from
    # the previous page; this engine flags it crown=true (the flag's
    # stated meaning, matching kFewCluesWithCrown's identical shape).
    ("royal  palm  which  are called  guano  and  in it  there was a bed,  a", PSTART, M(L, 0, 50, 0), True, False),
    ("table, one chair, and a place on the dirt floor to cook with charcoal.", PCONT, None, False, False),
    ("On  the  brown  walls  of  the flattened,  overlapping  leaves  of  the", PCONT, None, False, False),
    ("sturdy  fibered guano  there  was  a  picture in  color of  the Sacred", PCONT, None, False, False),
    ("Heart  of  Jesus  and  another  of  the  Virgin  of Cobre.  These were", PCONT, None, False, False),
    ("relics of  his wife.   Once there had been  a tinted photograph of his", PCONT, None, False, False),
    ("wife on  the wall  but he  had taken  it  down because it made him too", PCONT, None, False, False),
    ("lonely to see it and it was on the shelf in the corner under his clean", PCONT, None, False, False),
    ("shirt.                                                                ", PCONT, None, False, False),
    ('     "What  do  you  have  to  eat?"     the  boy   asked.            ', PSTART, M(L, 0, 50, 0), False, False),
    ('     "A pot of yellow rice with fish. Do you want some?"              ', PSTART, M(L, 0, 50, 0), False, False),
    ('     "No. I will eat at home. Do you want me to make the fire?"       ', PSTART, M(L, 0, 50, 0), False, False),
    ('     "No. I will make it later on. Or I may eat the rice cold."       ', PSTART, M(L, 0, 50, 0), False, False),
    ('     "May I take the cast net?"                                       ', PSTART, M(L, 0, 50, 0), False, False),
    ('     "Of course."                                                     ', PSTART, M(L, 0, 50, 0), False, False),
    ("     There was  no  cast net  and  the boy  remembered  when  they had", PSTART, M(L, 0, 50, 0), False, False),
    ("sold it.   But they went through  this fiction every day. There was no", PCONT, None, False, False),
    ("pot of yellow rice and fish and the boy knew this too.                ", PCONT, None, False, False),
]


def test_old_man_and_sea_block_quotes():
    """NotOverlyAggressiveWithBlockQuotes (kOldManAndSea, leading rows):
    book prose with 5-space indents and consecutive one-line dialogue
    paragraphs."""
    evaluate(K_OLD_MAN, *run_fixture(K_OLD_MAN))


K_SOURCE_CODE = [
    ("  A typical page of a programming book may contain", PSTART, M(L, 0, 20, 0), False, False),
    ("examples of source code to exemplify an algorithm ", PCONT, None, False, False),
    ("being described in prose.  Such examples should be", PCONT, None, False, False),
    ("rendered as lineated text, meaning text with      ", PCONT, None, False, False),
    ("explicit line breaks but without extra inter-line ", PCONT, None, False, False),
    ("spacing.  Accidentally finding stray paragraphs in", PCONT, None, False, False),
    ("source code would lead to a bad reading experience", PCONT, None, False, False),
    ("when the text is re-flowed.                       ", PCONT, None, False, False),
    ("  Let's show this by describing the function fact-", PSTART, M(L, 0, 20, 0), False, False),
    ("orial.  Factorial is a simple recursive function  ", PCONT, None, False, False),
    ("which grows very quickly.  So quickly, in fact,   ", PCONT, None, False, False),
    ("that the typical C implementation will only work  ", PCONT, None, False, False),
    ("for values less than about 12:                    ", PCONT, None, False, False),
    ("                                                  ", PNONE, None, False, False),
    ("  # Naive implementation in C                     ", PCONT, None, False, False),
    ("  int factorial(int n) {                          ", PCONT, None, False, False),
    ("    if (n < 2)                                    ", PCONT, None, False, False),
    ("      return 1;                                   ", PCONT, None, False, False),
    ("    return  n * factorial(n - 1);                 ", PCONT, None, False, False),
    ("  }                                               ", PCONT, None, False, False),
    ("                                                  ", PNONE, None, False, False),
    ("  The C programming language does not have built- ", PSTART, M(L, 0, 20, 0), False, False),
    ("in support for detecting integer overflow, so this", PCONT, None, False, False),
    ("naive implementation simply returns random values ", PCONT, None, False, False),
    ("if even a moderate sized n is provided.           ", PCONT, None, False, False),
]


def test_not_distracted_by_source_code():
    """NotDistractedBySourceCode (paragraphs_test.cc): lineated source
    code (no idea-starting words) never spawns stray paragraphs and
    blanks interior to the listing do not split it (the reference truth
    marks the blanks' owners only by pointer adjacency; here they are
    PNONE and the comparison is PNONE-transparent)."""
    evaluate(K_SOURCE_CODE, *run_fixture(K_SOURCE_CODE))
