"""The wordrec language model: dictionary-adjusted word choice
(dict.cpp Dict::adjust_word:711-792, context.cpp case_ok:28-64,
language_model.cpp ComputeAdjustedPathCost) and its wiring into the
legacy chop path."""

import numpy as np
import pytest

from tesseract_spark.functions.fonts import KERN, get_font
from tesseract_spark.lstm.dawg import Dawg
from tesseract_spark.lstm.intproto import get_static_classifier
from tesseract_spark.lstm.langmodel import (
    FREQ_DAWG_PERM,
    NO_PERM,
    NUMBER_PERM,
    PENALTY_DICT_CASE_OK,
    PENALTY_DICT_NONWORD,
    SYSTEM_DAWG_PERM,
    TOP_CHOICE_PERM,
    K_RATING_PAD,
    adjust_word,
    case_ok,
    choose_segmentation,
    valid_punctuation,
)
from tesseract_spark.operators.legacy import decode_strip_legacy


# --- case_ok: the 6x4 case state machine (context.cpp:28-64) ---

@pytest.mark.parametrize(
    "word,ok",
    [
        ("hello", True),
        ("Hello", True),
        ("HELLO", True),
        ("hELLO", False),  # lower -> upper is the -1 transition
        ("HeLLo", False),
        ("h", False),  # single lower ends in state 5
        ("H", True),
        ("1234", True),
        ("A1", True),
        ("a1", False),  # state 5 -> digit is -1
        ("Ab3", False),  # lower -> digit is -1 too
        ("3a", False),  # digit -> lower is -1
    ],
)
def test_case_ok(word, ok):
    assert case_ok(word) is ok


def test_valid_punctuation():
    assert valid_punctuation("word.")
    assert valid_punctuation("(word)")
    assert valid_punctuation('"word"')
    assert valid_punctuation("word,")
    assert not valid_punctuation("wo rd")
    assert not valid_punctuation("word-.-")


# --- adjust_word arithmetic (dict.cpp:711-792) ---

def _dawg(words):
    from tesseract_spark.lstm.templates import get_net

    return Dawg(get_net().charset, words)


def test_adjust_dict_word_case_ok():
    d = _dawg(["clam"])
    a = adjust_word("clam", 0.30, dawg=d)
    assert a.permuter == SYSTEM_DAWG_PERM
    assert a.adjust_factor == PENALTY_DICT_CASE_OK
    assert a.adjusted == pytest.approx(
        (0.30 + K_RATING_PAD) * PENALTY_DICT_CASE_OK - K_RATING_PAD
    )


def test_adjust_nonword_and_garbage():
    a = adjust_word("zorp", 0.30)
    assert a.permuter == TOP_CHOICE_PERM
    assert a.adjust_factor == PENALTY_DICT_NONWORD
    g = adjust_word("zO@p!x", 0.30)
    assert g.permuter == NO_PERM
    assert g.adjust_factor == pytest.approx(1.5)
    assert g.adjusted > a.adjusted


def test_adjust_number_and_freq():
    n = adjust_word("1944", 0.30)
    assert n.permuter == NUMBER_PERM
    f = adjust_word("the", 0.30, dawg=_dawg(["the"]), freq_words={"the"})
    assert f.permuter == FREQ_DAWG_PERM
    assert f.adjusted == pytest.approx(0.30)  # factor 1.0 is a no-op


def test_interior_punct_rates_garbage():
    # 'foo.bar' collapses to the pattern '*.*', which the punc-pattern
    # probe rejects: garbage factor 1.5, NO_PERM (dict.cpp:716,757)
    a = adjust_word("foo.bar", 0.30)
    assert a.permuter == NO_PERM
    assert a.adjust_factor == pytest.approx(1.5)


def test_trailing_punct_keeps_dict_status():
    a = adjust_word("clam.", 0.30, dawg=_dawg(["clam"]))
    assert a.permuter == SYSTEM_DAWG_PERM


def test_choose_segmentation_prefers_dict_word():
    # modem reads cheaper raw, but modern is in the dictionary: the
    # adjusted rating flips the choice (the fused-rn election)
    # the flip margin: (r_non + pad)(1.25 - 1.1)/1.1 ~ 0.068 extra raw
    # cost is repaid by the dictionary at r_non = 0.30
    d = _dawg(["modern"])
    c = choose_segmentation([("modem", 0.30), ("modern", 0.36)], dawg=d)
    assert c.text == "modern"
    assert c.permuter == SYSTEM_DAWG_PERM
    # without the dictionary the raw rating stands
    c2 = choose_segmentation([("modem", 0.30), ("modern", 0.36)])
    assert c2.text == "modem"


def test_dict_preference_is_bounded():
    # a dictionary word does NOT win at any cost: past the penalty
    # margin the better-rated nonword keeps the choice
    d = _dawg(["modern"])
    c = choose_segmentation([("modem", 0.05), ("modern", 0.80)], dawg=d)
    assert c.text == "modem"


# --- the legacy chop path election (fused rn vs m) ---

def _fused_rn_strip(prefix: str, suffix: str) -> np.ndarray:
    font = get_font()
    cells = []
    for ch in prefix:
        cells.append(font[ch].astype(bool))
        cells.append(np.zeros((cells[-1].shape[0], KERN), dtype=bool))
    r, n = font["r"].astype(bool), font["n"].astype(bool)
    fused = np.concatenate([r, n], axis=1)
    fused[8, r.shape[1] - 1 : r.shape[1] + 1] = True
    cells.append(fused)
    for ch in suffix:
        cells.append(np.zeros((fused.shape[0], KERN), dtype=bool))
        cells.append(font[ch].astype(bool))
    return np.concatenate(cells, axis=1)


def test_legacy_decode_dict_resolves_fused_word():
    # 'mode' + fused 'rn': the chop path reads the letters either way;
    # the language model must elect the dictionary word
    strip = _fused_rn_strip("mode", "")
    d = _dawg(["modern"])
    details: list = []
    out = decode_strip_legacy(strip, dawg=d, details=details)
    assert out == "modern"
    assert details[0].permuter == SYSTEM_DAWG_PERM
    # without a dictionary the plain chop path still decodes the run
    # (the joined-glyph guarantee of test_legacy stands)
    assert decode_strip_legacy(strip) in ("modern", "modem")


def test_blob_choice_arbitration():
    # ranked BLOB_CHOICEs in the lattice: a damaged 'c' classifies ';'
    # first with 'c' as runner-up inside K_CHOICE_MARGIN; the plain
    # path keeps ';' (rating is acceptable, no chop retry) but inside
    # the dictionary word the adjusted rating elects 'c'
    font = get_font()
    c = font["c"].astype(bool).copy()
    for y, x in ((8, 4), (8, 6), (11, 4)):
        c[y, x] = False
    clf = get_static_classifier()
    ranked = clf.classify(c)
    assert ranked[0][0] == ";" and ranked[1][0] == "c"
    cells = [c]
    for ch in "at":
        cells.append(np.zeros((c.shape[0], KERN), dtype=bool))
        cells.append(font[ch].astype(bool))
    strip = np.concatenate(cells, axis=1)
    assert decode_strip_legacy(strip) == ";at"
    details: list = []
    out = decode_strip_legacy(strip, dawg=_dawg(["cat"]), details=details)
    assert out == "cat"
    assert details[0].permuter == SYSTEM_DAWG_PERM


def test_legacy_decode_details_permuters():
    font = get_font()
    cells = []
    for i, ch in enumerate("to"):
        if i:
            cells.append(np.zeros((font[ch].shape[0], KERN), dtype=bool))
        cells.append(font[ch].astype(bool))
    strip = np.concatenate(cells, axis=1)
    details: list = []
    out = decode_strip_legacy(strip, dawg=_dawg(["to"]), details=details)
    assert out == "to"
    assert [d.permuter for d in details] == [SYSTEM_DAWG_PERM]


def test_word_sink_carries_permuter(tmp_path):
    # the WERD_CHOICE permuter column reaches the word surface
    from tesseract_spark.operators.recognize import recognize_page_detail
    from tesseract_spark.functions.compose import PageSpec, compose_page

    spec = PageSpec(paragraphs=[["the cat sat 42"]])
    page = compose_page(spec)
    d = _dawg(["the", "cat", "sat"])
    _spans, words, _layout = recognize_page_detail(page.image, spec.dpi, d)
    by_text = {w.text: w.permuter for w in words}
    assert by_text["the"] == SYSTEM_DAWG_PERM
    assert by_text["cat"] == SYSTEM_DAWG_PERM
    assert by_text["42"] == NUMBER_PERM
    # without a dictionary: numbers keep NUMBER, words fall to top_choice
    _spans, words, _layout = recognize_page_detail(page.image, spec.dpi)
    by_text = {w.text: w.permuter for w in words}
    assert by_text["the"] == TOP_CHOICE_PERM
    assert by_text["42"] == NUMBER_PERM


# --- ParamsModel (params_model.cpp / params_training_featdef.h) ---

def test_params_model_roundtrip_and_rejection():
    from tesseract_spark.lstm.langmodel import FEATURE_NAMES, ParamsModel

    w = [0.01 * i for i in range(len(FEATURE_NAMES))]
    m = ParamsModel(w)
    assert m.initialized
    m2 = ParamsModel.loads(m.dumps())
    assert m2.weights == pytest.approx(w)
    # a file missing any feature leaves the model uninitialized
    # (LoadFromFp's completeness gate)
    lines = m.dumps().splitlines()
    m3 = ParamsModel.loads("\n".join(lines[:-1]))
    assert not m3.initialized


def test_params_model_features_and_cost():
    from tesseract_spark.lstm.langmodel import (
        FEATURE_NAMES,
        ParamsModel,
        extract_features,
    )

    d = _dawg(["modern"])
    dict_choice = adjust_word("modern", 0.30, dawg=d)
    feats = extract_features(dict_choice)
    # 6-char dict word: PTRAIN_DICT_MED one-hot + rating per char
    assert feats[FEATURE_NAMES.index("PTRAIN_DICT_MED")] == 1.0
    assert feats[FEATURE_NAMES.index("PTRAIN_RATING_PER_CHAR")] == (
        pytest.approx(0.05)
    )
    num = extract_features(adjust_word("1944", 0.0))
    assert num[FEATURE_NAMES.index("PTRAIN_DIGITS_MED")] == 1.0
    bad = extract_features(adjust_word("hELLo", 0.0))
    assert bad[FEATURE_NAMES.index("PTRAIN_NUM_BAD_CASE")] >= 1.0


def test_params_model_branch_overrides_heuristic():
    # ComputeAdjustedPathCost's trained branch: a model that charges
    # only the rating ranks candidates by raw rating, undoing the
    # heuristic dictionary preference
    from tesseract_spark.lstm.langmodel import FEATURE_NAMES, ParamsModel

    w = [0.0] * len(FEATURE_NAMES)
    w[FEATURE_NAMES.index("PTRAIN_RATING_PER_CHAR")] = 1.0
    m = ParamsModel(w)
    d = _dawg(["modern"])
    c = choose_segmentation(
        [("modem", 0.30), ("modern", 0.36)], dawg=d, params_model=m
    )
    assert c.text == "modem"
    # while a model that rewards dict words keeps the dictionary choice
    w2 = list(w)
    w2[FEATURE_NAMES.index("PTRAIN_DICT_MED")] = -1.0
    c2 = choose_segmentation(
        [("modem", 0.30), ("modern", 0.36)], dawg=d,
        params_model=ParamsModel(w2),
    )
    assert c2.text == "modern"


def test_word_rating_certainty_columns():
    # ratngs.h:84-88 semantics on the word surface: clean decodes rate
    # near zero cost with certainty near 0; rating accumulates with
    # length; certainty is the worst-case symbol bound
    from tesseract_spark.operators.recognize import recognize_page_detail
    from tesseract_spark.functions.compose import PageSpec, compose_page

    spec = PageSpec(paragraphs=[["the dictionary words here"]])
    page = compose_page(spec)
    _s, words, _l = recognize_page_detail(page.image, spec.dpi)
    for w in words:
        assert w.rating >= 0.0
        assert -20.0 <= w.certainty <= 0.0
    by_text = {w.text: w for w in words}
    assert by_text["dictionary"].rating >= by_text["the"].rating


# --- DocumentWords (Dict::add_document_word, dict.cpp:648-708) ---

def test_document_words_promotion_rules():
    from tesseract_spark.lstm.langmodel import DocumentWords

    dw = DocumentWords()
    # confident long word joins directly
    dw.add("zyxwv", -1.0)
    assert dw.accepts("zyxwv")
    # dictionary-valid words never join
    dw.add("plain", -1.0, is_valid=True)
    assert not dw.accepts("plain")
    # weak sighting pends, second sighting promotes
    dw.add("qqword", -7.0)
    assert not dw.accepts("qqword")  # pending, not yet promoted
    dw.add("qqword", -7.0)
    assert dw.accepts("qqword")  # second sighting promotes
    # below the pending bar: dropped entirely
    dw.add("zzword", -9.0)
    dw.add("zzword", -9.0)
    assert not dw.accepts("zzword")
    dw.add("okword", 0.0)
    assert dw.accepts("okword")  # direct (cert >= threshold, len > 2)
    # 2-char words pend even when confident; upper-pair only
    dw.add("Xq", 0.0)
    assert not dw.accepts("Xq")
    dw.add("XQ", 0.0)
    assert not dw.accepts("XQ")
    dw.add("XQ", 0.0)  # second sighting promotes
    assert dw.accepts("XQ")
    # repeated-char runs never qualify
    dw.add("aaaab", 0.0)
    assert not dw.accepts("aaaab")


def test_doc_dawg_permuter_attribution():
    from tesseract_spark.lstm.langmodel import DOC_DAWG_PERM, DocumentWords

    dw = DocumentWords()
    dw.add("kwyjibo", -1.0)
    a = adjust_word("kwyjibo", 0.3, doc_words=dw)
    assert a.permuter == DOC_DAWG_PERM
    assert a.adjust_factor == PENALTY_DICT_CASE_OK


def test_doc_words_learned_across_page(tmp_path):
    # the same non-dictionary term twice on one page: first sighting
    # attributes top_choice and learns it, second attributes doc_dawg
    from tesseract_spark.lstm.langmodel import DOC_DAWG_PERM, DocumentWords
    from tesseract_spark.operators.recognize import recognize_page_detail
    from tesseract_spark.functions.compose import PageSpec, compose_page

    spec = PageSpec(paragraphs=[["kwyjibo first here", "kwyjibo again now"]])
    page = compose_page(spec)
    dw = DocumentWords()
    d = _dawg(["first", "here", "again", "now"])
    _s, words, _l = recognize_page_detail(
        page.image, spec.dpi, d, doc_words=dw
    )
    perms = [w.permuter for w in words if w.text == "kwyjibo"]
    assert perms == [TOP_CHOICE_PERM, DOC_DAWG_PERM]


def test_ocr_words_wordlist_attribution(spark):
    # the production word surface carries real dictionary attribution
    # when ocr_words runs with a wordlist (review finding: without
    # this, system_dawg was structurally unreachable in production)
    import pyspark.sql.functions as F

    from tesseract_spark.fixtures import build_corpus
    from tesseract_spark.operators.sinks import ocr_words

    paths = build_corpus("/tmp/lm_corpus", n_docs=4)
    docs = spark.read.parquet(paths["documents"])
    media = spark.read.parquet(paths["media"])
    # the fixture corpus vocabulary
    vocab = sorted(
        {
            w
            for r in docs.select("spans").collect()
            for s_ in r["spans"]
            if s_["kind"] == "text" and s_["text"]
            for w in s_["text"].split()
            if w.isalpha()
        }
    )
    words = ocr_words(spark, docs, media, wordlist=vocab)
    perms = {
        r["permuter"]: r["count"]
        for r in words.groupBy("permuter").count().collect()
    }
    assert perms.get("system_dawg", 0) > 0


# --- Stopper: AcceptableChoice (stopper.cpp:42-108) ---

def test_acceptable_choice_thresholds():
    from tesseract_spark.lstm.langmodel import (
        STOPPER_NONDICT_CERTAINTY_BASE,
        acceptable_choice,
    )

    # nonword: base threshold only
    assert acceptable_choice("zorp", -6.0, TOP_CHOICE_PERM)
    assert not acceptable_choice(
        "zorp", STOPPER_NONDICT_CERTAINTY_BASE - 0.1, TOP_CHOICE_PERM
    )
    # dict word: per-char relief lowers the bar for longer alpha runs
    assert acceptable_choice("dictionary", -11.0, SYSTEM_DAWG_PERM)
    assert not acceptable_choice("zzz", -11.0, TOP_CHOICE_PERM)
    # dangerous ambiguity always blocks
    assert not acceptable_choice(
        "fine", -1.0, SYSTEM_DAWG_PERM, dangerous_ambig=True
    )


def test_uniform_certainties():
    from tesseract_spark.lstm.langmodel import uniform_certainties

    # uniform word: accept
    assert uniform_certainties([-4.0, -4.1, -3.9, -4.0], -4.0)
    # one catastrophic char drags the word certainty far below the
    # remaining chars' band: reject (stopper.cpp:464-505)
    assert not uniform_certainties([-4.0, -4.0, -4.0, -19.0], -19.0)
    # short words always pass
    assert uniform_certainties([-19.0, -19.0], -19.0)


def test_stopper_extends_pass2_retry():
    # a damaged glyph decodes with low certainty but drops no ink: the
    # stopper (not the ink check) must route the row into pass 2 where
    # the adapted templates recover it — asserted indirectly: clean
    # pages decode identically with and without the stopper trigger
    from tesseract_spark.operators.recognize import recognize_page_detail
    from tesseract_spark.functions.compose import PageSpec, compose_page

    spec = PageSpec(paragraphs=[["the quick brown fox"]])
    page = compose_page(spec)
    d = _dawg(["the", "quick", "brown", "fox"])
    _s, words, _l = recognize_page_detail(page.image, spec.dpi, d)
    assert [w.text for w in words] == ["the", "quick", "brown", "fox"]


def test_dangerous_ambig_veto():
    from tesseract_spark.functions.ambigs import has_dangerous_ambig

    d = _dawg(["modern", "woman"])
    # 'modem' is one rn->m substitution from dict 'modern'
    assert has_dangerous_ambig("modem", d)
    # 'wornan' is one rn->m from 'woman' (reverse direction too)
    assert has_dangerous_ambig("wornan", d)
    assert not has_dangerous_ambig("plainly", d)


def test_number_patterns_and_compounds():
    from tesseract_spark.lstm.langmodel import COMPOUND_PERM

    # the number dawg's pattern shape: separators inside digits
    assert adjust_word("3.14", 0.1).permuter == NUMBER_PERM
    assert adjust_word("12,000", 0.1).permuter == NUMBER_PERM
    assert adjust_word("1.a", 0.1).permuter == NO_PERM
    # hyphen/slash compounds of dictionary parts keep COMPOUND_PERM
    d = _dawg(["mother", "in", "law", "and", "or"])
    a = adjust_word("mother-in-law", 0.1, dawg=d)
    assert a.permuter == COMPOUND_PERM
    assert a.adjust_factor == PENALTY_DICT_CASE_OK
    assert adjust_word("and/or", 0.1, dawg=d).permuter == COMPOUND_PERM
    # a compound with a non-dict part is not a compound
    assert adjust_word("mother-in-lax", 0.1, dawg=d).permuter == NO_PERM
