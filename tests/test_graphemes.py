"""Validator parity — mirrors unittest/normstrngs_test.cc grapheme cases
and the validate_* script rules the reference tests via its validator
fixtures."""

import pytest

from tesseract_spark.functions.graphemes import (
    COMBINED,
    DEVANAGARI,
    GLYPH_SPLIT,
    INDIVIDUAL,
    MALAYALAM,
    NONVIRAMA,
    most_frequent_virama_script,
    normalize_clean_and_segment,
    validate_text,
)

# normstrngs_test.cc:85-88
ENG = "the quick brown fox jumps over the lazy dog"
HIN = "पिताने विवाह की | हो गई उद्विग्न वह सोचा"
KOR = "이는 것으로"
BAD_HIN = ["उपयोक्ताो", "नहीें", "प्रंात", "कहीअे", "पत्रिाका", "छह्णाीस"]
BAD_THAI = ["ฤิ", "กา้ํ", "กิำ", "นำ้", "เเก"]


def test_detects_correct_text():
    # normstrngs_test.cc:90 DetectsCorrectText
    assert validate_text(ENG, u_mode="nfkc")
    assert validate_text(HIN, u_mode="nfkc")
    assert validate_text(KOR, u_mode="nfkc")


@pytest.mark.parametrize("w", BAD_HIN)
def test_detects_incorrect_hindi(w):
    # normstrngs_test.cc:106 DetectsIncorrectText
    assert not validate_text(w, u_mode="nfkc")


@pytest.mark.parametrize("w", BAD_THAI)
def test_detects_incorrect_thai(w):
    assert not validate_text(w, u_mode="nfkc")


def test_non_indic_doesnt_break_indic_rules():
    # normstrngs_test.cc:117
    assert validate_text("Here's some latin text.")


def test_no_lonely_joiners():
    # normstrngs_test.cc:127 — x ZWJ ആ ഴ ം: joiner dropped, 3 graphemes
    ok, g = normalize_clean_and_segment("x‍ആഴം", g_mode=COMBINED)
    assert ok and g == ["x", "ആ", "ഴം"]


def test_no_lonely_joiners_plus():
    # normstrngs_test.cc:140 — പ ZWJ + പ ോ: joiner dropped
    ok, g = normalize_clean_and_segment("പ‍+പോ", g_mode=COMBINED)
    assert ok and g == ["പ", "+", "പോ"]


def test_no_lonely_joiners_nonalpha():
    # normstrngs_test.cc:153 — letterless joiners strip to "+"; without
    # the plus the string validates to empty = invalid
    ok, g = normalize_clean_and_segment("‍+‌‍", g_mode=COMBINED)
    assert ok and g == ["+"]
    assert not validate_text("‍‌‍")


def test_joiners_stay_in_arabic():
    # normstrngs_test.cc:166 — 5 unicodes / 5 glyphs / 2 graphemes,
    # string unchanged
    s = "ب‌ب‍ب"
    for mode, n in ((INDIVIDUAL, 5), (GLYPH_SPLIT, 5), (COMBINED, 2)):
        ok, g = normalize_clean_and_segment(s, g_mode=mode)
        assert ok and len(g) == n and "".join(g) == s


def test_digit_and_danda_ok():
    # normstrngs_test.cc:172-180 DigitOK / DandaOK — single units, and
    # danda (script=Common) must not trigger the Indic validator
    for s in ["೪", "।", "॥"]:
        ok, g = normalize_clean_and_segment(s, g_mode=COMBINED)
        assert ok and len(g) == 1 and g[0] == s


def test_script_routing():
    # validator.cpp:135-165 MostFrequentViramaScript
    assert most_frequent_virama_script([ord(c) for c in HIN]) == DEVANAGARI
    assert most_frequent_virama_script([ord(c) for c in "ആഴം"]) == MALAYALAM
    assert most_frequent_virama_script([ord(c) for c in ENG]) == NONVIRAMA
    # Thai is inside the numeric Indic range but not a virama script
    assert most_frequent_virama_script([ord(c) for c in "ฤิ"]) == NONVIRAMA
    # danda alone doesn't vote
    assert most_frequent_virama_script([0x964]) == NONVIRAMA


def test_devanagari_conjunct_segmentation():
    # consonant cluster with virama stays one grapheme: उद्विग्न from the
    # reference's own valid Hindi sample
    ok, g = normalize_clean_and_segment("उद्विग्न", g_mode=COMBINED)
    assert ok
    assert "".join(g) == "उद्विग्न"
    # उ | द्वि | ग्न — conjuncts bind across the virama
    assert len(g) == 3


def test_explicit_virama_gets_zwnj():
    # validate_indic.cpp:188-197 — an unterminated explicit virama is
    # normalized by appending ZWNJ for consistency
    ok, g = normalize_clean_and_segment("क्", g_mode=COMBINED)
    assert ok
    assert "".join(g) == "क्‌"  # trailing ZWNJ added


# --- Khmer (validate_khmer.cpp via validate_khmer_test.cc fixtures) ---

KHMER_GOOD = [
    ("ព័ត៏មានប្លែកៗ", (13, 12, 7)),
    ("ទំនុកច្រៀង", (10, 9, 5)),
    ("កាលីហ្វូញ៉ា", (11, 10, 4)),
    ("ចាប់ពីផ្លូវ", (11, 10, 5)),
]
# multiple dependent vowels / shifters / signs are not allowed
KHMER_BAD = ["ពាិ", "ម៉៊", "កា់៍"]

MYANMAR_GOOD = [
    ("လျှာကသိသည် ", (11, 11, 5)),  # no viramas in this one
    ("တုန္လႈပ္မႈ ", (11, 9, 4)),
]
MYANMAR_BAD = ["က်န္းမာေရး", "ခုႏွစ္"]


def _mode_counts(s):
    out = []
    for m in (INDIVIDUAL, GLYPH_SPLIT, COMBINED):
        ok, g = normalize_clean_and_segment(s, g_mode=m)
        assert ok and "".join(g) == s, (m, s, g)
        out.append(len(g))
    return tuple(out)


@pytest.mark.parametrize("s,counts", KHMER_GOOD)
def test_good_khmer_words(s, counts):
    # validate_khmer_test.cc:19-28 GoodKhmerWords — exact per-mode counts
    assert _mode_counts(s) == counts


@pytest.mark.parametrize("s", KHMER_BAD)
def test_bad_khmer_words(s):
    # validate_khmer_test.cc:31-45 BadKhmerWords
    assert not validate_text(s)


@pytest.mark.parametrize("s,counts", MYANMAR_GOOD)
def test_good_myanmar_words(s, counts):
    # validate_myanmar_test.cc:19-24 GoodMyanmarWords — exact counts
    assert _mode_counts(s) == counts


@pytest.mark.parametrize("s", MYANMAR_BAD)
def test_bad_myanmar_words(s):
    # validate_myanmar_test.cc:27-50 BadMyanmarWords (dotted circles)
    assert not validate_text(s)


# --- Javanese (validate_javanese.cpp; no reference unittest exists —
# vectors from the unicode standard examples cited in its comments) ---

def test_javanese_conjunct_and_taling_tarung():
    # ka + pangkon + ka is one aksara (combined), half-form split in
    # glyph mode (validate_javanese.cpp:109-140)
    ok, g = normalize_clean_and_segment("ꦏ꧀ꦏ", g_mode=COMBINED)
    assert ok and g == ["ꦏ꧀ꦏ"]
    ok, g = normalize_clean_and_segment("ꦏ꧀ꦏ", g_mode=GLYPH_SPLIT)
    assert ok and len(g) == 2
    # taling + tarung two-part vowel groups (validate_javanese.cpp:
    # 220-229 "Taling + Tarung is valid eg. ꦏ + ◌ꦺ + ◌ꦴ")
    ok, g = normalize_clean_and_segment("ꦏꦺꦴ", g_mode=COMBINED)
    assert ok and g == ["ꦏ", "ꦺꦴ"]


def test_javanese_bad_starts():
    # a grapheme may not start with pangkon (virama) or a vowel modifier
    assert not validate_text("꧀ꦏ")
    assert not validate_text("ꦀꦏ")


# ---------------------------------------------------------------------------
# validate_grapheme_test.cc parity: the reference's own grapheme
# segmentation fixtures, byte-for-byte (Apache-2.0 public test content)


@pytest.mark.parametrize(
    "name,s,combined",
    [
        # MultipleSyllablesAreNotASingleGrapheme: KA depI KA indE -> 3
        ("multi_syllable", "కికఎ",
         ["కి", "క", "ఎ"]),
        ("single_consonant", "ಹ", ["ಹ"]),
        ("simple_cv", "ಹಿ", ["ಹಿ"]),
        ("subscript_conjunct", "ಹ್ಕಿ",
         ["ಹ್ಕಿ"]),
        ("half_form_joiner", "ക്‍ത",
         ["ക്‍ത"]),
        ("traditional_conjunct_joiner", "ക‍്ത",
         ["ക‍്ത"]),
        ("open_conjunct_nonjoiner", "ക‌്ത",
         ["ക‌്ത"]),
        ("explicit_virama_nonjoiner", "ക്‌ത",
         ["ക്‌", "ത"]),
        ("thai_combined", "ดุ๊", ["ดุ๊"]),
    ],
)
def test_reference_grapheme_fixture_combined(name, s, combined):
    from tesseract_spark.functions.graphemes import (
        COMBINED,
        normalize_clean_and_segment,
    )

    ok, glyphs = normalize_clean_and_segment(s, g_mode=COMBINED)
    assert ok and glyphs == combined, (name, glyphs)


@pytest.mark.parametrize(
    "name,s,n,idx,val",
    [
        ("subscript_conjunct", "ಹ್ಕಿ", 3, 1,
         "್ಕ"),
        ("half_form_joiner", "ക്‍ത", 2, 0,
         "ക്‍"),
        ("traditional_conjunct_joiner", "ക‍്ത", 3, 1,
         "‍്"),
        ("open_conjunct_nonjoiner", "ക‌്ത", 3, 1,
         "‌്"),
        ("explicit_virama_nonjoiner", "ക്‌ത", 3, 1,
         "്‌"),
        ("thai_glyphsplit", "ดุ๊", 3, 0, "ด"),
    ],
)
def test_reference_grapheme_fixture_glyphsplit(name, s, n, idx, val):
    from tesseract_spark.functions.graphemes import (
        GLYPH_SPLIT,
        normalize_clean_and_segment,
    )

    ok, glyphs = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(glyphs) == n and glyphs[idx] == val, (name, glyphs)


def test_reference_grapheme_malayalam_only_form_rejected_in_telugu():
    """OpenConjunctNonJoiner's negative half: KA ZWNJ Virama Ta is
    Malayalam-only — the same shape in Telugu codepoints must FAIL."""
    from tesseract_spark.functions.graphemes import (
        COMBINED,
        normalize_clean_and_segment,
    )

    ok, _ = normalize_clean_and_segment(
        "క‌్త", g_mode=COMBINED
    )
    assert not ok
