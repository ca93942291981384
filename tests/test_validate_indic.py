"""Indic validator parity — unittest/validate_indic_test.cc ported
verbatim onto graphemes.normalize_clean_and_segment (Telugu/Malayalam/
Bengali/Kannada terminal-virama + modifier rules, and the Sinhala
rakaransaya/yansaya/repaya specials).  Fixtures kept as \\u escapes,
byte-for-byte the reference's."""

from tesseract_spark.functions.graphemes import (
    COMBINED,
    GLYPH_SPLIT,
    INDIVIDUAL,
    SINGLE_STRING,
    normalize_clean_and_segment,
)


def norm(s: str):
    """NormalizeUTF8String with GraphemeNorm::kNormalize: (ok, dest)."""
    ok, gl = normalize_clean_and_segment(s, g_mode=SINGLE_STRING)
    return ok and bool(gl and gl[0]), (gl[0] if gl else "")


def expect_grapheme_mode_results(
    s: str, unicode_count: int, glyph_count: int, grapheme_count: int,
    target: str,
):
    """normstrngs_test.h ExpectGraphemeModeResults."""
    ok, gl = normalize_clean_and_segment(s, g_mode=INDIVIDUAL)
    assert ok and len(gl) == unicode_count, gl
    assert "".join(gl) == target
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == glyph_count, gl
    assert "".join(gl) == target
    ok, gl = normalize_clean_and_segment(s, g_mode=COMBINED)
    assert ok and len(gl) == grapheme_count, gl
    assert "".join(gl) == target
    ok, gl = normalize_clean_and_segment(s, g_mode=SINGLE_STRING)
    assert ok and len(gl) == 1 and gl[0] == target
    ok, dest = norm(s)
    assert ok and dest == target


def test_adds_joiner_to_terminal_virama():
    # validate_indic_test.cc:28-35 (Telugu KA+virama)
    s = "క్"
    target = "క్‌"
    expect_grapheme_mode_results(s, 3, 2, 1, target)
    expect_grapheme_mode_results(target, 3, 2, 1, target)


def test_only_one_dependent_vowel():
    # validate_indic_test.cc:38-44 (Malayalam KA AA UU)
    assert norm("കാൂ")[0] is False


def test_only_one_vowel_modifier():
    # validate_indic_test.cc:54-71
    ok, dest = norm("ద్ఁ")  # DA virama candrabindu
    assert ok and dest == "ద్‌ఁ"
    # Bengali KA visarga candrabindu: two modifiers
    assert norm("কঃঁ")[0] is False
    # exception: Malayalam allows multiple anusvara
    ok, dest = norm("കംം")
    assert ok and dest == "കംം"


def test_vowel_modifier_must_be_last():
    # validate_indic_test.cc:80-92 (Telugu NA Sunna I)
    assert norm("నంి")[0] is False
    ok, dest = norm("నిం")  # NA I Sunna
    assert ok and dest == "నిం"


def test_matras_follow_consonants_not_vowels():
    # validate_indic_test.cc:102-116 (Telugu A+EE invalid, NYA+AA ok)
    assert norm("అే")[0] is False
    ok, dest = norm("ఞా")
    assert ok and dest == "ఞా"


def test_sub_graphemes_without_validation():
    # validate_indic_test.cc:119-130: a lone matra fails validation but
    # passes with GraphemeNorm::kNone (pure unicode normalization)
    from tesseract_spark.functions.textnorm import normalize_text

    assert norm("ാ")[0] is False
    assert normalize_text("ാ", u_mode="nfc") == "ാ"


def test_nukta():
    # validate_indic_test.cc:132-144 (Kannada KA Nukta Virama HA)
    s = "ಕ಼್ಹ"
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 3
    assert gl[2] == "್ಹ"
    # swapped Nukta and Virama: NFC normalization repairs the order
    expect_grapheme_mode_results("ಕ಼್ಹ", 4, 3, 1, s)


def test_sinhala_rakaransaya():
    # validate_indic_test.cc:147-165 (KA Virama ZWJ Rayanna)
    s = "ක්‍ර"
    ok, dest = norm(s)
    assert ok and dest == s
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 2
    assert gl[1] == "්‍ර"
    # can be followed by a dependent vowel
    ok, dest = norm(s + "ෙ")
    assert ok and dest == s + "ෙ"


def test_sinhala_yansaya():
    # validate_indic_test.cc:167-186 (KA Virama ZWJ Yayanna [+ OO])
    s = "ක්‍ය"
    ok, dest = norm(s)
    assert ok and dest == s
    s += "ෝ"
    ok, dest = norm(s)
    assert ok and dest == s
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 3
    assert gl[1] == "්‍ය"


def test_sinhala_repaya():
    # validate_indic_test.cc:188-201 (KA Rayanna Virama ZWJ MA)
    s = "කර්‍ම"
    ok, gl = normalize_clean_and_segment(s, g_mode=COMBINED)
    assert ok and len(gl) == 2
    assert gl[1] == "ර්‍ම"
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 3
    assert gl[1] == "ර්‍"


def test_sinhala_specials():
    # validate_indic_test.cc:203-222
    s = "වග්‍ර්‍ර්‍"
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 5, gl
    assert gl == [
        "ව",
        "ග",
        "්‍ර",
        "්‍",
        "ර්‍",
    ]
    s = "සර්‍ර්‍ා"
    ok, gl = normalize_clean_and_segment(s, g_mode=GLYPH_SPLIT)
    assert ok and len(gl) == 4, gl
    assert gl == [
        "ස",
        "ර්‍",
        "ර්‍",
        "ා",
    ]
