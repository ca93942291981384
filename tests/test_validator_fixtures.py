"""Port of unittest/validator_test.cc: virama-script voting and
ValidateCleanAndSegment idempotency."""

from tesseract_spark.functions.graphemes import (
    BENGALI,
    DEVANAGARI,
    KANNADA,
    SINGLE_STRING,
    TELUGU,
    most_frequent_virama_script,
    validate_clean_and_segment,
)


def test_most_frequent_virama_script():
    """validator_test.cc:28-46."""
    assert most_frequent_virama_script([0xC05]) == TELUGU
    # Still Telugu surrounded by Latin.
    assert most_frequent_virama_script([ord("a"), 0xC05, ord("b"), ord("c")]) == TELUGU
    # But not still Telugu surrounded by Devanagari.
    assert most_frequent_virama_script([0x905, 0xC05, 0x906, 0x907]) == DEVANAGARI
    assert most_frequent_virama_script([0xC85, 0xC05, 0xC86, 0xC87]) == KANNADA
    assert most_frequent_virama_script([0x985, 0xC05, 0x986, 0x987]) == BENGALI
    # Danda and double danda don't count as Devanagari: they are common.
    assert most_frequent_virama_script([0x964, 0xC05, 0x965, 0x965]) == TELUGU


def test_idempotency():
    """validator_test.cc:50-67: re-validating the cleaned output does
    not change it again."""
    str1 = [0xD24, 0xD23, 0xD32, 0xD4D, ord("'"), 0x200D, 0x200C, 0x200D, 0x200C]
    str2 = [0xD24, 0xD23, 0xD32, 0xD4D, 0x200C, 0x200D, 0x200C, 0x200D, ord("'")]
    for src in (str1, str2):
        ok1, result1 = validate_clean_and_segment(SINGLE_STRING, src)
        assert ok1
        ok2, result2 = validate_clean_and_segment(SINGLE_STRING, result1[0])
        assert ok2
        assert len(result1) == len(result2)
        assert result2[0] == result1[0]
