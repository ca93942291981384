"""Port of unittest/unicharcompress_test.cc over synthesized
unicharsets (the sandbox has no testdata/*.unicharset or
radical-stroke.txt; the per-script sets are built in-test with the
same structure, and the trivial-set expectations are byte-exact)."""

import pytest

from tesseract_spark.lstm.refcharset import RefUnicharset
from tesseract_spark.lstm.tessdata import (
    K_MAX_CODE_LEN,
    Reader,
    UnicharCompress,
    Writer,
)

UNICHAR_BROKEN = 2
SPECIAL_COUNT = 3


def load_unicharset(ucs: RefUnicharset, radical_map=None):
    """LoadUnicharset (unicharcompress_test.cc:29-48)."""
    null_char = UNICHAR_BROKEN if ucs.has_special_codes() else len(ucs)
    compressed = UnicharCompress.compute_encoding(ucs, null_char, radical_map)
    encoded_null_char = compressed.encode_unichar(null_char)[0]
    return compressed, null_char, encoded_null_char


def expect_correct(compressed: UnicharCompress, ucs: RefUnicharset, null_char: int, lang: str):
    """ExpectCorrect (unicharcompress_test.cc:72-130)."""
    code_range = compressed.code_range
    times_seen = [[0] * K_MAX_CODE_LEN for _ in range(code_range)]
    size = len(ucs)
    has_specials = ucs.has_special_codes()
    for u in range(size + 1):
        if (
            u != 0
            and u != null_char
            and (u == size or (has_specials and u < SPECIAL_COUNT))
        ):
            continue  # not used so not encoded
        code = compressed.encode_unichar(u)
        unichar_id = null_char if (u == null_char or u == size) else u
        assert compressed.decode_unichar(code) == unichar_id
        for i, code_val in enumerate(code):
            assert 0 <= code_val < code_range
            times_seen[code_val][i] += 1
    # Each code value is used in at least one position.
    for c in range(code_range):
        assert sum(1 for i in range(K_MAX_CODE_LEN) if times_seen[c][i]) >= 1, f"c={c}/{code_range}"
    check_code_extensions(compressed, [], times_seen)
    # Compression: <10% of the unicharset for CJK/Indic (20% for jpn),
    # no bigger for everything else.
    if lang in ("chi_sim", "chi_tra", "kor", "jpn", "kan", "mar"):
        assert code_range < size / (5 if lang == "jpn" else 10)
    else:
        assert code_range <= size + 1


def check_code_extensions(compressed, code, times_seen):
    """CheckCodeExtensions (unicharcompress_test.cc:133-157)."""
    length = len(code)
    for ending in compressed.get_final_codes(code):
        assert times_seen[ending][length] > 0
        assert compressed.decode_unichar(code + [ending]) != -1
    for extension in compressed.get_next_codes(code):
        assert times_seen[extension][length] > 0
        check_code_extensions(compressed, code + [extension], times_seen)


def serialize_and_undo(compressed: UnicharCompress) -> UnicharCompress:
    """SerializeAndUndo (unicharcompress_test.cc:50-59)."""
    w = Writer()
    compressed.write(w)
    return UnicharCompress.read(Reader(w.getvalue()))


# -- synthesized language sets ---------------------------------------


def _specials_set() -> RefUnicharset:
    return RefUnicharset()  # " ", "Joined", "|Broken|0|1"


def make_eng_set() -> RefUnicharset:
    u = _specials_set()
    for ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!?'-":
        u.unichar_insert(ch)
    return u


def make_kor_set() -> RefUnicharset:
    """~2.2k Hangul syllables, stride-5 over the block so every
    leading/vowel/trailing Jamo value occurs."""
    u = _specials_set()
    for cp in range(0xAC00, 0xAC00 + 19 * 21 * 28, 5):
        u.unichar_insert(chr(cp))
    return u


def make_kan_set() -> RefUnicharset:
    """Kannada consonant-virama-consonant clusters: many unichars over
    few codepoints, the Indic compression shape."""
    u = _specials_set()
    consonants = [chr(c) for c in range(0x0C95, 0x0C95 + 30)]
    for c in consonants:
        u.unichar_insert(c)
    for c1 in consonants:
        for c2 in consonants:
            u.unichar_insert(c1 + "್" + c2, old_style=True)
    return u


def make_han_set_and_radicals():
    """500 Han codepoints with synthesized radical-stroke
    decompositions, some sharing a decomposition to exercise the
    disambiguator code (unicharcompress.cpp:158-163)."""
    u = _specials_set()
    radical_lines = []
    for i in range(500):
        cp = 0x4E00 + i
        u.unichar_insert(chr(cp))
        # 20 radicals x 5 strokes x 5 -> every 500/25 chars share.
        radical_lines.append(f"{cp} {i % 20} {(i // 20) % 5} {(i // 100) % 5}")
    table = "# synthesized radical-stroke table\n" + "\n".join(radical_lines) + "\n"
    return u, UnicharCompress.decode_radical_table(table)


def make_por_set() -> RefUnicharset:
    """Letters plus double-letter ligature entries (old-style 'ff'
    etc.), the DoesLigaturesWithDoubles shape."""
    u = _specials_set()
    for ch in "abcdefilmnoprstu":
        u.unichar_insert(ch)
    for lig in ("ff", "fi", "fl", "ffi"):
        u.unichar_insert(lig, old_style=True)
    return u


def make_trivial_set() -> RefUnicharset:
    """trivial.unicharset: NULL(space), i, f, and the fi ligature."""
    u = RefUnicharset(with_specials=False)
    u.unichar_insert(" ")
    u.unichar_insert("i")
    u.unichar_insert("f")
    u.unichar_insert("ﬁ", old_style=True)
    return u


# -- the tests --------------------------------------------------------


def test_does_chinese():
    ucs, radical_map = make_han_set_and_radicals()
    compressed, null_char, _ = load_unicharset(ucs, radical_map)
    expect_correct(compressed, ucs, null_char, "chi_sim")


def test_does_korean():
    ucs = make_kor_set()
    compressed, null_char, _ = load_unicharset(ucs)
    expect_correct(compressed, ucs, null_char, "kor")


def test_does_kannada_with_serialization():
    ucs = make_kan_set()
    compressed, null_char, _ = load_unicharset(ucs)
    expect_correct(compressed, ucs, null_char, "kan")
    compressed = serialize_and_undo(compressed)
    expect_correct(compressed, ucs, null_char, "kan")


def test_does_english():
    ucs = make_eng_set()
    compressed, null_char, _ = load_unicharset(ucs)
    expect_correct(compressed, ucs, null_char, "eng")


def test_does_ligatures_with_doubles():
    """unicharcompress_test.cc:205-223: multi-code sequences carry no
    null code."""
    ucs = make_por_set()
    compressed, null_char, encoded_null = load_unicharset(ucs)
    expect_correct(compressed, ucs, null_char, "por")
    for u in range(len(ucs) + 1):
        if u >= len(compressed.encoder):
            break
        code = compressed.encode_unichar(u)
        if len(code) > 1:
            for c in code:
                assert c != encoded_null


def test_get_encoding_as_string():
    """unicharcompress_test.cc:225-243, byte-exact."""
    ucs = make_trivial_set()
    compressed, null_char, _ = load_unicharset(ucs)
    expect_correct(compressed, ucs, null_char, "trivial")
    lines = compressed.get_encoding_as_string(ucs).split("\n")
    assert len(lines) == 6 and lines[5] == ""  # 5 lines + trailing \n
    assert lines[0] == "0\t "
    assert lines[1] == "1\ti"
    assert lines[2] == "2\tf"
    assert lines[3] == "2,1\tﬁ"
    assert lines[4] == "3\t<nul>"
