"""Ports of unittest/unicharset_test.cc and unittest/unichar_test.cc.

Fixture values (ids, sizes, encodings, length strings) are the
reference's own expectations, byte-exact."""

from tesseract_spark.lstm.refcharset import (
    INVALID_UNICHAR_ID,
    RefUnicharset,
    utf32_to_utf8,
    utf8_to_utf32,
)


class TestUnicharsetBasics:
    """unicharset_test.cc:29-64 Basics."""

    def test_basics(self):
        u = RefUnicharset()
        u.unichar_insert("a")
        assert len(u) == 4
        u.unichar_insert("f")
        assert len(u) == 5
        u.unichar_insert("i")
        assert len(u) == 6
        # The fi ligature is NOT added: cleanup expands it to f+i,
        # which the set already encodes (unicharset.cpp:660-666).
        u.unichar_insert("ﬁ")
        assert len(u) == 6
        u.unichar_insert("e")
        assert len(u) == 7
        u.unichar_insert("n")
        assert len(u) == 8
        assert u.unichar_to_id("f") == 4
        assert u.unichar_to_id("i") == 5
        # The fi ligature has no valid id (cleanup expands it; the
        # pair string is not an entry either).
        assert u.unichar_to_id("ﬁ") == INVALID_UNICHAR_ID
        assert u.unichar_to_id("fi") == INVALID_UNICHAR_ID
        perfect, labels, _, _ = u.encode_string("affine", True)
        assert perfect
        assert labels == [3, 4, 4, 5, 7, 6]
        # With the raw ligature, encoding fails without pre-cleanup...
        lig = "afﬁne"
        perfect, _, _, _ = u.encode_string(lig, True)
        assert not perfect
        # ...and succeeds after CleanupString.
        from tesseract_spark.lstm.refcharset import cleanup_string

        perfect, labels, _, _ = u.encode_string(cleanup_string(lig), True)
        assert perfect
        assert labels == [3, 4, 4, 5, 7, 6]


class TestUnicharsetMultibyte:
    """unicharset_test.cc:66-112 Multibyte."""

    def test_multibyte(self):
        u = RefUnicharset()
        u.unichar_insert("ا")
        assert len(u) == 4
        u.unichar_insert("ج")
        assert len(u) == 5
        u.unichar_insert("د")
        assert len(u) == 6
        # fi ligature IS added here (as the fi pair): f and i are absent.
        u.unichar_insert("ﬁ")
        assert len(u) == 7
        u.unichar_insert("ث")
        assert len(u) == 8
        u.unichar_insert("ص")
        assert len(u) == 9
        assert u.unichar_to_id("ا") == 3
        assert u.unichar_to_id("ج") == 4
        # First two bytes of this string are ا -> id 3.
        assert u.unichar_to_id("اج", 2) == 3
        assert u.unichar_to_id("د") == 5
        assert u.unichar_to_id("f") == INVALID_UNICHAR_ID
        assert u.unichar_to_id("i") == INVALID_UNICHAR_ID
        assert u.unichar_to_id("fi") == 6
        # The ligature is findable (cleanup maps it to the fi pair).
        assert u.unichar_to_id("ﬁ") == 6
        perfect, labels, _, _ = u.encode_string("اججدصث", True)
        assert perfect
        assert labels == [3, 4, 4, 5, 8, 7]
        from tesseract_spark.lstm.refcharset import cleanup_string

        src = "اجﬁصث"
        cleaned = cleanup_string(src)
        perfect, labels, lengths, enc_len = u.encode_string(cleaned, True)
        assert perfect
        assert enc_len == len(cleaned.encode("utf-8"))
        assert lengths == [2, 2, 2, 2, 2]
        assert labels == [3, 4, 6, 8, 7]


class TestUnicharsetMultibyteBigrams:
    """unicharset_test.cc:114-145 MultibyteBigrams + save/load."""

    def test_bigrams_roundtrip(self):
        u = RefUnicharset()
        u.unichar_insert("ಜ")
        assert len(u) == 4
        u.unichar_insert("ಭ")
        assert len(u) == 5
        u.unichar_insert("್ಜ")
        assert len(u) == 6
        u.unichar_insert("್")
        assert len(u) == 7
        # By default the encodable bigram is NOT added...
        u.unichar_insert("್ಭ")
        assert len(u) == 7
        # ...but it is when forced old-style.
        u.unichar_insert("್ಭ", old_style=True)
        assert len(u) == 8
        v = RefUnicharset.load_from_string(u.save_to_string())
        assert v.unichar_to_id("ಜ") == 3
        assert v.unichar_to_id("ಭ") == 4
        assert v.unichar_to_id("್ಜ") == 5
        assert v.unichar_to_id("್") == 6
        assert v.unichar_to_id("್ಭ") == 7


class TestUnicharsetOldStyle:
    """unicharset_test.cc:147-155 OldStyle, over a synthesized
    old-style file (the sandbox carries no eng.unicharset; the file is
    built through our own old-style save, which keeps ligature rows
    exactly as the backwards-compatible loader must)."""

    def test_old_style_keeps_ligatures(self):
        w = RefUnicharset()
        for ch in ("a", "f", "i", "l"):
            w.unichar_insert(ch)
        w.unichar_insert("ﬁ", old_style=True)
        w.unichar_insert("ﬂ", old_style=True)
        n = len(w)
        assert n == 9  # 3 specials + a f i l + both ligatures
        v = RefUnicharset.load_from_string(w.save_to_string())
        # Every row survives the round trip with its id.
        assert len(v) == n
        assert v.unichar_to_id("ﬁ") == 7
        assert v.unichar_to_id("ﬂ") == 8


class TestUnichar:
    """unichar_test.cc:19-42 Conversion + InvalidText."""

    def test_conversion_roundtrip(self):
        src8 = "aאತ\U0002a714"
        src32 = [ord("a"), 0x5D0, 0xCA4, 0x2A714]
        assert utf8_to_utf32(src8) == src32
        assert utf32_to_utf8(src32) == src8

    def test_invalid_text(self):
        # Invalid utf8 (a stray continuation byte) -> empty vector.
        assert utf8_to_utf32(b"a b\x80d string") == []
        # Invalid utf32 (beyond U+10FFFF) -> empty string.
        assert utf32_to_utf8([ord("a"), ord(" "), 0x200000, ord("x")]) == ""


class TestEncodeStringSkip:
    """The give_up_on_failure=False path (unicharset.cpp:253-268):
    unknown characters become INVALID_UNICHAR_ID and the walk
    continues — this is the whitelist/blacklist parsing mode."""

    def test_skip_mode(self):
        u = RefUnicharset()
        for ch in "abc":
            u.unichar_insert(ch)
        perfect, enc, lengths, enc_len = u.encode_string("aXbYc", False)
        assert not perfect
        assert enc == [3, INVALID_UNICHAR_ID, 4, INVALID_UNICHAR_ID, 5]
        assert lengths == [1, 1, 1, 1, 1]
        assert enc_len == 5
