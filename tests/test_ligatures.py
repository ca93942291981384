"""LigatureTable parity: ligature_table_test.cc's ENABLED cases.

(The reference's AddLigatures/RemoveLigatures Unicode-range tests are
#if 0-disabled — "not with NFC normalization" — because NFC does not
decompose compatibility ligatures; the shipped tables hold exactly the
custom entries, which this pins.)
"""

from tesseract_spark.functions.ligatures import CUSTOM_LIGATURES, LigatureTable


def test_does_fill_ligature_tables():
    lt = LigatureTable.get()
    assert len(lt.norm_to_lig) > 0
    assert len(lt.lig_to_norm) > 0


def test_custom_ligatures_roundtrip():
    # ligature_table_test.cc:85-96 TestCustomLigatures, verbatim
    cases = [
        ("act", "a"),
        ("publiſh", "publi"),
        ("ſince", "nce"),
        ("aſleep", "aeep"),
        ("neceſſary", "neceary"),
    ]
    lt = LigatureTable.get()
    for plain, lig in cases:
        assert lt.add_ligatures(plain) == lig, plain
        assert lt.remove_ligatures(lig) == plain, lig
        assert lt.remove_custom_ligatures(lig) == plain, lig


def test_longest_match_wins():
    # 'ſſ' must beat 'ſi'-style shorter candidates at the same offset:
    # "neceſſary" maps the double long-s, not a prefix pair
    lt = LigatureTable.get()
    assert lt.add_ligatures("ſſ") == ""


def test_plain_text_untouched():
    lt = LigatureTable.get()
    assert lt.add_ligatures("plain words only") == "plain words only"
    assert lt.remove_ligatures("plain words only") == "plain words only"


def test_real_unicode_ligature_not_custom():
    # RemoveCustomLigatures keeps genuine Unicode ligatures intact
    # (the fi ligature is not in the custom table)
    lt = LigatureTable.get()
    assert lt.remove_custom_ligatures("ﬁction") == "ﬁction"
