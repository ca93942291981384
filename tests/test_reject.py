"""reject.cpp mechanisms: acceptance shapes, the biggest-gap reject
threshold, 0<->O and hyphen contextual flips, and the I/l/1 conflict
machinery (reject.cpp:62-764; control.cpp:1700-1810)."""

from tesseract_spark.operators.reject import (
    AC_INITIAL_CAP,
    AC_LC_ABBREV,
    AC_LOWER_CASE,
    AC_UC_ABBREV,
    AC_UNACCEPTABLE,
    AC_UPPER_CASE,
    RejectMap,
    acceptable_word_string,
    compute_reject_threshold,
    dont_allow_1Il,
    flip_0O,
    flip_hyphens,
    make_reject_map,
    one_ell_conflict,
    reject_mostly_rejects,
    repeated_nonalphanum_wd,
    set_done,
)


def test_acceptable_word_string_shapes():
    # control.cpp:1700-1780 state machine
    assert acceptable_word_string("hello") == AC_LOWER_CASE
    assert acceptable_word_string("Hello") == AC_INITIAL_CAP
    assert acceptable_word_string("IBM") == AC_UPPER_CASE
    assert acceptable_word_string("dog's") == AC_LOWER_CASE
    assert acceptable_word_string("well-known") == AC_LOWER_CASE
    # single leading punct + up to two DIFFERENT trailing puncts —
    # punct2 is the quote/paren set, so ")." does NOT qualify
    assert acceptable_word_string("(hello)") == AC_LOWER_CASE
    assert acceptable_word_string("hello)'") == AC_LOWER_CASE
    assert acceptable_word_string("(hello).") == AC_UNACCEPTABLE
    assert acceptable_word_string("hello!!") == AC_UNACCEPTABLE
    # too few initial alphas / mixed garbage / over-long
    assert acceptable_word_string("a") == AC_UNACCEPTABLE
    assert acceptable_word_string("x9z") == AC_UNACCEPTABLE
    assert acceptable_word_string("a" * 21) == AC_UNACCEPTABLE
    # hyphen needs >= 2 lower chars after it
    assert acceptable_word_string("ab-c") == AC_UNACCEPTABLE


def test_abbreviations():
    assert acceptable_word_string("U.S.") == AC_UC_ABBREV
    assert acceptable_word_string("e.g.") == AC_LC_ABBREV
    # the stride-4 walk examines only chars 0-1 of each 4-stride, so
    # "U.S" (missing final dot) still passes — the reference's
    # practical behavior (double-postfix quirk, control.cpp:1790-1794)
    assert acceptable_word_string("U.S") == AC_UC_ABBREV
    # a broken pair at the FRONT is detected
    assert acceptable_word_string("uS.") == AC_UNACCEPTABLE


def test_reject_threshold_biggest_gap():
    # certs cluster at -2 with one char far below: the gap midpoint
    # separates them (reject.cpp:227-258)
    certs = [-2.0, -2.1, -9.0, -1.9]
    thr = compute_reject_threshold(certs)
    assert -9.0 < thr < -2.1
    # under 3 chars: threshold drops below the minimum (no rejects)
    assert compute_reject_threshold([-5.0, -1.0]) < -5.0


def test_flip_0O_contexts():
    # reject.cpp:658-764 rule table
    assert flip_0O("HELL0") == "HELLO"  # AA0<end>
    assert flip_0O("R0OM") == "ROOM"  # A0(0|O)A
    assert flip_0O("1O2") == "102"  # 9O9
    assert flip_0O("9OOO") == "9000"  # 9OOO
    assert flip_0O("2OOx") == "200x"  # 9OO<non upper>
    assert flip_0O("3Ox") == "30x"  # 9O<non upper>
    assert flip_0O("5,OOO") == "5,000"  # 9[.,]OOO..
    # untouched: no context
    assert flip_0O("zero") == "zero"
    assert flip_0O("O0") == "O0"  # i starts at 1; no rule matches


def test_flip_0O_a00a_reference_quirk():
    # the reference's A00A branch flips ONLY position i then skips the
    # next char (one set_unichar_id + i++, reject.cpp:689-697)
    assert flip_0O("A00A") == "AO0A"


def test_flip_0O_superscript_guard():
    # a raised digit (box not sitting on the baseline) vetoes the word
    boxes = [(0, 0, 10, 100), (12, 0, 22, 100), (24, 0, 34, 40)]
    assert (
        flip_0O("AB0", boxes=boxes, baseline=100, x_height=100) == "AB0"
    )
    full = [(0, 0, 10, 100), (12, 0, 22, 100), (24, 0, 34, 100)]
    assert (
        flip_0O("AB0", boxes=full, baseline=100, x_height=100) == "ABO"
    )


def test_one_ell_conflict_branches():
    # all-conflict word: whole word rejected
    rej = RejectMap(3)
    conflict, w = one_ell_conflict("Ill", True, rej)
    assert conflict and rej.reject_count() == 3
    # lower-case word with a leading conflict char: first char only
    rej = RejectMap(3)
    conflict, w = one_ell_conflict("lit", True, rej)
    assert conflict and rej.flags == ["1Il_conflict", "", ""]
    # upper-case word: clean
    assert one_ell_conflict("IBM", True, RejectMap(3))[0] is False
    # digits with no alphas: 1s allowed, other conflict chars rejected
    assert one_ell_conflict("123", True, RejectMap(3))[0] is False
    rej = RejectMap(3)
    assert one_ell_conflict("I23", True, rej)[0] is True
    assert rej.flags[0] == "1Il_conflict"
    # no conflict chars at all
    assert one_ell_conflict("mill", True, RejectMap(4))[0] is False


def test_one_ell_conflict_dict_branches():
    def probe(word):
        return "system_dawg" if word in ("It", "lt", "lose") else None

    # dawg-backed word whose leading-I flip is ALSO a dict word: the
    # char is genuinely ambiguous -> conflict (reject.cpp:345-375)
    rej = RejectMap(2)
    conflict, w = one_ell_conflict(
        "It", True, rej, permuter="system_dawg", dict_probe=probe
    )
    assert conflict and rej.flags[0] == "1Il_conflict"
    # flipping a leading l GENERATES a dict word on a non-dict
    # permuter: the string is repaired (reject.cpp:385-404)
    conflict, w = one_ell_conflict(
        "Iose", False, None, permuter="top_choice", dict_probe=probe
    )
    assert conflict is False and w == "lose"


def test_set_done():
    # accepted one-word dict reads are done; non-dict reads are not
    assert set_done("hello", "system_dawg", True) is True
    assert set_done("hello", "top_choice", True) is False
    assert set_done("123", "number", True) is True
    assert set_done("he llo", "system_dawg", True) is False
    assert set_done("hello", "system_dawg", False) is False


def test_make_reject_map_mode0():
    # done word: nothing rejected
    out = make_reject_map(
        "hello", [-2.0] * 5, permuter="system_dawg", tess_accepted=True
    )
    assert out.done and out.rej.reject_count() == 0
    # non-done word: chars below the biggest-gap threshold reject
    out = make_reject_map(
        "hello", [-2.0, -2.1, -9.0, -1.9, -2.05], permuter="top_choice"
    )
    assert not out.done
    assert out.rej.flags[2] == "poor_match"
    assert out.rej.reject_count() == 1


def test_make_reject_map_mode5():
    # non-dict permuter: whole word rejected (rej_use_good_perm)
    out = make_reject_map(
        "qzxv", [-2.0] * 4, permuter="top_choice", mode=5
    )
    assert out.rej.reject_count() == 4
    # dict word: clean
    out = make_reject_map(
        "hello", [-2.0] * 5, permuter="system_dawg", mode=5
    )
    assert out.rej.reject_count() == 0
    # tiny x-height: whole word rejected
    out = make_reject_map(
        "hello", [-2.0] * 5, permuter="system_dawg", mode=5, x_height_px=8
    )
    assert out.rej.reject_count() == 5


def test_flip_hyphens():
    # a wide isolated blob read '.' between letters is a hyphen
    # (aspect >= 1.8 certain; > 1.5 suspect), reject.cpp:600-655
    boxes = [(0, 0, 20, 30), (25, 10, 55, 20), (60, 0, 80, 30)]
    rej = RejectMap(3)
    assert flip_hyphens("a.b", boxes, x_scale=1.0, rej=rej) == "a-b"
    # marginal aspect (1.6): keep '.' but mark suspect
    boxes2 = [(0, 0, 20, 30), (25, 10, 41, 20), (60, 0, 80, 30)]
    rej2 = RejectMap(3)
    assert flip_hyphens("a.b", boxes2, x_scale=1.0, rej=rej2) == "a.b"
    assert rej2.flags[1] == "hyphen"
    # narrow dot: untouched, unmarked
    boxes3 = [(0, 0, 20, 30), (25, 10, 31, 20), (60, 0, 80, 30)]
    rej3 = RejectMap(3)
    assert flip_hyphens("a.b", boxes3, x_scale=1.0, rej=rej3) == "a.b"
    assert rej3.reject_count() == 0
    # touching blobs are too dangerous: overlapping boxes untouched
    boxes4 = [(0, 0, 30, 30), (25, 10, 55, 20), (60, 0, 80, 30)]
    assert flip_hyphens("a.b", boxes4, x_scale=1.0) == "a.b"


def test_dont_allow_1Il():
    # every accepted alphanumeric is conflict-set: reject them
    rej = RejectMap(3)
    dont_allow_1Il("I1l", rej)
    assert rej.reject_count() == 3
    # a confirmed non-conflict alphanumeric protects the word
    rej = RejectMap(3)
    dont_allow_1Il("Il a"[:3], rej)  # "Il " has no other alnum
    rej2 = RejectMap(4)
    dont_allow_1Il("Ilse", rej2)
    assert rej2.reject_count() == 0


def test_mostly_rejects_and_repeats():
    rej = RejectMap(4)
    for i in range(3):
        rej.setrej(i, "poor_match")
    reject_mostly_rejects(rej)  # 3/4 = 0.75 < 0.85: unchanged
    assert rej.reject_count() == 3
    rej.setrej(3, "poor_match")
    reject_mostly_rejects(rej)
    assert rej.reject_count() == 4
    # repeated allowed non-alphanum word (leader dashes)
    assert repeated_nonalphanum_wd("----") is True
    assert repeated_nonalphanum_wd("-?-?") is False
    assert repeated_nonalphanum_wd("aaaa") is False
    assert repeated_nonalphanum_wd("-") is False


def _wrow(doc, text, wn, conf=95.0, permuter="top_choice", choices=None):
    return dict(
        doc_id=doc, media_ref="m", block_num=1, par_num=1, line_num=1,
        word_num=wn, left=wn * 100, top=0, width=80, height=12,
        conf=conf, text=text, baseline=12, permuter=permuter,
        rating=0.1, certainty=-1.0, choices=choices or [], blanks=0,
        font="", bold=0, italic=0, mono=0, pointsize=0, smallcaps=0,
        underlined=0,
    )


def test_reject_words_df_and_unlv(spark):
    """The DataFrame pass appends the REJMAP and repairs flip_0O
    contexts; the UNLV sink renders per-char suspects from the map
    (GetUNLVText non-crunched walk, baseapi.cpp:1602-1612)."""
    import pandas as pd

    from tesseract_spark.operators.reject import reject_words
    from tesseract_spark.operators.sinks import WORDS_SCHEMA, to_unlv

    # choices: per-symbol [(ch, conf_pct)] — one poor symbol in 'night'
    def ch(conf):
        return [{"ch": "x", "conf": conf}]

    rows = [
        _wrow("d", "HELL0", 1, permuter="top_choice"),
        _wrow(
            "d", "night", 2, permuter="system_dawg",
            choices=[ch(95.0)] * 5,
        ),
        _wrow(
            "d", "qzxkv", 3, permuter="top_choice",
            choices=[ch(95.0), ch(95.0), ch(12.0), ch(95.0), ch(95.0)],
        ),
    ]
    words = spark.createDataFrame(pd.DataFrame(rows), schema=WORDS_SCHEMA)
    out = reject_words(words)
    got = {r.word_num: r for r in out.collect()}
    assert got[1].text == "HELLO"  # flip_0O applied in the DF pass
    assert got[2].rejects == "AAAAA"  # dict word: clean
    # non-done word: the biggest-gap threshold rejects the poor symbol
    assert got[3].rejects == "AARAA"
    unlv = to_unlv(out).collect()[0].unlv
    assert "qz^xkv" in unlv  # per-char suspect mark, char still prints
    assert "HELLO" in unlv and "night" in unlv


def test_reject_words_passes_degraded_marker_rows(spark):
    """A failed page's marker row (word_num=-1, text='', conf=-1 —
    sinks.ocr_words per-page isolation) must flow through reject_words
    untouched, not crash the job (the reference never builds a REJMAP
    for a word without a best choice; compute_reject_threshold([])
    rejects nothing)."""
    import pandas as pd

    from tesseract_spark.operators.reject import reject_words
    from tesseract_spark.operators.sinks import WORDS_SCHEMA

    marker = _wrow("d", "", -1, conf=-1.0, permuter="no_perm")
    rows = [marker, _wrow("d", "night", 1, permuter="system_dawg")]
    words = spark.createDataFrame(pd.DataFrame(rows), schema=WORDS_SCHEMA)
    got = {r.word_num: r for r in reject_words(words).collect()}
    assert got[-1].text == "" and got[-1].rejects == ""
    assert got[1].rejects == "AAAAA"


def test_flip_hyphens_certain_flip_still_suspected():
    """reject.cpp:620-640 exact flag semantics: R_HYPHEN_ACCEPT only
    neutralizes PRE-NN rejects (rejctmap.h:159-162), so even a CERTAIN
    '.'->'-' flip falls through to the second plain `if` and ends
    marked a suspected hyphen when the char was accepted — the
    reference deliberately keeps flipped hyphens suspect."""
    from tesseract_spark.operators.reject import RejectMap, flip_hyphens

    rej = RejectMap(1)
    out = flip_hyphens(".", [(0, 0, 30, 10)], x_scale=1.0, rej=rej)
    assert out == "-"
    assert rej.rejected(0) and rej.flags[0] == "hyphen"
    # marginal aspect (lower < a < upper): no flip, still suspected
    rej2 = RejectMap(1)
    out2 = flip_hyphens(".", [(0, 0, 17, 10)], x_scale=1.0, rej=rej2)
    assert out2 == "." and rej2.flags[0] == "hyphen"
