"""CTC beam search + DAWG tests (recodebeam_test.cc / dawg_test.cc analogues)."""

import numpy as np
import pytest

from tesseract_spark.lstm.ctc import ctc_beam_decode, greedy_decode
from tesseract_spark.lstm.dawg import Dawg

CHARSET = "abcdefghijklmnopqrstuvwxyz "
BLANK = len(CHARSET)
SPACE = CHARSET.index(" ")


def synth_logprobs(truth: str, rng, noise: float = 0.3) -> np.ndarray:
    """Random softmax time-series around an encoded truth string
    (recodebeam_test.cc:244-332 construction)."""
    C = len(CHARSET) + 1
    T = len(truth) * 3
    logits = np.full((T, C), -8.0)
    for i, ch in enumerate(truth):
        t = i * 3
        logits[t, CHARSET.index(ch)] = 0.0
        logits[t + 1, BLANK] = 0.0
        logits[t + 2, BLANK] = 0.0
    logits += rng.normal(0, noise, logits.shape)
    return logits - np.log(np.exp(logits).sum(1, keepdims=True))


@pytest.mark.parametrize("seed", range(8))
def test_beam_recovers_truth_under_noise(seed):
    rng = np.random.default_rng(seed)
    truth = "".join(rng.choice(list(CHARSET.strip())) for _ in range(12))
    lp = synth_logprobs(truth, rng)
    text, _w, _c = ctc_beam_decode(lp, CHARSET, BLANK, SPACE)
    assert text == truth
    assert greedy_decode(lp, CHARSET, BLANK) == truth


def test_repeat_collapse_and_blank_separation():
    # 'aa' requires a blank between the two a's; 'a' held over repeats collapses
    C = len(CHARSET) + 1
    lg = np.full((5, C), -9.0)
    a = CHARSET.index("a")
    lg[0, a] = lg[1, a] = 0.0  # repeat -> one 'a'
    lg[2, BLANK] = 0.0
    lg[3, a] = lg[4, a] = 0.0  # second 'a'
    lp = lg - np.log(np.exp(lg).sum(1, keepdims=True))
    text, _w, _c = ctc_beam_decode(lp, CHARSET, BLANK, SPACE)
    assert text == "aa"


def test_dict_rescoring_flips_ambiguous_char():
    d = Dawg(CHARSET, ["hello", "world"])
    rng = np.random.default_rng(0)
    lp = synth_logprobs("hello world", rng, noise=0.0)
    # make final 'd' ambiguous with 'a' ('worla' slightly preferred)
    t = "hello world".index("d") * 3
    lg = lp.copy()
    lg[t] = -8.0
    lg[t, CHARSET.index("a")] = -0.4
    lg[t, CHARSET.index("d")] = -0.7
    lg[t, BLANK] = -8.0
    lp2 = lg - np.log(np.exp(lg).sum(1, keepdims=True))
    no_dict, _, _ = ctc_beam_decode(lp2, CHARSET, BLANK, SPACE)
    with_dict, words, _ = ctc_beam_decode(lp2, CHARSET, BLANK, SPACE, d)
    assert no_dict == "hello worla"
    assert with_dict == "hello world"
    assert [w.dict_word for w in words] == [True, True]


def test_dict_does_not_override_strong_evidence():
    d = Dawg(CHARSET, ["hello", "world"])
    rng = np.random.default_rng(1)
    lp = synth_logprobs("hello worla", rng, noise=0.0)
    text, _, _ = ctc_beam_decode(lp, CHARSET, BLANK, SPACE, d)
    assert text == "hello worla"


def test_word_confidences_and_boxes():
    rng = np.random.default_rng(2)
    lp = synth_logprobs("abc de", rng, noise=0.1)
    _t, words, cert = ctc_beam_decode(lp, CHARSET, BLANK, SPACE)
    assert [w.text for w in words] == ["abc", "de"]
    assert all(0.0 < w.confidence <= 100.0 for w in words)
    assert words[0].start_t < words[0].end_t < words[1].start_t
    assert cert <= 0.0


def test_dawg_roundtrip():
    # dawg_test.cc:85-89 — wordlist -> dawg -> wordlist
    words = ["a", "ab", "abc", "b", "ba", "cab", "cabs", "zig", "zag"]
    d = Dawg(CHARSET, words)
    assert d.all_words() == sorted(words)
    for w in words:
        assert d.accepts(w)
    for w in ["c", "abcd", "zigzag", ""]:
        assert not d.accepts(w)


def test_dawg_squish_shares_suffixes():
    # common suffixes must merge: edge count far below trie edge count
    words = [p + "ing" for p in ["walk", "talk", "jump", "look", "work"]]
    d = Dawg(CHARSET, words)
    assert d.all_words() == sorted(words)
    trie_edges = sum(len(w) for w in set(words))  # unshared upper bound
    assert d.n_edges < trie_edges


# ---------------------------------------------------------------------------
# User-patterns DAWG (Trie::read_pattern_list, trie.cpp:390-460) +
# fix_rep_char (control.cpp:1673-1699)
# ---------------------------------------------------------------------------

NUMSET = "abcdefghijklmnopqrstuvwxyz0123456789.,-$ "


def test_pattern_dawg_digit_runs():
    from tesseract_spark.lstm.dawg import PatternDawg

    # \d\* = one or more digits; money = $ digits . digit digit
    p = PatternDawg(NUMSET, ["\\d\\*", "$\\d\\*.\\d\\d"])
    for ok in ("1", "42", "12345", "$3.99", "$120.00"):
        assert p.accepts(ok), ok
    for bad in ("", "a1", "12a", "$3.9", "$3.999", "3.99"):
        assert not p.accepts(bad), bad


def test_pattern_dawg_classes_and_escapes():
    from tesseract_spark.lstm.dawg import PatternDawg

    # \c alpha, \A upper, \a lower, \p punct, \n alnum, \\ literal
    p = PatternDawg(NUMSET, ["\\a\\a-\\d", "x\\p"])
    assert p.accepts("ab-7")
    assert not p.accepts("Ab-7".lower() + "8")
    assert p.accepts("x,")
    assert not p.accepts("xy")
    # invalid escape rejects the whole pattern, not the dawg
    p2 = PatternDawg(NUMSET, ["\\q", "ok\\d"])
    assert not p2.accepts("q")
    assert p2.accepts("ok5")


def test_combined_dawg_words_or_patterns():
    from tesseract_spark.lstm.dawg import CombinedDawg, Dawg, PatternDawg

    wd = Dawg(NUMSET, ["cat", "dog"])
    pd = PatternDawg(NUMSET, ["\\d\\*"])
    c = CombinedDawg(wd, pd)
    assert c.accepts("cat") and c.accepts("dog")
    assert c.accepts("123") and c.accepts("7")
    assert not c.accepts("cat1") and not c.accepts("catx")
    # prefix sharing: 'c' continues in words, '1' in patterns, never both
    n, end = c.step(0, NUMSET.index("c"))
    assert n > 0 and not end
    n2, end2 = c.step(n, NUMSET.index("a"))
    n3, end3 = c.step(n2, NUMSET.index("t"))
    assert end3


def test_beam_accepts_pattern_validated_tokens():
    """A digit-run token must survive dict rescoring as a valid word when
    the pattern dawg is active (digits are not in any wordlist)."""
    from tesseract_spark.lstm.dawg import CombinedDawg, Dawg, PatternDawg

    rng = np.random.default_rng(3)
    charset = NUMSET
    blank = len(charset)
    space = charset.index(" ")

    def synth(truth):
        C = len(charset) + 1
        T = len(truth) * 3
        logits = np.full((T, C), -8.0)
        for i, ch in enumerate(truth):
            t = i * 3
            logits[t, charset.index(ch)] = 0.0
            logits[t + 1, blank] = 0.0
            logits[t + 2, blank] = 0.0
        logits += rng.normal(0, 0.25, logits.shape)
        return logits - np.log(np.exp(logits).sum(1, keepdims=True))

    dawg = CombinedDawg(
        Dawg(charset, ["pay", "now"]), PatternDawg(charset, ["\\d\\*", "$\\d\\*.\\d\\d"])
    )
    text, words, _ = ctc_beam_decode(
        synth("pay 42 now"), charset, blank, space, dawg
    )
    assert text == "pay 42 now"
    assert [w.dict_word for w in words] == [True, True, True]
    text2, words2, _ = ctc_beam_decode(
        synth("$3.99"), charset, blank, space, dawg
    )
    assert text2 == "$3.99" and words2[0].dict_word


def test_fix_rep_char_leader_correction():
    """fix_rep_char rewrites a dominant-repeat word's minority chars to
    the dominant char (leader dots with one misread comma)."""
    from tesseract_spark.lstm.ctc import DecodedWord, fix_rep_char, fix_rep_chars

    w = DecodedWord(".....,..", 0, 8, -0.1, 90.0, False, tuple(range(8)))
    fixed = fix_rep_char(w)
    assert fixed.text == "........"
    # short words, dict words and non-dominant mixes are untouched
    keep = [
        DecodedWord("a.", 0, 1, 0, 90, False),
        DecodedWord("beekeeper", 0, 9, 0, 90, False),
        DecodedWord("aaab", 0, 4, 0, 90, True),  # dict word: protected
        # W_REP_CHAR gate: only LEADER-char repeats qualify — legitimate
        # words with a dominant alpha/digit char must never be rewritten
        DecodedWord("loll", 0, 4, 0, 90, False),
        DecodedWord("sass", 0, 4, 0, 90, False),
        DecodedWord("1111-", 0, 5, 0, 90, False),
        DecodedWord("mmmm", 0, 4, 0, 90, False),
    ]
    for k in keep:
        assert fix_rep_char(k).text == k.text
    out, changed = fix_rep_chars([w] + keep)
    assert changed and out[0].text == "........"


def test_fix_rep_char_end_to_end_row():
    """A rendered leader row decodes through the template net and the
    repeated-char fixup leaves a clean uniform leader."""
    from tesseract_spark.functions.fonts import mask_to_gray, render_line, CELL_H
    from tesseract_spark.operators.recognize import recognize_page

    line = render_line("........")
    page = np.zeros((CELL_H + 24, line.shape[1] + 24), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + line.shape[1]] = line
    spans, _ = recognize_page(mask_to_gray(page))
    texts = [s.text for s in spans if s.kind == "text"]
    assert texts == ["........"]
