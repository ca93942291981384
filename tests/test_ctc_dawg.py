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
