"""Property-based tests (hypothesis) — the recodebeam_test-style random
construction generalized: random truths through CTC, random nets through
the tessdata serializer, and differential pattern-DAWG vs regex."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789.,- "
BLANK = len(CHARSET)
SPACE = CHARSET.index(" ")


def _synth(truth: str, rng: np.random.Generator, noise: float) -> np.ndarray:
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


# words: no leading/trailing/double spaces (CTC cannot represent them)
_word = st.text(alphabet=CHARSET.replace(" ", "").replace(".", ""),
                min_size=1, max_size=6)
_sentence = st.lists(_word, min_size=1, max_size=4).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(truth=_sentence, seed=st.integers(0, 2**31 - 1))
def test_ctc_beam_recovers_random_truths(truth, seed):
    """recodebeam_test.cc:244-332 as a property: the beam recovers any
    encodable truth from a softmax series built around it."""
    from tesseract_spark.lstm.ctc import ctc_beam_decode

    rng = np.random.default_rng(seed)
    lp = _synth(truth, rng, noise=0.25)
    text, _words, _c = ctc_beam_decode(lp, CHARSET, BLANK, SPACE)
    assert text == truth


@settings(max_examples=15, deadline=None)
@given(
    units=st.integers(2, 6),
    filters=st.integers(1, 4),
    classes=st.integers(2, 8),
    seed=st.integers(0, 1000),
)
def test_network_serialization_roundtrip_property(units, filters, classes, seed):
    """Any net the serializer accepts must deserialize to a forward-
    identical net (tessdata network-tree format)."""
    from tesseract_spark.lstm import tessdata as td
    from tesseract_spark.lstm.vgsl import VGSLNetwork

    spec = f"[1,8,0,1 Ct3,3,{filters} Lbx{units} O1c{classes}]"
    net = VGSLNetwork(spec, seed=seed)
    net2 = td.deserialize_network(
        td.Reader(td.serialize_network(net)), spec
    )
    x = np.random.default_rng(seed).random((1, 8, 16, 1)).astype(np.float32)
    np.testing.assert_array_equal(net.forward(x), net2.forward(x))


_PAT_CLASSES = {"c": "[a-zA-Z]", "d": "[0-9]", "n": "[a-zA-Z0-9]",
                "a": "[a-z]", "A": "[A-Z]"}


def _pattern_to_regex(pat: str) -> str:
    out = []
    i = 0
    while i < len(pat):
        if pat[i] == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt == "*":
                # \* makes the previous unit repeatable (1+ total)
                if out and not out[-1].endswith("+"):
                    out[-1] += "+"
                i += 2
                continue
            if nxt in _PAT_CLASSES:
                out.append(_PAT_CLASSES[nxt])
                i += 2
                continue
            if nxt == "\\":
                out.append(re.escape("\\"))
                i += 2
                continue
        out.append(re.escape(pat[i]))
        i += 1
    return "".join(out)


_unit = st.one_of(
    st.sampled_from(["\\c", "\\d", "\\n", "\\a", "\\A"]),
    st.text(alphabet="abcz09.-$", min_size=1, max_size=1),
)


@settings(max_examples=40, deadline=None)
@given(
    units=st.lists(_unit, min_size=1, max_size=5),
    reps=st.lists(st.booleans(), min_size=5, max_size=5),
    probe=st.text(alphabet="abczABZ09.-$ ", min_size=0, max_size=8),
)
def test_pattern_dawg_matches_regex_semantics(units, reps, probe):
    """Differential property: PatternDawg.accepts == the equivalent
    anchored regex over arbitrary probe strings."""
    from tesseract_spark.lstm.dawg import PatternDawg

    pat = "".join(
        u + ("\\*" if rep else "") for u, rep in zip(units, reps)
    )
    charset = "abczABZ09.-$ "
    dawg = PatternDawg(charset, [pat])
    rx = re.compile("^" + _pattern_to_regex(pat) + "$")
    if " " in probe or any(c not in charset for c in probe):
        return  # out-of-charset probes are rejected by definition
    expected = bool(rx.match(probe)) and len(probe) > 0
    assert dawg.accepts(probe) == expected, (pat, probe)


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=8),
        min_size=1,
        max_size=20,
    )
)
def test_dawg_roundtrip_property(words):
    """dawg_test.cc:85-89 as a property: wordlist -> dawg -> wordlist."""
    from tesseract_spark.lstm.dawg import Dawg

    d = Dawg("abcdef ", words)
    assert d.all_words() == sorted(set(words))


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdef 01.,!x", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=0, max_value=30),
)
def test_bpe_encode_lossless_property(texts, n_merges):
    """BPE encoding is lossless over the pre-tokenized text for ANY
    learned merge table, and merges never increase the token count."""
    from tesseract_spark.functions import bpe

    counts: dict[str, int] = {}
    for t in texts:
        for w in bpe.pretokenize(t):
            counts[w] = counts.get(w, 0) + 1
    merges = bpe.learn_bpe(counts, n_merges)
    ranks = bpe.merges_to_ranks(merges)
    for t in texts:
        toks = bpe.encode_text(t, ranks)
        assert "".join(toks) == "".join(bpe.pretokenize(t))
        assert len(toks) <= len(bpe.encode_text(t, {}))
