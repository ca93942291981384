"""Ambiguity substitution — the unicharambigs post-decode rewrite.

Re-expresses ``src/ccutil/ambigs.cpp``: a replacement table of character
sequences that the engine may confuse, applied to decoded text when the
replacement produces a dictionary word (the "safe to do" ambiguity class).
Spark-side the table is a broadcast list applied with JVM string functions;
inside UDFs it is this pure function.
"""

from __future__ import annotations

from ..lstm.dawg import Dawg

# (wrong, right) sequences, the classic confusions the reference ships in
# its unicharambigs files (digit/letter and rn/m style)
DEFAULT_AMBIGS: tuple[tuple[str, str], ...] = (
    ("rn", "m"),
    ("vv", "w"),
    ("1l", "ll"),
    ("0", "o"),
    ("1", "l"),
    ("5", "s"),
)


def apply_ambigs(
    text: str, dawg: Dawg, table: tuple[tuple[str, str], ...] = DEFAULT_AMBIGS
) -> str:
    """Rewrite each word iff a single substitution turns a non-dict word
    into a dict word (the mandatory/safe ambig semantics of ambigs.cpp)."""
    words = text.split(" ")
    out = []
    for w in words:
        if not w or dawg.accepts(w):
            out.append(w)
            continue
        fixed = w
        for wrong, right in table:
            # try each occurrence separately (a single substitution must
            # already yield a dict word — ambigs.cpp applies minimal edits)
            start = w.find(wrong)
            while start >= 0 and fixed is w:
                cand = w[:start] + right + w[start + len(wrong) :]
                if dawg.accepts(cand):
                    fixed = cand
                start = w.find(wrong, start + 1)
            if fixed is not w:
                break
        out.append(fixed)
    return " ".join(out)


def ambiguous_words(
    wordlist: list[str],
    dawg: "Dawg",
    table: tuple[tuple[str, str], ...] = DEFAULT_AMBIGS,
) -> list[tuple[str, str]]:
    """The ambiguous_words training tool
    (src/training/ambiguous_words.cpp:24-65): for each word, list the
    single-substitution ambiguity variants that are ALSO dictionary
    words — the pairs a language pack author reviews before shipping a
    unicharambigs file.  Returns sorted (word, variant) pairs.

    Both directions of each table entry are probed (the tool walks the
    full ambig table; our DEFAULT_AMBIGS stores one canonical direction
    per confusion)."""
    pairs: set[tuple[str, str]] = set()
    for w in wordlist:
        for wrong, right in table:
            for a, b in ((wrong, right), (right, wrong)):
                start = 0
                while True:
                    i = w.find(a, start)
                    if i < 0:
                        break
                    v = w[:i] + b + w[i + len(a):]
                    if v != w and dawg.accepts(v):
                        pairs.add((w, v))
                    start = i + 1
    return sorted(pairs)


def has_dangerous_ambig(
    word: str,
    dawg: "Dawg",
    table: tuple[tuple[str, str], ...] = DEFAULT_AMBIGS,
) -> bool:
    """NoDangerousAmbig's veto input (stopper.cpp:158-300 inverted
    sense): the read is DANGEROUS when some single table substitution
    (either direction — the reference's table carries both as separate
    entries) turns it into a DIFFERENT valid dictionary word, i.e. the
    classifier output is ambiguous between two plausible words and the
    stopper must not mark it done on certainty alone."""
    for wrong, right in table:
        for a, b in ((wrong, right), (right, wrong)):
            start = 0
            while True:
                i = word.find(a, start)
                if i < 0:
                    break
                v = word[:i] + b + word[i + len(a):]
                if v != word and dawg.accepts(v):
                    return True
                start = i + 1
    return False
