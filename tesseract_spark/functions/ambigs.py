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
