"""Equation-region detection (display + inline).

Re-expresses the decision core of ``EquationDetect``
(src/ccmain/equationdetect.cpp) over decoded text instead of blob-level
classifier outputs: the reference labels blobs BSTT_MATH/BSTT_DIGIT via
the 'equ' language pack (LabelSpecialText, equationdetect.cpp:129-215),
then seeds equation partitions by blob-count and math-density thresholds
and types them PT_EQUATION / PT_INLINE_EQUATION (publictypes.h:51-67).
Our engine knows the decoded glyph per blob, so the same counts are taken
over characters:

- seed gate (CheckSeedBlobsCount, equationdetect.cpp:942-957):
  >= kSeedBlobsCountTh glyphs, > kSeedMathBlobsCount math glyphs,
  math+digit > kSeedMathDigitBlobsCount;
- density gate (CheckSeedDensity, equationdetect.cpp:959-974):
  math+digit density > kMathDigitDensityTh1;
- a math-dense partition with same-line text neighbours stays inline
  (PT_INLINE_EQUATION, equationdetect.cpp:805-820) — here: a math-dense
  word inside a line of ordinary words.

The indentation / alignment refinements (IsIndented,
equationdetect.cpp:976-1040) are geometric tie-breakers the fixture
pages don't need; simplification documented.
"""

from __future__ import annotations

from ..functions.fonts import MATH_CHARSET

MATH_CHARS = frozenset(MATH_CHARSET)

K_MATH_DIGIT_DENSITY_TH1 = 0.25  # equationdetect.cpp:78
K_SEED_BLOBS_COUNT_TH = 10  # equationdetect.cpp:82
K_SEED_MATH_BLOBS_COUNT = 2  # equationdetect.cpp:946
K_SEED_MATH_DIGIT_BLOBS_COUNT = 5  # equationdetect.cpp:947


def _counts(text: str) -> tuple[int, int, int]:
    glyphs = [c for c in text if not c.isspace()]
    math = sum(1 for c in glyphs if c in MATH_CHARS)
    digit = sum(1 for c in glyphs if c.isdigit())
    return len(glyphs), math, digit


def is_equation_text(text: str) -> bool:
    """Display-equation seed test over one partition's decoded text
    (CheckSeedBlobsCount + CheckSeedDensity with kMathDigitDensityTh1)."""
    n, math, digit = _counts(text)
    if (
        n < K_SEED_BLOBS_COUNT_TH
        or math <= K_SEED_MATH_BLOBS_COUNT
        or math + digit <= K_SEED_MATH_DIGIT_BLOBS_COUNT
    ):
        return False
    return (math + digit) / n > K_MATH_DIGIT_DENSITY_TH1


def inline_equation_words(words: list[str]) -> list[int]:
    """Indices of inline-equation words: math-dense tokens embedded in a
    line that is NOT itself an equation (PT_INLINE_EQUATION,
    equationdetect.cpp:805-820 — a math partition with same-line text
    neighbours keeps the text flow)."""
    if is_equation_text(" ".join(words)):
        return []  # the whole line is a display equation
    out = []
    for i, w in enumerate(words):
        n, math, digit = _counts(w)
        if n >= 3 and math >= 1 and (math + digit) / n > 0.5:
            out.append(i)
    return out
