"""Text normalization for training-data pipelines — normstrngs analogue.

Re-expresses the reference's UTF-8 normalization utilities
(src/training/unicharset/normstrngs.cpp) as Spark column expressions.
Everything in the hot path is a JVM-side ``translate``/``regexp_replace``
chain — no Python touches the data; the only Python here builds the
character tables once on the driver.

Reference semantics covered:

- ``OCRNormalize`` (normstrngs.cpp:215-224): collapse the ambiguous
  punctuation families — every Unicode hyphen/dash variant to ``-``
  (normstrngs.cpp:37-61 kHyphenPuncUnicodes), every single-quote variant
  to ``'`` (normstrngs.cpp:64-82), every double-quote variant to ``"``
  (normstrngs.cpp:84-102).
- zero-width mark skipping (normstrngs.cpp:128-131 via
  validator.h:89-92 IsZeroWidthMark): ZWSP U+200B, LRM U+200E,
  RLM U+200F, replacement char U+FFFD are always dropped.
- ``StripJoiners`` (normstrngs.cpp:141-155): ZWJ/ZWNJ are removed from
  strings that contain NO letters (a lonely joiner run around a ``+`` is
  noise); strings with letters keep their joiners (they are meaningful
  in Arabic/Indic shaping — unittest/normstrngs_test.cc:166
  JoinersStayInArabic).
- ``FullwidthToHalfwidth`` (normstrngs.cpp:289-310): the FF01-FF5E
  fullwidth ASCII block maps to ASCII 21-7E, ideographic space U+3000 to
  space, and the white-parentheses special cases FF5F/FF60 to
  U+2985/U+2986.
- ``IsInterchangeValid`` (normstrngs.cpp:268-281): C0/C1 control codes
  (other than HT LF FF CR) and the BMP noncharacter ranges are invalid;
  ``interchange_clean`` removes them.
- full NFC/NFKC/NFD/NFKD (``NormalizeUTF8String``,
  normstrngs.cpp:105-170) needs a real Unicode normalizer; the
  vectorized pandas path (`normalize_series`) supplies it for UDF
  contexts and tests, mirroring the reference's ICU call with
  ``unicodedata``.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# normstrngs.cpp:37-61 — every hyphen-punctuation codepoint OCR-normalizes
# to ASCII '-'
HYPHEN_PUNC = (
    "-‐‑‒–—―⁻₋−"
    "﹘﹣－⸗"
)
# normstrngs.cpp:64-82
SINGLE_QUOTE = "'`‘’‚‛′「＇"
# normstrngs.cpp:84-102
DOUBLE_QUOTE = '"“”‟″„〝〞＂'

# validator.cpp:20-25 — marks IsZeroWidthMark always skips
ZERO_WIDTH_MARKS = "​‎‏�"
# validator.cpp:21-22 — joiners StripJoiners removes from letterless text
JOINERS = "‌‍"

_OCR_FROM = HYPHEN_PUNC + SINGLE_QUOTE + DOUBLE_QUOTE
_OCR_TO = "-" * len(HYPHEN_PUNC) + "'" * len(SINGLE_QUOTE) + '"' * len(DOUBLE_QUOTE)

# normstrngs.cpp:289-310 — fullwidth ASCII block + ideographic space +
# the two white-parenthesis special cases
_FW_FROM = (
    "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　｟｠"
)
_FW_TO = (
    "".join(chr(c) for c in range(0x21, 0x7F)) + " ⦅⦆"
)

# normstrngs.cpp:268-281 — C0 minus HT/LF/FF/CR, DEL, C1, BMP noncharacters
_INTERCHANGE_INVALID_RE = (
    "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f-\\x9f\\ufdd0-\\ufdef\\ufffe\\uffff]"
)


def ocr_normalize(col: Column) -> Column:
    """OCRNormalize over a string column (normstrngs.cpp:215-224)."""
    return F.translate(col, _OCR_FROM, _OCR_TO)


def strip_zero_width(col: Column) -> Column:
    """Drop the always-skipped zero-width marks (normstrngs.cpp:128-131)."""
    return F.translate(col, ZERO_WIDTH_MARKS, "")


def strip_joiners_nonletter(col: Column) -> Column:
    """StripJoiners (normstrngs.cpp:141-155): remove ZWJ/ZWNJ only when
    the string contains no letters; shaping joiners in real words stay."""
    return F.when(col.rlike(r"\p{L}"), col).otherwise(
        F.translate(col, JOINERS, "")
    )


def fullwidth_to_halfwidth(col: Column) -> Column:
    """FullwidthToHalfwidth over a string column (normstrngs.cpp:289-310)."""
    return F.translate(col, _FW_FROM, _FW_TO)


def interchange_clean(col: Column) -> Column:
    """Remove non-interchange-valid codepoints (normstrngs.cpp:268-281).

    BMP-only: the astral noncharacter planes (1FFFE... etc.) are outside
    what a Java regex char class addresses cheaply and never occur in
    text corpora; documented divergence."""
    return F.regexp_replace(col, _INTERCHANGE_INVALID_RE, "")


def normalize_col(col: Column, ocr: bool = True) -> Column:
    """The composed column pipeline used by the ``text_normalize`` query:
    zero-width strip -> OCR punctuation collapse -> fullwidth fold ->
    interchange cleanup -> letterless-joiner strip.

    This is the pure-JVM subset of NormalizeUTF8String
    (normstrngs.cpp:158-170): canonical recomposition (NFC/NFKC) is a
    no-op on already-composed corpus text and lives in
    ``normalize_series`` for the UDF contexts that need it.
    """
    out = strip_zero_width(col)
    if ocr:
        out = ocr_normalize(out)
    out = fullwidth_to_halfwidth(out)
    out = interchange_clean(out)
    return strip_joiners_nonletter(out)


# ---------------------------------------------------------------------------
# vectorized pandas path — full Unicode normal forms for UDF contexts


_PY_OCR_TABLE = {ord(c): t for c, t in zip(_OCR_FROM, _OCR_TO)}
_PY_FW_TABLE = {ord(c): t for c, t in zip(_FW_FROM, _FW_TO)}
_PY_ZW_TABLE = {ord(c): None for c in ZERO_WIDTH_MARKS}
_PY_JOINER_TABLE = {ord(c): None for c in JOINERS}


def normalize_text(
    text: str, u_mode: str = "nfkc", ocr: bool = True
) -> str:
    """NormalizeUTF8String for one string (normstrngs.cpp:105-170):
    Unicode normal form, zero-width skip, optional OCRNormalize,
    letterless-joiner strip.  u_mode in {nfc, nfkc, nfd, nfkd, none}."""
    if u_mode != "none":
        text = unicodedata.normalize(u_mode.upper(), text)
    text = text.translate(_PY_ZW_TABLE)
    if ocr:
        text = text.translate(_PY_OCR_TABLE)
    if not any(ch.isalpha() for ch in text):
        text = text.translate(_PY_JOINER_TABLE)
    return text


def normalize_series(
    s: pd.Series, u_mode: str = "nfkc", ocr: bool = True
) -> pd.Series:
    """Arrow-batch version of normalize_text for mapInPandas consumers."""
    return s.map(lambda t: normalize_text(t, u_mode=u_mode, ocr=ocr))
