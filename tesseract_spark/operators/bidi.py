"""Bidirectional reading order for words within a line — exact port.

Re-expresses ``ResultIterator::CalculateTextlineOrder``
(src/ccmain/resultiterator.cpp:284-364): given per-word strong script
directions (L / R / N / M), produce the output walk for the line under a
paragraph-level base direction, including the reference's meta-markers
(kMinorRunStart / kMinorRunEnd / kComplexWord) and its special rule for
trailing neutrals after an LTR run in an RTL paragraph
(resultiterator.cpp:308-334).

Also ports:
- ``LTRResultIterator::WordDirection`` (ltrresultiterator.cpp:207-223):
  word direction from the presence of RTL/LTR strong characters;
- ``ResultIterator::AppendSuffixMarks`` (resultiterator.cpp:407-445):
  Unicode direction marks (LRM/RLM) appended after minor runs and complex
  words when assembling line text.
"""

from __future__ import annotations

# meta-markers (resultiterator.h kMinorRunStart/kMinorRunEnd/kComplexWord)
MINOR_RUN_START = -1
MINOR_RUN_END = -2
COMPLEX_WORD = -3

LRM = "\u200e"  # LEFT-TO-RIGHT MARK
RLM = "\u200f"  # RIGHT-TO-LEFT MARK

# strong-RTL codepoint ranges (Hebrew, Arabic, Syriac, Thaana + presentation
# forms) — the unicharset direction property of the reference
_RTL_RANGES = (
    (0x0590, 0x08FF),
    (0xFB1D, 0xFDFF),
    (0xFE70, 0xFEFF),
)


def char_is_rtl(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _RTL_RANGES)


def char_is_ltr(ch: str) -> bool:
    # strong LTR: letters outside the RTL ranges (digits and punctuation
    # are neutral, matching unicharset's direction classes)
    return ch.isalpha() and not char_is_rtl(ch)


def word_direction(word: str) -> str:
    """WordDirection (ltrresultiterator.cpp:207-223): 'L'/'R'/'N'/'M'."""
    has_rtl = any(char_is_rtl(c) for c in word)
    has_ltr = any(char_is_ltr(c) for c in word)
    if has_rtl and not has_ltr:
        return "R"
    if has_ltr and not has_rtl:
        return "L"
    if not has_ltr and not has_rtl:
        return "N"
    return "M"


def resolve_directions(dirs: list[str], base_rtl: bool) -> list[str]:
    """Resolve 'N' (neutral) entries to 'L'/'R' run directions (helper for
    direction-run statistics; the order walk itself consumes raw dirs)."""
    out = []
    for i, d in enumerate(dirs):
        if d != "N":
            out.append(d)
            continue
        prev = next((x for x in reversed(out) if x != "N"), None)
        nxt = next((x for x in dirs[i + 1 :] if x != "N"), None)
        if prev and nxt and prev == nxt:
            out.append(prev)
        else:
            out.append("R" if base_rtl else "L")
    return out


def textline_order_marked(
    word_dirs: list[str], paragraph_is_ltr: bool
) -> list[int]:
    """CalculateTextlineOrder (resultiterator.cpp:284-364), exact: the
    emission walk with MINOR_RUN_START/END and COMPLEX_WORD markers."""
    ro: list[int] = []
    n = len(word_dirs)
    if n == 0:
        return ro
    if paragraph_is_ltr:
        start, end, step = 0, n, 1
        major, minor = "L", "R"
    else:
        start, end, step = n - 1, -1, -1
        major, minor = "R", "L"
        # Special rule (resultiterator.cpp:308-334): trailing neutrals
        # adjacent to an LTR word read as one LTR sequence at line end.
        if word_dirs[start] == "N":
            neutral_end = start
            while neutral_end > 0 and word_dirs[neutral_end] == "N":
                neutral_end -= 1
            if neutral_end >= 0 and word_dirs[neutral_end] == "L":
                left = neutral_end
                i = left
                while i >= 0 and word_dirs[i] != "R":
                    if word_dirs[i] == "L":
                        left = i
                    i -= 1
                ro.append(MINOR_RUN_START)
                for i in range(left, n):
                    ro.append(i)
                    if word_dirs[i] == "M":
                        ro.append(COMPLEX_WORD)
                ro.append(MINOR_RUN_END)
                start = left - 1
    i = start
    while i != end:
        if word_dirs[i] == minor:
            j = i
            while j != end and word_dirs[j] != major:
                j += step
            if j == end:
                j -= step
            while j != i and word_dirs[j] != minor:
                j -= step
            # [j..i] is a minor-direction run, emitted reversed
            ro.append(MINOR_RUN_START)
            k = j
            while k != i:
                ro.append(k)
                k -= step
            ro.append(i)
            ro.append(MINOR_RUN_END)
            i = j + step
        else:
            ro.append(i)
            if word_dirs[i] == "M":
                ro.append(COMPLEX_WORD)
            i += step
    return ro


def textline_order(dirs: list[str], base_rtl: bool) -> list[int]:
    """Output permutation of word indices (markers stripped)."""
    return [i for i in textline_order_marked(dirs, not base_rtl) if i >= 0]


def render_line_text(
    words: list[str], dirs: list[str], paragraph_is_ltr: bool
) -> str:
    """Assemble one line's text in bidi reading order with suffix marks.

    AppendSuffixMarks (resultiterator.cpp:407-445): after the last word of
    a minor run, append the paragraph direction's mark; after a complex
    (mixed-direction) word, append the current reading direction's mark.
    Words given in visual left-to-right order; RTL words' characters are
    reversed to logical order (the reference's CalculateBlobOrder walk,
    resultiterator.cpp:376-395, reads an RTL word's symbols right-to-left).
    """
    marked = textline_order_marked(dirs, paragraph_is_ltr)
    tokens: list[str] = []
    in_minor = False
    idx = 0
    while idx < len(marked):
        m = marked[idx]
        if m == MINOR_RUN_START:
            in_minor = True
            idx += 1
            continue
        if m == MINOR_RUN_END:
            in_minor = False
            if tokens:
                tokens[-1] += LRM if paragraph_is_ltr else RLM
            idx += 1
            continue
        if m == COMPLEX_WORD:
            reading_ltr = paragraph_is_ltr ^ in_minor
            if tokens:
                tokens[-1] += LRM if reading_ltr else RLM
            idx += 1
            continue
        w = words[m]
        if dirs[m] == "R":
            w = w[::-1]  # visual -> logical symbol order for RTL words
        tokens.append(w)
        idx += 1
    return " ".join(tokens)
