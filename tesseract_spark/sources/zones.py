"""UNLV zone-file (.uzn) source — restrict OCR to caller-given page zones.

The reference reads `<basename>.uzn` when `tessedit_pageseg_mode ==
PSM_SINGLE_COLUMN`-style zoned runs are requested: each line is
``x y width height label`` in TOP-DOWN image coordinates, and every zone
becomes one BLOCK (read_unlv_file, src/ccstruct/blread.cpp:36-65; the
reference flips to its bottom-up TBOX as ``(x, ysize-y-h) .. (x+w, ysize-y)``
— this engine is top-down numpy throughout, so boxes stay top-down).

Spark shape: zones ride along as an ``array<struct<left,top,right,bottom>>``
column next to the media bytes; the page UDF crops each zone and runs the
normal layout+recognition stages per zone, emitting blocks in zone order
(the reference's block list preserves .uzn line order).
"""

from __future__ import annotations

import numpy as np


def parse_uzn(text: str) -> list[tuple[int, int, int, int]]:
    """Parse .uzn content to top-down (left, top, right, bottom) boxes.

    Mirrors the reference's ``tfscanf("%d %d %d %d %*s")`` loop
    (blread.cpp:53): four leading integers per line, trailing label
    ignored, malformed lines stop the scan (tfscanf returns < 4).
    """
    zones: list[tuple[int, int, int, int]] = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) < 4:
            break
        try:
            x, y, w, h = (int(p) for p in parts[:4])
        except ValueError:
            break
        zones.append((x, y, x + w, y + h))
    return zones


def full_page_zone(width: int, height: int) -> list[tuple[int, int, int, int]]:
    """FullPageBlock (blread.cpp:67-71): the no-uzn fallback block."""
    return [(0, 0, width, height)]


def recognize_zones(
    gray: np.ndarray,
    zones: list[tuple[int, int, int, int]],
    dpi: int = 300,
    dawg=None,
):
    """OCR each zone independently and emit spans + words in zone order.

    Each zone is cropped, run through the full page pipeline, and its word
    boxes are shifted back into page coordinates; block numbering restarts
    per zone so ``block_num`` equals the 1-based .uzn line number.
    """
    from ..operators.recognize import WordRec, recognize_page_detail

    h, w = gray.shape
    all_spans = []
    all_words: list[WordRec] = []
    for zi, (l, t, r, b) in enumerate(zones):
        l, t = max(0, l), max(0, t)
        r, b = min(w, r), min(h, b)
        if r <= l or b <= t:
            continue
        spans, words, _layout = recognize_page_detail(gray[t:b, l:r], dpi, dawg)
        all_spans.extend(spans)
        for wd in words:
            all_words.append(
                WordRec(
                    block_num=zi + 1,
                    par_num=wd.par_num,
                    line_num=wd.line_num,
                    word_num=wd.word_num,
                    left=wd.left + l,
                    top=wd.top + t,
                    width=wd.width,
                    height=wd.height,
                    conf=wd.conf,
                    text=wd.text,
                    permuter=wd.permuter,
                    rating=wd.rating,
                    certainty=wd.certainty,
                )
            )
    return all_spans, all_words


def recognize_rect(
    gray: np.ndarray,
    left: int,
    top: int,
    width: int,
    height: int,
    dpi: int = 300,
    dawg=None,
):
    """Sub-rectangle OCR — SetRectangle (baseapi.cpp:619-631): restrict
    recognition to one region of an already-set image.  A single-zone
    special case of the .uzn path."""
    return recognize_zones(
        gray, [(left, top, left + width, top + height)], dpi, dawg
    )
