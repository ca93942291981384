"""Box-file source + truth-box/blob alignment (the training-data path).

- Box file format (src/ccstruct/boxread.cpp:100-191 ReadAllBoxes /
  ParseBoxFileStr): one ``<utf8> left bottom right top page`` record per
  line, y coordinates BOTTOM-UP; MakeBoxFileStr writes the same form.
- Alignment (ApplyBoxes, src/ccmain/applybox.cpp:110-260): each truth box
  claims the connected components whose centers it contains; claimed
  glyph bitmaps + labels become training samples, unclaimed boxes and
  stray blobs are reported (the reference's box-failure accounting).

This is what turns a scanned page + .box file into labeled glyph
bitmaps — the corpus-construction step for the adaptive templates and
any recognizer training.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.image_ops import binarize_otsu, label_and_stats


@dataclass
class TruthBox:
    ch: str
    left: int
    top: int  # top-down page coords (converted from the file's bottom-up)
    right: int
    bottom: int
    page: int = 0


def parse_box_file(text: str, page_height: int) -> list[TruthBox]:
    """Parse .box content; flips the file's bottom-up y to top-down."""
    out: list[TruthBox] = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) < 5:
            continue  # format error: skipped like boxread.cpp:185
        ch = parts[0]
        try:
            l, b_bu, r, t_bu = (int(p) for p in parts[1:5])
            page = int(parts[5]) if len(parts) > 5 else 0
        except ValueError:
            continue
        out.append(
            TruthBox(ch, l, page_height - t_bu, r, page_height - b_bu, page)
        )
    return out


def make_box_file(boxes: list[TruthBox], page_height: int) -> str:
    """MakeBoxFileStr inverse of parse_box_file (top-down -> bottom-up)."""
    return "\n".join(
        f"{b.ch} {b.left} {page_height - b.bottom} {b.right} "
        f"{page_height - b.top} {b.page}"
        for b in boxes
    )


@dataclass
class AlignedSample:
    ch: str
    bitmap: np.ndarray  # bool crop of the claimed ink
    bbox: tuple[int, int, int, int]  # l, t, r, b of the claimed blobs
    n_blobs: int


def align_boxes_to_blobs(
    gray: np.ndarray, boxes: list[TruthBox]
) -> tuple[list[AlignedSample], list[TruthBox], int]:
    """ApplyBoxes core: claim blobs by center containment.

    Returns (samples, failed_boxes, n_unclaimed_blobs).  A box with no
    claimed blob is a failure (applybox's "FAILURE! box overlaps no
    blobs" report); blobs claimed by no box are counted as strays.
    """
    ink = binarize_otsu(gray)
    _labels, n, stats = label_and_stats(ink)
    if n == 0:
        return [], list(boxes), 0
    cx = (stats[:, 0] + stats[:, 2]) / 2.0
    cy = (stats[:, 1] + stats[:, 3]) / 2.0
    claimed = np.zeros(n, dtype=bool)
    samples: list[AlignedSample] = []
    failed: list[TruthBox] = []
    for box in boxes:
        sel = (
            (cx >= box.left)
            & (cx < box.right)
            & (cy >= box.top)
            & (cy < box.bottom)
            & ~claimed
        )
        idxs = np.flatnonzero(sel)
        if len(idxs) == 0:
            failed.append(box)
            continue
        claimed[idxs] = True
        l = int(stats[idxs, 0].min())
        t = int(stats[idxs, 1].min())
        r = int(stats[idxs, 2].max())
        b = int(stats[idxs, 3].max())
        samples.append(
            AlignedSample(
                ch=box.ch,
                bitmap=ink[t:b, l:r].copy(),
                bbox=(l, t, r, b),
                n_blobs=int(len(idxs)),
            )
        )
    return samples, failed, int((~claimed).sum())
