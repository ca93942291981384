"""PSM_CIRCLE_WORD: remove an enclosing circle, then OCR the word.

Numpy re-expression of RemoveEnclosingCircle
(src/ccmain/pagesegmain.cpp:56-94): flood-fill the exterior from the
border to get the inside-the-circle mask, then iteratively erode that
mask and keep the masked ink whose 8-connected component count first
reaches its minimum after rising — the erosion step where the ring is
gone but the glyphs are still intact (kMaxCircleErosions = 8).
"""

from __future__ import annotations

import numpy as np

from ..functions.image_ops import binarize_otsu, label_components

K_MAX_CIRCLE_EROSIONS = 8  # pagesegmain.cpp:54


def _exterior(ink: np.ndarray) -> np.ndarray:
    """Background region 4-connected to the border (the flood fill
    pixSeedfillBinary performs)."""
    bg = ~ink
    labels, _n = label_components(bg, connectivity=4)
    border = np.concatenate(
        [labels[0], labels[-1], labels[:, 0], labels[:, -1]]
    )
    ext_labels = np.unique(border[border > 0])
    return np.isin(labels, ext_labels)


def _erode3(mask: np.ndarray) -> np.ndarray:
    """3x3 binary erosion (pixErodeBrick 3,3)."""
    p = np.pad(mask, 1, constant_values=False)
    out = p[1:-1, 1:-1].copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out &= p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
    return out


def remove_enclosing_circle(ink: np.ndarray) -> np.ndarray | None:
    """Best de-circled ink mask, or None if no improvement was found.

    Divergence from the reference loop (documented): the reference saves
    a candidate only after the count rises then falls, and breaks on the
    first plateau — which misses 1-px rings (gone at the first erosion,
    never saved) and thick rings (count plateaus before the drop, early
    break).  Here a step is saved whenever it strictly improves on the
    best count so far (plateaus before any save keep scanning), and the
    scan STOPS at the first non-improving step after a save — continuing
    past it would let over-erosion that clips whole glyphs produce a
    strictly smaller count and win.  Like the reference, a circle-free
    image "will most likely get badly mangled" (pagesegmain.cpp:58) —
    recognize_circle_word falls back to the raw image when the cleaned
    one yields nothing.
    """
    inside = ~_exterior(ink)
    _l, initial = label_components(ink & inside)
    best: np.ndarray | None = None
    best_count = initial
    for _i in range(1, K_MAX_CIRCLE_EROSIONS + 1):
        inside = _erode3(inside)
        t = ink & inside
        _l, count = label_components(t)
        if 0 < count < best_count:
            best_count = count
            best = t.copy()
        elif best is not None:
            break  # passed the best (ring gone; further erosion clips glyphs)
    return best


def recognize_circle_word(gray: np.ndarray, dpi: int = 300, dawg=None):
    """PSM_CIRCLE_WORD end-to-end: binarize, strip the enclosing circle,
    recognize what remains (pagesegmain.cpp:150-158; falls back to the
    raw image when circle removal finds nothing, like the reference)."""
    from ..functions.fonts import mask_to_gray
    from .recognize import recognize_page

    ink = binarize_otsu(gray)
    cleaned = remove_enclosing_circle(ink)
    if cleaned is not None and cleaned.any():
        spans, layout = recognize_page(mask_to_gray(cleaned), dpi, dawg)
        if any(s.kind == "text" and s.text for s in spans):
            return spans, layout
    return recognize_page(gray, dpi, dawg)
