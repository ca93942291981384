"""Deterministic procedural bitmap font + line renderer.

FIXTURES.md §5 calls for a fixed bitmap font embedded as numpy arrays.  We
generate it procedurally (seed=42, pure numpy) instead of hand-drawing ~70
glyphs: each glyph is a connected random-walk stroke pattern confined to the
typographically correct band, so layout operators see real ascenders,
descenders, x-height, baselines and stroke widths:

- cell height 16, baseline at row 12 (top-down)
- x-height band: rows 4..12 (x_height = 8)
- ascender glyphs (capitals, digits, b d f h k l t, most punctuation) extend
  to row 0; descender glyphs (g j p q y) extend to row 16
- inter-glyph kerning 1 px, word gap 6 px (FIXTURES.md: kern=1, space=6)

Every glyph is a single connected component (the reference's C_BLOB unit,
src/ccstruct/stepblob.h:35), glyphs are pairwise distinct, and rendering is
exact and deterministic — the golden text of any rendered image is known by
construction.
"""

from __future__ import annotations

import numpy as np

CELL_H = 16
BASELINE = 12  # rows 0..11 above baseline (top-down), 12..15 descender zone
XHEIGHT_TOP = 4  # x-height band rows 4..11
KERN = 1
WORD_GAP = 6
FONT_SEED = 42

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGITS = "0123456789"
PUNCT = ".,;:!?'\"()-"
CHARSET = LOWER + UPPER + DIGITS + PUNCT
# RTL fixture alphabet (12 Hebrew letters) for the bidi/RTL goldens
# (layout_test.cc:214 HebrewOrderingAndSkew analogue).  Rendered by the
# same procedural generator; NOT part of the default template net's
# charset — recognition uses an extended net (templates.get_net_rtl).
RTL_CHARSET = "אבגדהוזחטיכל"
# math fixture alphabet for equation-region detection (equationdetect.cpp;
# the 'equ' traineddata analogue) — same deal as RTL_CHARSET: rendered by
# the font, recognized only by the extended net (templates.get_net_math)
MATH_CHARSET = "=+<>/^"

_ASCENDERS = set("bdfhklt") | set(UPPER) | set(DIGITS) | set("!?'\"()")
_DESCENDERS = set("gjpqy")


def _glyph_band(ch: str) -> tuple[int, int]:
    """(top_row, bottom_row) of the ink band for a glyph, top-down coords."""
    top = 0 if ch in _ASCENDERS else XHEIGHT_TOP
    bot = CELL_H if ch in _DESCENDERS else BASELINE
    if ch in ".,":
        top = BASELINE - 3  # small marks sit at the baseline
    return top, bot


def _make_glyph(ch: str, attempt: int = 0) -> np.ndarray:
    """Connected random-walk glyph in its band. Deterministic per (ch, attempt)."""
    top, bot = _glyph_band(ch)
    width = 4 if ch in ".,;:'" else 7 + (ord(ch) % 3)  # 7..9 px wide
    rng = np.random.default_rng((FONT_SEED, ord(ch), attempt))
    g = np.zeros((CELL_H, width), dtype=bool)
    band_h = bot - top
    # vertical stem for stroke-width realism
    stem_x = int(rng.integers(0, width))
    g[top:bot, stem_x] = True
    # connected random walk seeded on the stem
    y, x = int(rng.integers(top, bot)), stem_x
    steps = 3 * band_h + 2 * width
    for _ in range(steps):
        g[y, x] = True
        dy, dx = rng.integers(-1, 2), rng.integers(-1, 2)
        y = int(np.clip(y + dy, top, bot - 1))
        x = int(np.clip(x + dx, 0, width - 1))
    # guarantee full width usage so bbox width is stable
    g[top + band_h // 2, :] |= rng.random(width) < 0.6
    g[top + band_h // 2, 0] = g[top + band_h // 2, width - 1] = True
    return g


def _connected(g: np.ndarray) -> bool:
    from .image_ops import label_components

    _, n = label_components(g, connectivity=8)
    return n == 1


def _build_font() -> dict[str, np.ndarray]:
    font: dict[str, np.ndarray] = {}
    seen: set[bytes] = set()
    # base charset first so its glyphs are byte-identical with or without
    # the RTL extension (the seen-set retry path depends on build order)
    for ch in CHARSET + RTL_CHARSET + MATH_CHARSET:
        attempt = 0
        while True:
            g = _make_glyph(ch, attempt)
            key = g.tobytes() + bytes([g.shape[1]])
            if _connected(g) and key not in seen:
                break
            attempt += 1
        seen.add(key)
        font[ch] = g
    return font


_FONT: dict[str, np.ndarray] | None = None


def get_font() -> dict[str, np.ndarray]:
    global _FONT
    if _FONT is None:
        _FONT = _build_font()
    return _FONT


def glyph_width(ch: str) -> int:
    return get_font()[ch].shape[1]


def text_ink_width(text: str, scale: int = 1) -> int:
    """Pixel width of a rendered line (no margins)."""
    w = 0
    for i, ch in enumerate(text):
        if ch == " ":
            w += WORD_GAP
        else:
            w += glyph_width(ch) + (KERN if i + 1 < len(text) and text[i + 1] != " " else 0)
    return w * scale


def render_line(text: str, scale: int = 1) -> np.ndarray:
    """Render one text line to a bool ink mask [CELL_H*scale, W]."""
    font = get_font()
    cols: list[np.ndarray] = []
    for i, ch in enumerate(text):
        if ch == " ":
            cols.append(np.zeros((CELL_H, WORD_GAP), dtype=bool))
            continue
        if ch not in font:
            ch = "?"
        cols.append(font[ch])
        if i + 1 < len(text) and text[i + 1] != " ":
            cols.append(np.zeros((CELL_H, KERN), dtype=bool))
    mask = np.concatenate(cols, axis=1) if cols else np.zeros((CELL_H, 1), dtype=bool)
    if scale > 1:
        mask = np.kron(mask, np.ones((scale, scale), dtype=bool))
    return mask


def mask_to_gray(mask: np.ndarray, fg: int = 20, bg: int = 235) -> np.ndarray:
    """Ink mask -> uint8 grayscale page (dark-on-light)."""
    img = np.full(mask.shape, bg, dtype=np.uint8)
    img[mask] = fg
    return img
