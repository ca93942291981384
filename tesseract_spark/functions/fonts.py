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
# Devanagari fixture alphabet (10 consonants) for the shiro-rekha
# round-trip goldens (devanagari_processing.cpp).  Each glyph carries its
# own stretch of the top bar (rows DEVA_BAR_TOP..+DEVA_BAR_H); render_line
# additionally joins the bar across intra-word kern gaps, so a rendered
# word is ONE connected component until the splitter cuts it — exactly
# the conjoined shape SplitWordShiroRekha undoes.
DEVA_CHARSET = "कखगघचछजझटठ"
DEVA_BAR_TOP = XHEIGHT_TOP  # bar rows 4..5 in the canonical cell
DEVA_BAR_H = 2

_ASCENDERS = set("bdfhklt") | set(UPPER) | set(DIGITS) | set("!?'\"()")
_DESCENDERS = set("gjpqy")


def _glyph_band(ch: str) -> tuple[int, int]:
    """(top_row, bottom_row) of the ink band for a glyph, top-down coords."""
    top = 0 if ch in _ASCENDERS else XHEIGHT_TOP
    bot = CELL_H if ch in _DESCENDERS else BASELINE
    if ch in ".,":
        top = BASELINE - 3  # small marks sit at the baseline
    return top, bot


def _make_glyph_deva(ch: str, attempt: int = 0) -> np.ndarray:
    """Devanagari fixture glyph: full-width shiro-rekha stretch (rows
    4..5), a hanger stem, and a random-walk body strictly below the bar
    (rows 7..11) with one guaranteed-full body row.  The empty row 6 gap
    (bridged only by the stem) keeps the bar band's 70%-of-peak expansion
    (GetShiroRekhaYExtents, devanagari_processing.cpp:345-375) from
    swallowing body rows, and the full body row guarantees the splitter's
    per-column scan (:286-339) never finds a false intra-glyph gap —
    together they make split(render(word)) == glyphs exact by
    construction, for ANY word over this alphabet."""
    width = 8 + (ord(ch) % 2)  # >= 8 so any 2-glyph word trips the
    # conjoined gate cw >= 2*ch of split_shiro_rekha_page
    rng = np.random.default_rng((FONT_SEED, ord(ch), attempt))
    g = np.zeros((CELL_H, width), dtype=bool)
    g[DEVA_BAR_TOP : DEVA_BAR_TOP + DEVA_BAR_H, :] = True  # bar stretch
    stem_x = int(rng.integers(0, width))
    body_top = DEVA_BAR_TOP + DEVA_BAR_H + 1  # row 7; row 6 is the gap
    g[DEVA_BAR_TOP + DEVA_BAR_H : BASELINE, stem_x] = True  # hanger stem
    y, x = int(rng.integers(body_top, BASELINE)), stem_x
    for _ in range(3 * (BASELINE - body_top) + 2 * width):
        g[y, x] = True
        dy, dx = rng.integers(-1, 2), rng.integers(-1, 2)
        y = int(np.clip(y + dy, body_top, BASELINE - 1))
        x = int(np.clip(x + dx, 0, width - 1))
    g[(body_top + BASELINE) // 2, :] = True  # full body row (row 9)
    return g


def _make_glyph(ch: str, attempt: int = 0) -> np.ndarray:
    """Connected random-walk glyph in its band. Deterministic per (ch, attempt)."""
    if ch in DEVA_CHARSET:
        return _make_glyph_deva(ch, attempt)
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
    for ch in CHARSET + RTL_CHARSET + MATH_CHARSET + DEVA_CHARSET:
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


def bold_variant(g: np.ndarray) -> np.ndarray:
    """Bold face: 1-px horizontal stroke dilation (same cell width) —
    the thicker-stroke signal trained fonts carry in the reference's
    FontInfo is_bold bit (ccstruct/fontinfo.h:114)."""
    out = g.copy()
    out[:, 1:] |= g[:, :-1]
    return out


# italic shear: rows shift right as they rise above the baseline, ~9°
# (1 px per 4 rows over the 16-row cell)
ITALIC_SHEAR_ROWS = 4


def italic_variant(g: np.ndarray) -> np.ndarray:
    """Italic face: per-row rightward shear above the cell bottom
    (FontInfo is_italic, fontinfo.h:111).  Width grows by the max
    shift so no ink is lost."""
    h, w = g.shape
    max_shift = (h - 1) // ITALIC_SHEAR_ROWS
    out = np.zeros((h, w + max_shift), dtype=bool)
    for y in range(h):
        shift = (h - 1 - y) // ITALIC_SHEAR_ROWS
        out[y, shift : shift + w] = g[y]
    # trim blank edge columns (a glyph whose ink band stops above the
    # cell bottom shears entirely off column 0): templates must start
    # with ink — match_scores candidates are glyph-START columns
    ink = np.flatnonzero(out.any(axis=0))
    return out[:, ink[0] : ink[-1] + 1]


def smallcaps_variant(g: np.ndarray) -> np.ndarray:
    """Small-caps face: an uppercase glyph resampled from the cap band
    (rows 0..BASELINE) down into the x-height band (rows
    XHEIGHT_TOP..BASELINE) — capital shapes at lowercase size, the
    WERD_RES::small_caps signal (ltrresultiterator.cpp:182)."""
    h, w = g.shape
    out = np.zeros((h, w), dtype=bool)
    src_rows = np.round(
        np.linspace(0, BASELINE - 1, BASELINE - XHEIGHT_TOP)
    ).astype(int)
    out[XHEIGHT_TOP:BASELINE] = g[src_rows]
    return out


_FONT_BOLD: dict[str, np.ndarray] | None = None
_FONT_ITALIC: dict[str, np.ndarray] | None = None
_FONT_SMALLCAPS: dict[str, np.ndarray] | None = None


def get_font_smallcaps() -> dict[str, np.ndarray]:
    """Small-caps variants of the UPPERCASE glyphs only (lowercase has
    no small-caps form; digits/punct keep their face)."""
    global _FONT_SMALLCAPS
    if _FONT_SMALLCAPS is None:
        _FONT_SMALLCAPS = {
            ch: smallcaps_variant(g)
            for ch, g in get_font().items()
            if ch in UPPER
        }
    return _FONT_SMALLCAPS


def get_font_bold() -> dict[str, np.ndarray]:
    global _FONT_BOLD
    if _FONT_BOLD is None:
        _FONT_BOLD = {ch: bold_variant(g) for ch, g in get_font().items()}
    return _FONT_BOLD


def get_font_italic() -> dict[str, np.ndarray]:
    global _FONT_ITALIC
    if _FONT_ITALIC is None:
        _FONT_ITALIC = {
            ch: italic_variant(g) for ch, g in get_font().items()
        }
    return _FONT_ITALIC


def render_line_styled(text: str, style: str = "normal") -> np.ndarray:
    """render_line with a font face: 'normal' | 'bold' | 'italic'."""
    # lazy dispatch: only the requested bank is built
    if style == "normal":
        font = get_font()
    elif style == "bold":
        font = get_font_bold()
    elif style == "italic":
        font = get_font_italic()
    elif style == "smallcaps":
        # smallcaps covers uppercase only; everything else keeps its face
        font = {**get_font(), **get_font_smallcaps()}
    else:
        raise ValueError(f"unknown style {style!r}")
    cols: list[np.ndarray] = []
    for i, ch in enumerate(text):
        if ch == " ":
            cols.append(np.zeros((CELL_H, WORD_GAP), dtype=bool))
            continue
        cols.append(font[ch if ch in font else "?"])
        if i + 1 < len(text) and text[i + 1] != " ":
            cols.append(np.zeros((CELL_H, KERN), dtype=bool))
    return (
        np.concatenate(cols, axis=1)
        if cols
        else np.zeros((CELL_H, 1), dtype=bool)
    )


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
    # shiro-rekha join: adjacent Devanagari glyphs write under one
    # continuous top bar (the conjoined-word raster the reference's
    # ShiroRekhaSplitter undoes, devanagari_processing.cpp:228-341) —
    # fill the bar rows across each intra-word kern gap
    font2 = get_font()
    x = 0
    for i, ch in enumerate(text):
        if ch == " ":
            x += WORD_GAP
            continue
        x += font2[ch if ch in font2 else "?"].shape[1]
        if i + 1 < len(text) and text[i + 1] != " ":
            if ch in DEVA_CHARSET and text[i + 1] in DEVA_CHARSET:
                mask[DEVA_BAR_TOP : DEVA_BAR_TOP + DEVA_BAR_H, x : x + KERN] = True
            x += KERN
    if scale > 1:
        mask = np.kron(mask, np.ones((scale, scale), dtype=bool))
    return mask


def mask_to_gray(mask: np.ndarray, fg: int = 20, bg: int = 235) -> np.ndarray:
    """Ink mask -> uint8 grayscale page (dark-on-light)."""
    img = np.full(mask.shape, bg, dtype=np.uint8)
    img[mask] = fg
    return img
