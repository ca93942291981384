"""Deterministic page composer: text specs -> page images + golden spans.

The fixture-side inverse of the engine (FIXTURES.md §5): pages are composed
from the procedural bitmap font with exactly the typographic parameters the
layout stage detects (pitch, paragraph gap, indent, gutter, quantized shear),
so the golden span sequence of every rendered page is known by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .fonts import (
    BASELINE,
    CELL_H,
    WORD_GAP,
    mask_to_gray,
    render_line,
    text_ink_width,
)

LEADING = 6  # blank rows between line cells (pitch = 22 per scale unit)
PITCH = CELL_H + LEADING
PARA_GAP = 20  # extra rows between paragraphs (pitch + 20 > 1.8 * pitch)
MARGIN = 12
GUTTER = 48  # two-column gutter width (> detector minimum of 24)


@dataclass
class PageSpec:
    """One page: a list of paragraphs (each a list of line texts) plus
    optional second column, media elements, scale/skew/polarity/noise."""

    paragraphs: list[list[str]]
    column2: list[list[str]] | None = None
    column3: list[list[str]] | None = None  # requires column2
    scale: int = 1
    skew: float = 0.0  # must be a SKEW_GRID value for exact recovery
    inverted: bool = False
    noise_dots: int = 0
    indent_paras: tuple[int, ...] = ()  # paragraph idxs with first-line indent
    photos: tuple[tuple[int, int, int], ...] = ()  # (after_para, w, h)
    rules: tuple[int, ...] = ()  # after_para indexes
    dpi: int = 300
    # full-width pullout heading above a two-column body: its lines span
    # the gutter, so only the strip-banded column DP can place it
    # (a whole-page x-projection sees no gutter at all)
    pullout_lines: list[str] | None = None
    # (para_idx, line_idx) pairs whose line gets an UNDERLINE bar the
    # width of its ink, ABUTTING the glyph cells (touching descenders —
    # the classic merged underline the separate_underlines machinery
    # owns; applies in every column holding that para/line, like
    # photos/rules).  Underlines are text decoration, not media: the
    # engine must erase the bar, restore the characters, and the
    # golden text is unchanged.  A bar floated BETWEEN two lines is a
    # different object — the reference's one-sided test reads it as a
    # separator (text on both sides), so the composer does not render
    # detached underlines.
    underlines: tuple[tuple[int, int], ...] = ()


@dataclass
class ComposedPage:
    image: np.ndarray  # uint8 grayscale
    golden: list[tuple[str, str]]  # ordered (kind, text) — kind 'text'|'media'
    width: int
    height: int


def _column_elements(
    spec: PageSpec, paragraphs: list[list[str]], x0: int
) -> tuple[list[dict], int, int]:
    """Lay out one column; returns (elements, ink_width, bottom_y)."""
    s = spec.scale
    y = MARGIN * s
    elems: list[dict] = []
    max_w = 0
    for pi, para in enumerate(paragraphs):
        lines = []
        for li, text in enumerate(para):
            indent = (
                3 * WORD_GAP * s if (li == 0 and pi in spec.indent_paras) else 0
            )
            lines.append((x0 + indent, y, text))
            max_w = max(max_w, indent + text_ink_width(text, s))
            if (pi, li) in spec.underlines:
                # typographic placement: flush under the BASELINE,
                # crossing descenders — the classic merged underline
                # (underline_stats renders the same position).  The
                # round-4 placement at the CELL bottom left the bar
                # DETACHED by 4s-1 px whenever the line had no
                # descenders, and a detached bar is a separator under
                # the reference's own adjacency test
                # (linefind.cpp:207-213) — a contradiction with this
                # axis's "NO media" golden at scale >= 2
                elems.append(
                    {
                        "kind": "deco",
                        "bar": (
                            x0 + indent,
                            y + BASELINE * s + 1,
                            text_ink_width(text, s),
                        ),
                    }
                )
            y += PITCH * s
        elems.append({"kind": "text", "lines": lines, "para": pi, "col_x": x0})
        y += PARA_GAP * s
        for after, w, h in spec.photos:
            if after == pi:
                elems.append({"kind": "media", "photo": (x0, y, w, h)})
                max_w = max(max_w, w)  # photos widen the page too
                y += h + PARA_GAP * s
        if pi in spec.rules:
            elems.append({"kind": "media", "rule": (x0, y)})
            y += 3 + PARA_GAP * s
    return elems, max_w, y


def _shift_elements(elems: list[dict], dy: int) -> None:
    """Move a column's elements down by dy — text lines AND media
    (photo/rule) coordinates, so a pullout heading never overlaps them."""
    for e in elems:
        if e["kind"] == "text":
            e["lines"] = [(x, y + dy, t) for x, y, t in e["lines"]]
        elif "photo" in e:
            x, y, w, h = e["photo"]
            e["photo"] = (x, y + dy, w, h)
        elif "bar" in e:
            x, y, w = e["bar"]
            e["bar"] = (x, y + dy, w)
        else:
            x, y = e["rule"]
            e["rule"] = (x, y + dy)


def _photo_mask(w: int, h: int) -> np.ndarray:
    """Connected dense texture: solid 2px ring + 2x2 checkerboard interior
    (single 8-connected component, density ~0.5 — imagefind-detectable)."""
    m = np.zeros((h, w), dtype=bool)
    m[:2, :] = m[-2:, :] = True
    m[:, :2] = m[:, -2:] = True
    yy, xx = np.mgrid[2 : h - 2, 2 : w - 2]
    m[2 : h - 2, 2 : w - 2] = ((yy // 2) + (xx // 2)) % 2 == 0
    return m


def compose_page(spec: PageSpec) -> ComposedPage:
    s = spec.scale
    elems: list[dict] = []
    y_body = 0
    pull_w = 0
    if spec.pullout_lines:
        y = MARGIN * s
        plines = []
        for text in spec.pullout_lines:
            plines.append((MARGIN * s, y, text))
            pull_w = max(pull_w, text_ink_width(text, s))
            y += PITCH * s
        elems.append({"kind": "text", "lines": plines, "para": -1, "pullout": True})
        y_body = y + PARA_GAP * s - MARGIN * s
    col1, w1, y1 = _column_elements(spec, spec.paragraphs, MARGIN * s)
    if y_body:
        _shift_elements(col1, y_body)
        y1 += y_body
    elems += col1
    total_w = MARGIN * s + max(w1, pull_w)
    total_h = y1
    if spec.column2:
        x2 = MARGIN * s + w1 + GUTTER * s
        col2, w2, y2 = _column_elements(spec, spec.column2, x2)
        if y_body:
            _shift_elements(col2, y_body)
            y2 += y_body
        elems += col2
        total_w = max(total_w, x2 + w2)
        total_h = max(total_h, y2)
        if spec.column3:
            x3 = x2 + w2 + GUTTER * s
            col3, w3, y3 = _column_elements(spec, spec.column3, x3)
            if y_body:
                _shift_elements(col3, y_body)
                y3 += y_body
            elems += col3
            total_w = max(total_w, x3 + w3)
            total_h = max(total_h, y3)
    W = total_w + MARGIN * s
    H = total_h + MARGIN * s
    # account for rules spanning the page width
    mask = np.zeros((H, W), dtype=bool)
    golden: list[tuple[str, str]] = []
    # render text + media; golden order = reading order the engine produces:
    # two-column -> column 1 fully then column 2; single column -> by top y.
    for e in elems:
        if e["kind"] == "text":
            for x, y, text in e["lines"]:
                lm = render_line(text, s)
                mask[y : y + lm.shape[0], x : x + lm.shape[1]] |= lm
        elif "photo" in e:
            x, y, w, h = e["photo"]
            mask[y : y + h, x : x + w] |= _photo_mask(w, h)
            e["rect"] = (x, y, x + w, y + h)
        elif "bar" in e:
            x, y, w = e["bar"]  # underline: decoration, never media
            mask[y : y + 2, x : x + w] = True
        else:
            x, y = e["rule"]
            rule_w = max(120, w1)
            mask[y : y + 3, x : x + rule_w] = True
            e["rect"] = (x, y, x + rule_w, y + 3)
    # media elements whose rendered rects overlap or touch fuse into ONE
    # ink region (a per-column rule wider than a narrow neighbour column
    # runs into the next column's rule) — the golden counts the MERGED
    # regions, since that is all any engine can observe.  Two collinear
    # RULES with a sub-closing gap (<= 3 px, the line finder's closing
    # brick at 300 dpi — leptonica heals such breaks inside
    # GetLineMasks, linefind.cpp:456) likewise count as ONE separator:
    # a 3 px break in a bar is below any engine's healing distance.
    media = [e for e in elems if e["kind"] == "media"]
    parent = list(range(len(media)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(media)):
        l1, t1, r1, b1 = media[i]["rect"]
        for j in range(i + 1, len(media)):
            l2, t2, r2, b2 = media[j]["rect"]
            if l1 <= r2 and l2 <= r1 and t1 <= b2 and t2 <= b1:
                parent[find(i)] = find(j)
            elif (
                "rule" in media[i]
                and "rule" in media[j]
                and t1 <= b2
                and t2 <= b1
                and l1 <= r2 + 3
                and l2 <= r1 + 3
            ):
                parent[find(i)] = find(j)
    drop = set()
    for i, e in enumerate(media):
        root = find(i)
        if root != i:
            # keep one representative per merged group (the root); widen
            # its rect so the ordering key reflects the union
            l1, t1, r1, b1 = media[root]["rect"]
            l2, t2, r2, b2 = e["rect"]
            media[root]["rect"] = (
                min(l1, l2), min(t1, t2), max(r1, r2), max(b1, b2)
            )
            drop.add(id(e))
    for e in media:
        l, t, _r, _b = e["rect"]
        if "photo" in e:
            e["photo"] = (l, t) + e["photo"][2:]
        else:
            e["rule"] = (l, t)
    elems = [e for e in elems if id(e) not in drop]
    ordered = [e for e in elems if e["kind"] != "deco"]
    for e in sorted(ordered, key=lambda e: _elem_order(e, spec)):
        if e["kind"] == "text":
            golden.append(("text", "\n".join(t for _x, _y, t in e["lines"])))
        else:
            golden.append(("media", ""))
    # quantized shear (render-side of the skew model)
    if spec.skew != 0.0:
        shifts = np.round(spec.skew * np.arange(W)).astype(np.int64)
        pad = int(abs(shifts).max()) + 1
        sheared = np.zeros((H + 2 * pad, W), dtype=bool)
        for x in range(W):
            sheared[pad + shifts[x] : pad + shifts[x] + H, x] = mask[:, x]
        mask = sheared
        H = mask.shape[0]
    img = mask_to_gray(mask)
    if spec.noise_dots:
        rng = np.random.default_rng((42, spec.noise_dots, W, H))
        xs = rng.integers(2, W - 2, spec.noise_dots)
        ys = rng.integers(2, max(3, MARGIN * s - 6), spec.noise_dots)
        img[ys, xs] = 20  # isolated single-pixel specks in the top margin
    if spec.inverted:
        img = (255 - img.astype(np.int32)).astype(np.uint8)
    return ComposedPage(image=img, golden=golden, width=W, height=H)


def _elem_order(e: dict, spec: PageSpec) -> tuple:
    """Reading-order key matching operators.page.analyze_page: columns
    left-to-right when multi-column, else strictly by top y."""
    if e["kind"] == "text":
        # order by COLUMN membership, not raw ink x — an indented first
        # line must not push its paragraph after its column siblings
        x = e.get("col_x", min(l[0] for l in e["lines"]))
        y = min(l[1] for l in e["lines"])
        if e.get("pullout"):
            x = -1  # a top pullout band reads before either column
    elif "photo" in e:
        x, y = e["photo"][0], e["photo"][1]
    else:
        x, y = e["rule"]
    if spec.column2:
        # column block ordering: all text of a column groups together; the
        # engine forms one text region per column (x-sorted), media after.
        is_media = e["kind"] == "media"
        return (1 if is_media else 0, x if not is_media else 0, y)
    return (y, x)
