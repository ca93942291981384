"""Fixed-pitch chopping (fpchop.cpp:72-220): lattice cuts through fused
monospace glyphs that the seam chopper cannot separate (no thin seam)."""

import numpy as np

from tesseract_spark.functions.fonts import CELL_H, get_font
from tesseract_spark.operators.legacy import decode_strip_legacy
from tesseract_spark.operators.pitch import detect_pitch, fixed_pitch_cuts


def _mono(chars: str, pitch: int) -> np.ndarray:
    """Monospace strip: each glyph left-aligned in a pitch-wide cell.
    The fixture glyphs are flush both sides, so pitch == glyph width
    fuses neighbours into one run — the fpchop input shape."""
    font = get_font()
    cells = []
    for ch in chars:
        g = font[ch]
        cell = np.zeros((CELL_H, pitch), dtype=bool)
        w = min(g.shape[1], pitch)
        cell[:, :w] = g[:, :w]
        cells.append(cell)
    return np.concatenate(cells, axis=1)


def test_cut_geometry():
    font = get_font()
    w = font["H"].shape[1]
    run = _mono("HHH", w)
    cuts = fixed_pitch_cuts(run, float(w))
    assert len(cuts) == 2
    for k, c in enumerate(cuts, start=1):
        assert abs(c - k * w) <= max(1, round(0.15 * w)) + 1
    # single-cell run: nothing to cut
    assert fixed_pitch_cuts(font["H"].astype(bool), float(w)) == []


def test_lattice_rescues_fused_monospace():
    """'NH' fused at pitch reads 'S' on the seam-chop path (the contact
    has no thin seam and the false global-min cut wins); the lattice
    decodes it — the fpchop contract."""
    font = get_font()
    for chars in ("NH", "NHN", "HEH", "NE"):
        w = font[chars[0]].shape[1]
        strip = _mono(chars, w)
        assert decode_strip_legacy(strip, pitch=float(w)) == chars, chars
    # and the plain path genuinely fails at least one of these
    w = font["N"].shape[1]
    assert decode_strip_legacy(_mono("NH", w)) != "NH"


def test_pitch_path_is_noop_for_separable_text():
    """Pairs the seam path already handles decode identically with the
    lattice (no regression when fpchop engages)."""
    font = get_font()
    for chars in ("HH", "EE", "NN", "WW", "mm", "ms", "EH", "HE"):
        w = font[chars[0]].shape[1]
        strip = _mono(chars, w)
        assert decode_strip_legacy(strip, pitch=float(w)) == chars, chars


def test_detect_pitch_feeds_the_chopper():
    """Row-level wiring: centers of a monospace row are detected as
    fixed-pitch and the estimated pitch drives correct cuts."""
    font = get_font()
    w = font["H"].shape[1]
    centers = np.arange(8, dtype=np.float64) * w + w / 2
    is_fp, pitch = detect_pitch(centers)
    assert is_fp and abs(pitch - w) < 0.5
    strip = _mono("NHN", w)
    assert decode_strip_legacy(strip, pitch=pitch) == "NHN"
