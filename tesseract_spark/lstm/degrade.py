"""Training-image degradation — the degradeimage.cpp analogue.

``DegradeImage`` (src/training/degradeimage.cpp:82-170) simulates a
print/copy/scan cycle on synthetic training lines: grayscale erosion
spreads ink for dark exposures ("backwards to binary morphology"), a
3x3 block convolution softens everything (no scanner is as sharp as the
electronic image), a small random rotation jaggies the edges, salt-and-
pepper models sensor/paper noise, an illumination ramp fades across big
pages, and an exposure-dependent grey offset keeps threshold-128
binarization reasonable.  ``PrepareDistortedPix`` (:177-215) adds the
synthetic-data distortions: gaussian noise, smoothing, blur, inversion.
Constants kRotationRange/kExposureFactor/kSaltnPepper/kMinRampSize match
degradeimage.cpp:53-60.  The leptonica perspective warp (:216-260) is
out of scope — rotation covers the geometric jitter the fixture nets
train against (documented simplification).

Everything is deterministic under a caller-supplied seed so augmented
corpora are reproducible across partitionings — the map-side use is one
``degrade_line`` call per sample inside the .lstmf packager
(``make_line_samples(degrade_exposure=...)``), embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np

# degradeimage.cpp:53-60
K_ROTATION_RANGE = 0.02
K_EXPOSURE_FACTOR = 16
K_SALT_N_PEPPER = 5
K_MIN_RAMP_SIZE = 1000


def erode_gray(img: np.ndarray, size: int = 3) -> np.ndarray:
    """Grayscale erosion = min filter: dark (ink) spreads
    (pixErodeGray; see the grayscale-morphology note in the source)."""
    r = size // 2
    pad = np.pad(img.astype(np.int16), r, mode="edge")
    out = pad.copy()
    h, w = pad.shape
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out = np.minimum(
                out,
                np.roll(np.roll(pad, dy, axis=0), dx, axis=1),
            )
    return out[r : h - r, r : w - r]


def block_conv(img: np.ndarray, size: int = 3) -> np.ndarray:
    """3x3 mean filter (pixBlockconv 1,1)."""
    r = size // 2
    pad = np.pad(img.astype(np.float64), r, mode="edge")
    acc = np.zeros_like(pad)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            acc += np.roll(np.roll(pad, dy, axis=0), dx, axis=1)
    h, w = pad.shape
    return (acc / (size * size))[r : h - r, r : w - r]


def rotate_small(img: np.ndarray, radians: float) -> np.ndarray:
    """Small-angle rotation, nearest-neighbour, white fill (the jaggy
    edges are the point — degradeimage.cpp's comment)."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    c, s = np.cos(radians), np.sin(radians)
    sy = cy + (yy - cy) * c - (xx - cx) * s
    sx = cx + (yy - cy) * s + (xx - cx) * c
    ry = np.round(sy).astype(int)
    rx = np.round(sx).astype(int)
    ok = (ry >= 0) & (ry < h) & (rx >= 0) & (rx < w)
    out = np.full((h, w), 255, dtype=img.dtype)
    out[ok] = img[ry[ok], rx[ok]]
    return out


def degrade_line(
    gray: np.ndarray,
    exposure: int = 0,
    seed: int | None = 0,
    rotation: float | None = None,
) -> np.ndarray:
    """DegradeImage (degradeimage.cpp:89-170) on one uint8 line image
    (0 = ink).  ``exposure`` in [-3, 3]; ``seed=None`` disables the
    random rotation/noise (pure deterministic pipeline); ``rotation``
    overrides the random draw like the reference's *rotation input."""
    rng = np.random.default_rng(seed) if seed is not None else None
    img = gray.astype(np.int16)
    if exposure >= 2:
        img = erode_gray(img)
    img = block_conv(img)
    if rotation is None and rng is not None:
        rotation = float(rng.uniform(-K_ROTATION_RANGE, K_ROTATION_RANGE))
    if rotation:
        img = rotate_small(
            np.clip(img, 0, 255).astype(np.uint8), rotation
        ).astype(np.float64)
    if exposure >= 3 or exposure == 1:
        img = erode_gray(img)
    offset = -3 * K_EXPOSURE_FACTOR if exposure <= 0 else 0
    offset -= exposure * K_EXPOSURE_FACTOR
    img = img + offset
    if rng is not None:
        img = img + rng.integers(
            -K_SALT_N_PEPPER, K_SALT_N_PEPPER + 1, size=img.shape
        )
    h, w = img.shape
    if h + w > K_MIN_RAMP_SIZE:
        yy, xx = np.mgrid[0:h, 0:w]
        img = img - (2 * xx + yy) * 32 // (h + w)
    return np.clip(img, 0, 255).astype(np.uint8)


def distort_line(
    gray: np.ndarray,
    seed: int = 0,
    white_noise: bool = False,
    smooth_noise: bool = False,
    blur: bool = False,
    invert: bool = False,
) -> np.ndarray:
    """PrepareDistortedPix (degradeimage.cpp:177-215): gaussian noise
    (sigma 8) optionally smoothed, blur, inversion — each noise/blur
    engaged on the reference's coin flip, reproducible via seed."""
    rng = np.random.default_rng(seed)
    img = gray.astype(np.float64)
    if (white_noise or smooth_noise) and rng.uniform(-1, 1) > 0:
        img = img + rng.normal(0.0, 8.0, size=img.shape)
        if smooth_noise:
            img = block_conv(np.clip(img, 0, 255))
    if blur and rng.uniform(-1, 1) > 0:
        img = block_conv(np.clip(img, 0, 255))
    out = np.clip(img, 0, 255).astype(np.uint8)
    if invert:
        out = (255 - out).astype(np.uint8)
    return out
