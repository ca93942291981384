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
degradeimage.cpp:53-60.  The leptonica perspective warp
(GeneratePerspectiveDistortion/ProjectiveCoeffs, :216-309) is
implemented natively: the reference's exact factor distribution
(squared |SignedRand| draws, 5/8 scaling on the y-corners, 0.5 on the
x-corners, signed-squared shear clamped into [-x0, x1]), the same
four-corner destination geometry, an 8-dof projective solve for both
directions (leptonica getProjectiveXformCoeffs), backward-mapped
bilinear resampling with the in-color fill, and the reference's
two-diagonal bounding-union box transform.  One quirk made defined:
the reference reads factors[FN_INCOLOR] uninitialized
(degradeimage.cpp:273-297 never assigns it); here the fill color is an
explicit uniform draw.

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


def projective_solve(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """leptonica getProjectiveXformCoeffs: the 8 coefficients c with

        x_dst = (c0 x + c1 y + c2) / (c6 x + c7 y + 1)
        y_dst = (c3 x + c4 y + c5) / (c6 x + c7 y + 1)

    from 4 point correspondences (rows of src/dst)."""
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        xp, yp = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -x * xp, -y * xp]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -x * yp, -y * yp]
        b[2 * i] = xp
        b[2 * i + 1] = yp
    return np.linalg.solve(a, b)


def _xform_pt(c: np.ndarray, x, y):
    d = c[6] * x + c[7] * y + 1.0
    return (c[0] * x + c[1] * y + c[2]) / d, (c[3] * x + c[4] * y + c[5]) / d


def projective_coeffs(width: int, height: int, rng):
    """ProjectiveCoeffs (degradeimage.cpp:260-309): the randomized
    four-corner pull-in with signed-squared shear.  Returns
    (im_coeffs backward, box_coeffs forward, incolor fill 0|255).

    Factor order matches the FactorNames enum (degradeimage.cpp:39-51):
    y0..y3 then x0, x1, then shear — the draws must happen in that
    order for seed parity with this function's own history."""
    f = {}
    for name, scale in (("y0", 5 / 8), ("y1", 5 / 8), ("y2", 5 / 8),
                        ("y3", 5 / 8), ("x0", 0.5), ("x1", 0.5)):
        v = abs(rng.uniform(-1.0, 1.0)) * scale
        f[name] = v * v
    shear = rng.uniform(-0.5 / 3.0, 0.5 / 3.0)
    shear = shear * shear if shear >= 0 else -(shear * shear)
    shear = min(max(shear, -f["x0"]), f["x1"])
    src = np.array(
        [[0.0, 0.0], [width, 0.0], [width, height], [0.0, height]]
    )
    dst = np.array(
        [
            [f["x0"] * width, f["y0"] * height],
            [(1.0 - f["x1"]) * width, f["y1"] * height],
            [(1.0 - f["x1"] + shear) * width, (1.0 - f["y2"]) * height],
            [(f["x0"] + shear) * width, (1.0 - f["y3"]) * height],
        ]
    )
    im_coeffs = projective_solve(dst, src)  # dest -> src (backward)
    box_coeffs = projective_solve(src, dst)  # src -> dest (forward)
    incolor = 255 if rng.uniform(0.0, 1.0) > 0.5 else 0
    return im_coeffs, box_coeffs, incolor


def generate_perspective_distortion(
    gray: np.ndarray,
    rng,
    boxes: list[tuple[int, int, int, int]] | None = None,
):
    """GeneratePerspectiveDistortion (degradeimage.cpp:222-258):
    backward-map every destination pixel through the projective
    transform (bilinear, in-color fill — pixProjective), and transform
    boxes (x-left, y-top, x-right, y-bottom in image rows here; the
    reference works in y-up TBOXes, same geometry) as the bounding
    union of the two transformed diagonals.

    Returns (warped, new_boxes)."""
    h, w = gray.shape
    im_coeffs, box_coeffs, incolor = projective_coeffs(w, h, rng)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx, sy = _xform_pt(im_coeffs, xs, ys)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = sx - x0, sy - y0
    img = gray.astype(np.float64)

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return np.where(
            inside, img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)],
            float(incolor),
        )

    out = (
        sample(y0, x0) * (1 - fx) * (1 - fy)
        + sample(y0, x0 + 1) * fx * (1 - fy)
        + sample(y0 + 1, x0) * (1 - fx) * fy
        + sample(y0 + 1, x0 + 1) * fx * fy
    )
    warped = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    new_boxes = None
    if boxes is not None:
        new_boxes = []
        for (left, top, right, bottom) in boxes:
            x1, y1 = _xform_pt(box_coeffs, left, top)
            x2, y2 = _xform_pt(box_coeffs, right, bottom)
            x3, y3 = _xform_pt(box_coeffs, left, bottom)
            x4, y4 = _xform_pt(box_coeffs, right, top)
            new_boxes.append(
                (
                    int(min(x1, x3)),
                    int(min(y1, y4)),
                    int(max(x2, x4)),
                    int(max(y2, y3)),
                )
            )
    return warped, new_boxes


def distort_line(
    gray: np.ndarray,
    seed: int = 0,
    white_noise: bool = False,
    smooth_noise: bool = False,
    blur: bool = False,
    invert: bool = False,
    perspective: bool = False,
) -> np.ndarray:
    """PrepareDistortedPix (degradeimage.cpp:177-215): gaussian noise
    (sigma 8) optionally smoothed, blur, the perspective warp, then
    inversion — noise/blur/invert each engaged on the reference's coin
    flip (invert's gate is ``SignedRand(1.0) < 0``, :213), reproducible
    via seed.  Operation order matches the reference exactly."""
    rng = np.random.default_rng(seed)
    img = gray.astype(np.float64)
    if (white_noise or smooth_noise) and rng.uniform(-1, 1) > 0:
        img = img + rng.normal(0.0, 8.0, size=img.shape)
        if smooth_noise:
            img = block_conv(np.clip(img, 0, 255))
    if blur and rng.uniform(-1, 1) > 0:
        img = block_conv(np.clip(img, 0, 255))
    out = np.clip(img, 0, 255).astype(np.uint8)
    if perspective:
        out, _boxes = generate_perspective_distortion(out, rng)
    if invert and rng.uniform(-1, 1) < 0:
        out = (255 - out).astype(np.uint8)
    return out
