"""DENORM — the coordinate normalization chain (normalis.cpp).

The reference normalizes every blob into the BLN (baseline-normalized)
frame — baseline at y = kBlnBaselineOffset, x-height spanning
kBlnXHeight — through a chain of DENORM steps (block rotation, row
baseline shift/scale, classifier-local second normalization).  This
engine normalizes row STRIPS by image resampling, but the coordinate
algebra still needs the explicit mapping wherever a rule is stated in
BLN units (flip_0O's sub/superscript guard, the integer-feature
domain): ``Denorm`` is that mapping, ported from
normalis.cpp:98-116 (SetupNormalization), :309-333
(LocalNormTransform), :339-357 (NormTransform, predecessor chain,
deepest first), :361-393 (LocalDenormTransform) and :400-414
(DenormTransform, shallowest first).

The non-linear x_map/y_map variant (SetupNonLinear, the Yamada line-
density equalization) is not ported — the LSTM path never uses it and
the legacy path here feeds resampled strips.
"""

from __future__ import annotations

from dataclasses import dataclass

# normalis.h:25-32
K_BLN_CELL_HEIGHT = 256
K_BLN_X_HEIGHT = 128
K_BLN_BASELINE_OFFSET = 64


def _round(x: float) -> int:
    """IntCastRounded (helpers.h): round half away from zero."""
    return int(x + 0.5) if x >= 0 else -int(-x + 0.5)


def rotate(pt: tuple[float, float], vec: tuple[float, float]) -> tuple[float, float]:
    """FCOORD::rotate: complex multiply by the unit direction vec."""
    x, y = pt
    c, s = vec
    return (x * c - y * s, x * s + y * c)


@dataclass
class Denorm:
    """One normalization step: translate by -origin, scale, optional
    rotation, then the final shift.  ``predecessor`` chains steps
    (deepest applied first on the forward transform)."""

    x_origin: float = 0.0
    y_origin: float = 0.0
    x_scale: float = 1.0
    y_scale: float = 1.0
    final_xshift: float = 0.0
    final_yshift: float = K_BLN_BASELINE_OFFSET
    rotation: tuple[float, float] | None = None
    predecessor: "Denorm | None" = None

    # normalis.cpp:316-333
    def local_norm(self, pt: tuple[float, float]) -> tuple[float, float]:
        tx = (pt[0] - self.x_origin) * self.x_scale
        ty = (pt[1] - self.y_origin) * self.y_scale
        if self.rotation is not None:
            tx, ty = rotate((tx, ty), self.rotation)
        return (tx + self.final_xshift, ty + self.final_yshift)

    # normalis.cpp:346-357: predecessors deepest first, then this
    def norm(self, pt: tuple[float, float]) -> tuple[float, float]:
        if self.predecessor is not None:
            pt = self.predecessor.norm(pt)
        return self.local_norm(pt)

    # normalis.cpp:369-393 (linear branch)
    def local_denorm(self, pt: tuple[float, float]) -> tuple[float, float]:
        rx = pt[0] - self.final_xshift
        ry = pt[1] - self.final_yshift
        if self.rotation is not None:
            rx, ry = rotate((rx, ry), (self.rotation[0], -self.rotation[1]))
        return (rx / self.x_scale + self.x_origin,
                ry / self.y_scale + self.y_origin)

    # normalis.cpp:407-414: this first, then predecessors shallowest
    def denorm(self, pt: tuple[float, float]) -> tuple[float, float]:
        pt = self.local_denorm(pt)
        if self.predecessor is not None:
            pt = self.predecessor.denorm(pt)
        return pt

    # integer entry points (TPOINT variants, normalis.cpp:309,339,361,400)
    def local_norm_int(self, pt) -> tuple[int, int]:
        x, y = self.local_norm(pt)
        return (_round(x), _round(y))

    def norm_int(self, pt) -> tuple[int, int]:
        x, y = self.norm(pt)
        return (_round(x), _round(y))

    def local_denorm_int(self, pt) -> tuple[int, int]:
        x, y = self.local_denorm(pt)
        return (_round(x), _round(y))

    def denorm_int(self, pt) -> tuple[int, int]:
        x, y = self.denorm(pt)
        return (_round(x), _round(y))


def row_bln_denorm(baseline_page_y: float, x_height: float) -> Denorm:
    """The row's baseline normalization in THIS engine's y-down page
    frame: page (x, y_down) -> BLN (x, y_up) with the baseline at
    kBlnBaselineOffset and the x-height line at kBlnBaselineOffset +
    kBlnXHeight (the SetupBLNormalizer contract, normalis.cpp:81-96).
    y flips sign via y_scale < 0 composed with the origin."""
    scale = K_BLN_X_HEIGHT / max(1e-6, float(x_height))
    return Denorm(
        x_origin=0.0,
        y_origin=float(baseline_page_y),
        x_scale=scale,
        y_scale=-scale,  # y-down page frame -> y-up BLN
        final_xshift=0.0,
        final_yshift=float(K_BLN_BASELINE_OFFSET),
    )
