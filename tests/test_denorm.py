"""DENORM parity — unittest/denorm_test.cc ported verbatim against
functions/denorm.Denorm (baseline normalization, rotation, and the
two-step predecessor chain)."""

from tesseract_spark.functions.denorm import (
    K_BLN_BASELINE_OFFSET,
    Denorm,
)


def expect_transform(d: Denorm, src, result, local: bool):
    """denorm_test.cc ExpectCorrectTransform: forward then undo."""
    normed = d.local_norm_int(src) if local else d.norm_int(src)
    assert normed == tuple(result), normed
    denormed = (
        d.local_denorm_int(normed) if local else d.denorm_int(normed)
    )
    assert denormed == tuple(src), denormed


def test_no_rotations():
    # denorm_test.cc:51-63
    d = Denorm(
        x_origin=1000.0, y_origin=2000.0, x_scale=2.0, y_scale=3.0,
        final_xshift=0.0, final_yshift=float(K_BLN_BASELINE_OFFSET),
    )
    expect_transform(d, (1100, 2000), (200, K_BLN_BASELINE_OFFSET), True)
    expect_transform(d, (1100, 2000), (200, K_BLN_BASELINE_OFFSET), False)
    expect_transform(d, (900, 2100), (-200, 300 + K_BLN_BASELINE_OFFSET), True)
    expect_transform(d, (900, 2100), (-200, 300 + K_BLN_BASELINE_OFFSET), False)


def test_with_rotations():
    # denorm_test.cc:66-80 (90-degree rotation = FCOORD(0, 1))
    d = Denorm(
        x_origin=1000.0, y_origin=2000.0, x_scale=2.0, y_scale=3.0,
        final_xshift=0.0, final_yshift=float(K_BLN_BASELINE_OFFSET),
        rotation=(0.0, 1.0),
    )
    expect_transform(d, (1100, 2000), (0, 200 + K_BLN_BASELINE_OFFSET), True)
    expect_transform(d, (1100, 2000), (0, 200 + K_BLN_BASELINE_OFFSET), False)
    expect_transform(d, (900, 2100), (-300, K_BLN_BASELINE_OFFSET - 200), True)
    expect_transform(d, (900, 2100), (-300, K_BLN_BASELINE_OFFSET - 200), False)


def test_multiple_chained():
    # denorm_test.cc:83-100: a second rotated+scaled step chained on
    # the first; NormTransform runs deepest-first, DenormTransform
    # undoes shallowest-first
    d1 = Denorm(
        x_origin=1000.0, y_origin=2000.0, x_scale=2.0, y_scale=3.0,
        final_xshift=0.0, final_yshift=float(K_BLN_BASELINE_OFFSET),
    )
    d2 = Denorm(
        x_origin=128.0, y_origin=128.0, x_scale=0.5, y_scale=0.25,
        final_xshift=0.0, final_yshift=0.0,
        rotation=(0.0, 1.0), predecessor=d1,
    )
    expect_transform(d1, (1050, 2000), (100, K_BLN_BASELINE_OFFSET), True)
    expect_transform(d1, (1050, 2000), (100, K_BLN_BASELINE_OFFSET), False)
    # local on d2 maps d1's output; full chain maps the page point
    expect_transform(
        d2, (100, K_BLN_BASELINE_OFFSET),
        (K_BLN_BASELINE_OFFSET // 4, -14), True,
    )
    expect_transform(
        d2, (1050, 2000), (K_BLN_BASELINE_OFFSET // 4, -14), False,
    )
