"""Raster tilt kernel guarantees (reference tilt_correction_numpy.py
semantics: pre-scan + iterative fine-scan over a scatter-add projection
gain; see kernels/raster_tilt.py for documented divergences)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_wrapper_spark.kernels.raster_tilt import (
    MIN_NB_DARK_PIXEL,
    denoise_raster,
    find_tilt_angle,
    render_text_raster,
    rotate_raster,
)


@pytest.mark.parametrize("angle", [-8, -4, -2, 0, 2, 4, 8])
def test_detects_rendered_angle_within_tenth_degree(angle):
    detected = find_tilt_angle(render_text_raster(angle))
    assert abs(detected - angle) < 0.1


def test_detects_on_larger_raster_and_fractional_angle():
    detected = find_tilt_angle(render_text_raster(3.5, width=320, height=240))
    assert abs(detected - 3.5) < 0.2


def test_too_few_dark_pixels_returns_zero():
    img = np.zeros((100, 100), dtype=np.float32)
    img[50, 50:53] = 1.0  # < MIN_NB_DARK_PIXEL after contrast filter
    assert find_tilt_angle(img) == 0.0
    assert MIN_NB_DARK_PIXEL == 100  # reference constant (:27)


def test_denoise_removes_salt_keeps_angle():
    rng = np.random.RandomState(7)
    img = render_text_raster(4)
    noisy = img.copy()
    noisy[rng.rand(*img.shape) < 0.03] = 1.0
    den = denoise_raster(noisy)
    # isolated salt pixels are gone (median of mostly-white neighborhoods);
    # adjacent salt pairs can survive, so assert near-total removal
    salt_only = (noisy == 1.0) & (img == 0.0)
    inner = np.zeros_like(salt_only)
    inner[1:-1, 1:-1] = salt_only[1:-1, 1:-1]
    assert den[inner].mean() < 0.05
    assert abs(find_tilt_angle(den) - 4) < 0.2


def test_rotate_raster_90_steps():
    img = render_text_raster(0)
    assert rotate_raster(img, 90).shape == img.shape[::-1]
    assert (rotate_raster(rotate_raster(img, 90), 270) == img).all()
    assert (rotate_raster(img, 0) == img).all()
    with pytest.raises(ValueError):
        rotate_raster(img, 45)


def test_rotated_raster_detects_near_ninety():
    # a 90-degree-rotated page projects best at the +-90 boundary; the
    # detector folds into [-90, 90) (reference :319-320)
    img = rotate_raster(render_text_raster(2), 90)
    detected = find_tilt_angle(img)
    assert min(abs(detected - 88), abs(detected + 88)) < 0.5


@pytest.mark.parametrize("angle", [round(a, 2) for a in np.linspace(-10, 10, 15)])
def test_fifteen_angle_sweep_reference_style(angle):
    """Mirrors the reference's detect-after-synthetic-rotate sweep
    (tests/test_tilt_correction.py:38-44: 15 angles, ±0.1-ish); our
    renderer quantizes strokes to pixels so the tolerance is 0.15."""
    detected = find_tilt_angle(render_text_raster(float(angle), width=320, height=240))
    assert abs(detected - angle) < 0.15


def test_downsize_cap_bounds_pixels_and_keeps_small_untouched():
    from ocr_wrapper_spark.kernels.raster_tilt import NB_PIXEL, downsize_raster

    small = render_text_raster(2)
    assert downsize_raster(small) is small  # <= cap: identity, no copy
    big = np.zeros((1536, 2048), dtype=np.float32)
    out = downsize_raster(big)
    assert out.size <= NB_PIXEL
    # aspect ratio preserved to within a pixel of rounding
    assert abs(out.shape[1] / out.shape[0] - 2048 / 1536) < 0.01


@pytest.mark.parametrize("angle", [-8, -2, 0, 4])
def test_detects_angle_on_scan_size_raster_through_cap(angle):
    """A 1024x768 'scan' (realistic line pitch, staggered words like real
    text) goes through the reference's nb_pixel NEAREST downsize inside
    find_tilt_angle and still detects exactly."""
    lh = 768 // 13
    img = render_text_raster(
        float(angle), width=1024, height=768, line_h=lh,
        thickness=lh // 4, word_w=lh, gap=lh // 3, margin=64, stagger=True,
    )
    detected = find_tilt_angle(denoise_raster(img))
    assert abs(detected - angle) < 0.2


def test_stagger_is_deterministic_and_angle_preserving():
    a = render_text_raster(4, stagger=True)
    b = render_text_raster(4, stagger=True)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, render_text_raster(4))
    assert abs(find_tilt_angle(a) - 4) < 0.1
