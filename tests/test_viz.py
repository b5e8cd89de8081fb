"""Visualization exports (functions/viz.py) — palette + renderer
properties mirroring ref:tests/test_bbox.py:87-106."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given
from hypothesis.strategies import floats, from_regex, lists, text

from ocr_wrapper_spark.functions.viz import (
    PALETTE_SIZES,
    PALLETS,
    draw_bboxes,
    get_color_with_defined_brightness,
    get_label2color_dict,
    parse_color,
)

color_code_regex = r"^#[0-9a-fA-F]{6}$"


@given(labels=lists(elements=text()))
def test_get_label2color_dict(labels):
    """Reference property (test_bbox.py:87-95): one entry per distinct
    label; colors unique up to 64 labels, exactly 64 distinct beyond."""
    d = get_label2color_dict(labels)
    assert len(d) == len(set(labels))
    if len(set(labels)) <= 64:
        assert len(set(d.values())) == len(d.values())
    else:
        assert len(set(d.values())) == 64


def test_palette_tiers_match_reference_structure():
    assert tuple(len(p) for p in PALLETS) == PALETTE_SIZES == (2, 3, 4, 8, 16, 32, 64)
    for p in PALLETS:
        assert len(set(p)) == len(p)
        for c in p:
            r, g, b = parse_color(c)
            # reds are reserved for errors (reference palette rationale):
            # no strongly red-dominant colors in any tier
            assert not (r > 160 and g < 80 and b < 80), c


def test_smallest_fitting_tier_is_used():
    d = get_label2color_dict(["a", "b"])
    assert set(d.values()) <= set(PALLETS[0])
    d = get_label2color_dict([f"l{i}" for i in range(9)])
    assert set(d.values()) <= set(PALLETS[4])  # 16-tier


@given(
    color=from_regex(color_code_regex),
    goal_brightness=floats(min_value=0, max_value=1),
)
def test_get_color_with_defined_brightness(color, goal_brightness):
    """Reference property (test_bbox.py:98-106): result is a valid color."""
    out = get_color_with_defined_brightness(color, goal_brightness)
    assert parse_color(out) is not None


def test_brightness_passthrough_for_unparsable():
    assert get_color_with_defined_brightness("definitely-not-a-color") == "definitely-not-a-color"


def test_brightness_actually_moves_mean():
    # grey can scale without per-channel clamping -> mean lands on goal
    out = parse_color(get_color_with_defined_brightness("#404040", 0.8))
    assert sum(out) / 3 / 255 == pytest.approx(0.8, abs=0.05)
    # channel-skewed colors clamp at 255 like the reference's min(255, .)
    out = parse_color(get_color_with_defined_brightness("#204060", 0.8))
    assert out[2] == 255


def test_draw_bboxes_outline_fill_and_broadcast():
    img = np.full((100, 200), 255, dtype=np.uint8)
    quads = np.array(
        [
            [0.1, 0.1, 0.4, 0.1, 0.4, 0.4, 0.1, 0.4],
            [0.5, 0.5, 0.9, 0.5, 0.9, 0.9, 0.5, 0.9],
        ]
    )
    out = draw_bboxes(img, quads, colors="#0000ff", fill_colors="#00ff00", fill_opacities=0.5)
    assert out.shape == (100, 200, 3) and out.dtype == np.uint8
    assert (img == 255).all()  # input never mutated
    # outline pixel: pure blue on the first box's top edge
    assert out[10, 40].tolist() == [0, 0, 255]
    # fill pixel: 50% green blend over white inside the second box
    assert out[70, 140].tolist() == [128, 255, 128]
    # untouched corner stays white
    assert out[0, 199].tolist() == [255, 255, 255]


def test_draw_bboxes_length_mismatch_raises():
    img = np.zeros((10, 10), dtype=np.uint8)
    q = np.zeros((2, 8))
    with pytest.raises(Exception, match="must be the same"):
        draw_bboxes(img, q, colors=["#fff000"])


def test_draw_bboxes_deterministic_with_augment_and_text():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    quads = np.array([[0.2, 0.3, 0.6, 0.3, 0.6, 0.6, 0.2, 0.6]])
    a = draw_bboxes(img, quads, texts="label", max_augment=0.2, fontsize=40)
    b = draw_bboxes(img, quads, texts="label", max_augment=0.2, fontsize=40)
    assert (a == b).all()
    assert not (a == img).all()


def test_draw_bboxes_hostile_geometry_degrades():
    """NaN/Inf span coords render nothing — never a crash (the repo's
    hostile-inputs contract)."""
    img = np.full((20, 30), 9, dtype=np.uint8)
    quads = np.array(
        [
            [np.nan] * 8,
            [0.1, np.inf, 0.2, 0.1, 0.2, 0.2, 0.1, 0.2],
            [0.1, 0.1, 0.5, 0.1, 0.5, 0.5, 0.1, 0.5],  # one valid box
        ]
    )
    out = draw_bboxes(img, quads, fill_colors="#00ff00", fill_opacities=0.5, colors=None)
    assert out.shape == (20, 30, 3)
    assert (out[3, 8] != [9, 9, 9]).any()  # the valid box did render


def test_draw_bboxes_border_stroke_keeps_full_width():
    """An edge-hugging quad renders the full stroke width inward
    (sample clamped before the offset stamp, like the original
    renderer), not a collapsed 1px line."""
    img = np.zeros((50, 60), dtype=np.uint8)
    full = np.array([[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0]])
    out = draw_bboxes(img, full, colors="#ffffff", strokewidths=3)
    # right border: columns w-1 and w-2 both painted (offset stamps inward)
    assert out[25, 59].tolist() == [255, 255, 255]
    assert out[25, 58].tolist() == [255, 255, 255]


def test_phash_null_for_corrupt_png_payload(spark):
    """Undecodable image payloads must get a NULL phash (never merged),
    even when the body sniffs as PNG but is corrupt."""
    from ocr_wrapper_spark.operators.multimodal import with_image_phash
    from ocr_wrapper_spark.sources.media import build_media_payload

    good = build_media_payload(6)
    corrupt = b"MM01 image 160 120 0 0 1\n\x89PNG\r\n\x1a\ngarbage"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))], "media_id long, payload binary"
    )
    rows = {r.media_id: r.phash for r in with_image_phash(df).collect()}
    assert rows[1] is not None and rows[2] is None


def test_draw_bboxes_spans_roundtrip_png():
    """Engine-shaped usage: render span quads over a decoded page raster
    and PNG-roundtrip the result losslessly."""
    from ocr_wrapper_spark.kernels.png_codec import decode_png, encode_png

    img = np.full((60, 90), 240, dtype=np.uint8)
    quads = np.array([[0.0, 0.0, 0.5, 0.0, 0.5, 0.5, 0.0, 0.5]])
    colors = get_label2color_dict(["word"])["word"]
    out = draw_bboxes(img, quads, colors=colors, strokewidths=1)
    assert (decode_png(encode_png(out)) == out).all()


def test_draw_bboxes_huge_finite_coords_bounded():
    """Hostile-but-finite geometry (e.g. an hOCR bbox of 1e8 scaling to
    ~1e10 page pixels) must render in bounded memory: edges are clipped
    to the padded page window before sampling, so sample count tracks
    the page perimeter, not the raw edge length."""
    import resource
    import time

    img = np.full((100, 100), 9, dtype=np.uint8)
    quads = np.array(
        [
            [1e8, 1e8, 2e8, 1e8, 2e8, 2e8, 1e8, 2e8],  # far off-page: no-op
            [-1e8, 0.5, 1e8, 0.5, 1e8, 0.6, -1e8, 0.6],  # crosses the page
            [0.1, 0.1, 0.5, 0.1, 0.5, 0.5, 0.1, 0.5],  # ordinary box
        ]
    )
    t0 = time.monotonic()
    out = draw_bboxes(img, quads, colors="#ff0000", strokewidths=3, fill_opacities=0.0)
    assert time.monotonic() - t0 < 5.0
    assert resource.getrusage(resource.RUSAGE_SELF).ru_maxrss < 4 * 1024 * 1024  # <4 GB
    assert out.shape == (100, 100, 3)
    assert (out[50, 50] == [255, 0, 0]).all()  # crossing edge did render
    assert (out[10, 30] == [255, 0, 0]).all()  # ordinary box's top edge did render


def test_clip_is_noop_for_in_page_geometry():
    """The padded-window clip must not change rendering for ordinary
    in-page quads: identical pixels to a quad that needs no clipping."""
    from ocr_wrapper_spark.functions.viz import _clip_segment

    assert _clip_segment(3.0, 4.0, 50.0, 40.0, -5.0, 104.0, -5.0, 104.0) == (3.0, 4.0, 50.0, 40.0)
    assert _clip_segment(-900.0, 10.0, -800.0, 10.0, -5.0, 104.0, -5.0, 104.0) is None
