"""Raster QR/barcode codec tests (kernels/raster_codes.py).

Mirrors the reference's code-detection test intent
(ref: tests/test_google_azure_ocr.py:65-82 — decode a known code image,
assert the TYPE[[DATA]] text) against the synthetic symbology.
"""

import numpy as np
import pytest

from ocr_wrapper_spark.kernels.raster_codes import (
    BC_MODULE_PX,
    barcode_widths,
    code_span_text,
    decode_codes,
    render_barcode,
    render_qr,
)
from ocr_wrapper_spark.sources.media import (
    build_scan_raster,
    scan_code_attrs,
)


def test_qr_roundtrip_at_any_position():
    for x0, y0 in [(0, 0), (17, 23), (300, 164)]:
        img = np.zeros((200, 360), dtype=np.float32)
        w, h = render_qr(img, "DOC-000042-17", x0, y0)
        codes = decode_codes(img)
        assert codes == [("QRCODE", "DOC-000042-17", x0, y0, x0 + w, y0 + h)]


def test_barcode_roundtrip_and_measured_width():
    img = np.zeros((200, 360), dtype=np.float32)
    digits = "0000399999"
    w, h = render_barcode(img, digits, 25, 130)
    widths = barcode_widths(digits)
    assert w == (sum(widths) + len(widths) - 1) * BC_MODULE_PX
    assert decode_codes(img) == [("CODE128", digits, 25, 130, 25 + w, 130 + h)]


def test_decode_ignores_text_distractors():
    # text dashes above the code must affect neither data nor the box
    for doc_id in range(24):
        kind, data, x0, y0 = scan_code_attrs(doc_id)
        codes = decode_codes(build_scan_raster(doc_id))
        assert len(codes) == 1
        ct, cd, px0, py0, _, py1 = codes[0]
        assert (ct, cd, px0, py0) == (kind, data, x0, y0)
        assert py1 - py0 == 36


def test_decode_empty_and_text_only_pages():
    assert decode_codes(np.zeros((50, 50), dtype=np.float32)) == []
    from ocr_wrapper_spark.kernels.raster_tilt import render_text_raster

    assert decode_codes(render_text_raster(3.0, width=360, height=200)) == []


def test_decode_survives_scattered_salt_noise():
    # salt noise ADDS dark pixels; module-center sampling and the
    # solid-run frame tests only depend on dark content staying dark, so
    # sparse salt away from the symbol border must not flip the decode.
    # (The 3x3 median denoise is NOT applied here: it erodes the corners
    # of 3px modules — the raster_tilt denoise is for the tilt path.)
    img = np.zeros((200, 360), dtype=np.float32)
    render_qr(img, "DOC-000008-56", 40, 125)
    rng = np.random.default_rng(7)
    noisy = img.copy()
    ys, xs = rng.integers(0, 120, 40), rng.integers(0, 360, 40)  # above symbol
    noisy[ys, xs] = 1.0
    codes = decode_codes(noisy)
    assert [c[:2] for c in codes] == [("QRCODE", "DOC-000008-56")]


def test_span_text_format_matches_reference_regex():
    import re

    span = code_span_text("QRCODE", "DOC-000042-17")
    m = re.fullmatch(r"(\w+)\[\[([^\]]+)\]\]", span)
    assert m and m.group(1) == "QRCODE" and m.group(2) == "DOC-000042-17"


def test_encoder_rejects_oversize_payloads():
    img = np.zeros((50, 50), dtype=np.float32)
    with pytest.raises(ValueError):
        render_barcode(img, "x123", 0, 0)
    with pytest.raises(ValueError):
        render_qr(img, "a" * 300, 0, 0)
