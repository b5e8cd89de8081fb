"""PNG codec (kernels/png_codec.py) — the real-compressed-image path.

The reference ingests compressed images via PIL (ocr_wrapper.py:103);
the repo's media payloads are genuinely PNG-compressed and must decode
losslessly through either PIL or the pure codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocr_wrapper_spark.kernels.png_codec import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    encode_png,
    is_png,
)


def test_roundtrip_grey_and_rgb_lossless():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    assert (decode_png(encode_png(g)) == g).all()
    rgb = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()


def test_encode_deterministic_and_sniffable():
    a = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert encode_png(a) == encode_png(a)
    assert is_png(encode_png(a)) and not is_png(a.tobytes())


def test_encode_actually_compresses():
    # flat/structured rasters (the corpus shape) must shrink materially
    a = np.zeros((120, 160), dtype=np.uint8)
    a[40:80, 30:130] = 200
    assert len(encode_png(a)) < a.size // 10


def _encode_with_filters(a: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference encoder for decode tests: applies the spec's filter
    definitions forward so decode must invert Sub/Up/Average/Paeth."""
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 8, 0, 0)
    rows = []
    prior = np.zeros(w, np.int32)
    for y in range(h):
        line = a[y].astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        f = line.copy()
        if ft == 1:
            for x in range(w - 1, 0, -1):
                f[x] = (line[x] - line[x - 1]) & 0xFF
        elif ft == 2:
            f = (line - prior) & 0xFF
        elif ft == 3:
            for x in range(w):
                left = line[x - 1] if x else 0
                f[x] = (line[x] - ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(w):
                A = line[x - 1] if x else 0
                B = prior[x]
                C = prior[x - 1] if x else 0
                pa, pb, pc = abs(B - C), abs(A - C), abs(A + B - 2 * C)
                pred = A if (pa <= pb and pa <= pc) else (B if pb <= pc else C)
                f[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prior = line
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_reverses_all_scanline_filters(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 1)
    a = rng.integers(0, 256, (14, 23), dtype=np.uint8)
    assert (decode_png(_encode_with_filters(a, ftypes)) == a).all()


def test_decode_palette_and_alpha_variants():
    # palette (colour type 3): indices expand through PLTE
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in idx)
    png = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3) and out[0, 1].tolist() == [40, 50, 60]
    # grey+alpha (colour type 4): alpha dropped
    ga = np.dstack([idx * 40, np.full((2, 2), 128, np.uint8)])
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 8, 4, 0, 0, 0)
    raw4 = b"".join(b"\x00" + bytes(ga[y].ravel()) for y in range(2))
    png4 = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr4)
        + _chunk(b"IDAT", zlib.compress(raw4))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png4) == idx * 40).all()


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = PNG_MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(png16)


def test_decode_raises_valueerror_for_every_corruption_class():
    """Contract: unsupported/corrupt input raises ValueError — never
    zlib.error / struct.error / IndexError — so callers catching the
    documented exception surface error rows, not task failures."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    corrupt_idat = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"\x01garbage") + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(corrupt_idat)
    # truncated mid-chunk (magic only + half a length field)
    with pytest.raises(ValueError):
        decode_png(PNG_MAGIC + b"\x00\x00")
    # palette index beyond PLTE size
    ihdr3 = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    bad_pal = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr3)
        + _chunk(b"PLTE", bytes([1, 2, 3]))  # one entry, index 5 used
        + _chunk(b"IDAT", zlib.compress(b"\x00\x05"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad_pal)


def test_corrupt_png_payload_degrades_not_raises_in_decode_seam():
    """A hostile MM01 payload whose body sniffs as PNG but is corrupt
    must degrade to the deterministic fake raster (the media operators'
    no-task-failure contract), and raise only when fake=False."""
    from ocr_wrapper_spark.operators.multimodal import _decode_image

    hostile = b"MM01 image 160 120 0 0 1\n" + PNG_MAGIC + b"garbage-idat"
    a = _decode_image(hostile)
    b = _decode_image(hostile)
    assert a.shape == (8, 8) and (a == b).all()
    with pytest.raises(Exception):
        _decode_image(hostile, fake=False)


def test_media_payloads_are_compressed_and_decode_lossless():
    """The generator's image payloads now carry real PNGs; the decode
    seam must reproduce the rendered raster exactly (oracles depend on
    the pixels being unchanged by compression)."""
    from ocr_wrapper_spark.kernels.raster_tilt import render_text_raster
    from ocr_wrapper_spark.operators.multimodal import _decode_image
    from ocr_wrapper_spark.sources.media import (
        RASTER_H,
        RASTER_W,
        build_media_payload,
        build_scan_payload,
        build_scan_raster,
        image_tilt_for_doc,
    )

    p = build_media_payload(6)  # doc_id % 3 == 0 -> image
    body = p.split(b"\n", 1)[1]
    assert is_png(body)
    assert len(body) < RASTER_W * RASTER_H  # genuinely compressed
    expect = (render_text_raster(image_tilt_for_doc(6), width=RASTER_W, height=RASTER_H) * 255).astype(np.uint8)
    assert (_decode_image(p) == expect).all()

    sp = build_scan_payload(4)
    expect_scan = (build_scan_raster(4) * 255).astype(np.uint8)
    assert is_png(sp.split(b"\n", 1)[1])
    assert (_decode_image(sp) == expect_scan).all()


def test_decode_rejects_decompression_bombs_cheaply():
    """A crafted IHDR declaring absurd dims, or a high-ratio deflate
    stream behind small declared dims, must raise ValueError BEFORE
    materializing the inflated raster (bomb guard: dims sanity check
    first, then a zlib.decompressobj inflate capped at expected+1)."""
    import time

    # IHDR declares 1e9 x 1e9 greyscale: rejected on dims alone
    huge = struct.pack(">IIBBBBB", 10**9, 10**9, 8, 0, 0, 0, 0)
    bomb1 = PNG_MAGIC + _chunk(b"IHDR", huge) + _chunk(b"IDAT", zlib.compress(b"\x00")) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="out of range"):
        decode_png(bomb1)

    # dims say 2x2 but the stream inflates to 64 MB of zeros (~60000:1):
    # the capped inflate stops at expected+1 bytes, never 64 MB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    blob = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)
    bomb2 = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", blob) + _chunk(b"IEND", b"")
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="data size"):
        decode_png(bomb2)
    assert time.monotonic() - t0 < 1.0

    # zero-dim IHDR is rejected too
    zero = struct.pack(">IIBBBBB", 0, 5, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="out of range"):
        decode_png(PNG_MAGIC + _chunk(b"IHDR", zero) + _chunk(b"IEND", b""))
