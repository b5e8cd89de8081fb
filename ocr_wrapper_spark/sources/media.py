"""Deterministic synthetic media table (image/audio/video payloads).

Derived from the documents table like pages.py — no external data. One
media row per document: kind cycles image/audio/video by doc_id; dims,
sample rate, duration and frame counts are closed-form functions of
doc_id so DuckDB oracles can recompute every derived value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import MEDIA_MAGIC

KINDS = ["image", "audio", "video"]


def media_attrs(doc_id: int) -> tuple[str, int, int, int, int, int]:
    kind = KINDS[doc_id % 3]
    width = 320 + (doc_id * 37) % 3000 if kind != "audio" else 0
    height = 240 + (doc_id * 53) % 2000 if kind != "audio" else 0
    sample_rate = 16000 if kind == "audio" else 0
    duration_ms = 1000 + (doc_id * 97) % 30000 if kind != "image" else 0
    n_frames = max(1, duration_ms * 25 // 1000) if kind == "video" else (1 if kind == "image" else 0)
    return kind, width, height, sample_rate, duration_ms, n_frames


# image payloads embed a real raster (uint8 grayscale, RASTER_W x
# RASTER_H) rendered with a closed-form tilt angle and compressed as a
# real PNG (kernels/png_codec.py — the reference ingests compressed
# images via PIL, ocr_wrapper.py:103), so the raster tilt kernel has an
# actual codec round-trip to run and the oracle can still recompute the
# expected angle from doc_id (PNG is lossless)
TILT_ANGLES = [-8, -4, -2, 0, 2, 4, 8]
RASTER_W, RASTER_H = 160, 120

_RASTER_CACHE: dict[int, bytes] = {}


def image_tilt_for_doc(doc_id: int) -> int:
    return TILT_ANGLES[doc_id % len(TILT_ANGLES)]


def _raster_bytes(angle: int) -> bytes:
    body = _RASTER_CACHE.get(angle)
    if body is None:
        from ..kernels.png_codec import encode_png
        from ..kernels.raster_tilt import render_text_raster

        r = render_text_raster(angle, width=RASTER_W, height=RASTER_H)
        body = encode_png((r * 255).astype(np.uint8))
        _RASTER_CACHE[angle] = body
    return body


def build_media_payload(doc_id: int) -> bytes:
    kind, w, h, sr, dur, nf = media_attrs(doc_id)
    header = f"MM01 {kind} {w} {h} {sr} {dur} {nf}\n".encode("ascii")
    assert header[:4] == MEDIA_MAGIC
    if kind == "image":
        body = _raster_bytes(image_tilt_for_doc(doc_id))
    else:
        body = (np.arange(64, dtype=np.uint64) * np.uint64(doc_id * 2 + 1)).tobytes()
    return header + body


# ---------------------------------------------------------------------------
# scan pages: text dashes + one machine-readable code symbol per page.
# Everything the decoder must recover (type, data, pixel box) is a
# closed-form function of doc_id so the DuckDB oracle can recompute it —
# but the decoder itself sees only pixels (kernels/raster_codes.py).
# ---------------------------------------------------------------------------

SCAN_W, SCAN_H = 360, 200
SCAN_TEXT_H = 110  # top band: tilt-0 text dashes (distractor content)
SCAN_CODE_Y0 = 120  # code band floor
QR_CHECK_MOD = 97
QR_CHECK_MULT = 2654435761  # Knuth multiplicative hash constant


def scan_code_attrs(doc_id: int) -> tuple[str, str, int, int]:
    """(code_type, data, x0, y0) for the code on doc_id's scan page.
    Payloads are FIXED LENGTH so the symbol fits the 200px page at any
    doc_id: QR carries doc_id mod 10^6 plus a checksum of the full id
    (60x36 px: 16 data cols, 13-byte payload, 3px modules); the barcode
    carries doc_id mod 10^10 (36px tall, data-dependent width, 2px
    modules)."""
    y0 = SCAN_CODE_Y0 + (doc_id * 7) % 40
    if doc_id % 2 == 0:
        data = f"DOC-{doc_id % 1_000_000:06d}-{doc_id * QR_CHECK_MULT % QR_CHECK_MOD:02d}"
        return "QRCODE", data, 10 + (doc_id * 13) % 280, y0
    return "CODE128", f"{doc_id % 10_000_000_000:010d}", 10 + (doc_id * 13) % 40, y0


_SCAN_TEXT_BAND: list[np.ndarray] = []


def _scan_text_band() -> np.ndarray:
    """The distractor text band is tilt-0 for every scan page — render it
    once per worker instead of once per document (same array, the heavy
    per-page work is the code symbol + the PNG encode)."""
    if not _SCAN_TEXT_BAND:
        from ..kernels.raster_tilt import render_text_raster

        _SCAN_TEXT_BAND.append(render_text_raster(0.0, width=SCAN_W, height=SCAN_TEXT_H))
    return _SCAN_TEXT_BAND[0]


def build_scan_raster(doc_id: int) -> np.ndarray:
    from ..kernels.raster_codes import render_barcode, render_qr

    img = np.zeros((SCAN_H, SCAN_W), dtype=np.float32)
    img[:SCAN_TEXT_H] = _scan_text_band()
    kind, data, x0, y0 = scan_code_attrs(doc_id)
    if kind == "QRCODE":
        render_qr(img, data, x0, y0)
    else:
        render_barcode(img, data, x0, y0)
    return img


def build_scan_payload(doc_id: int) -> bytes:
    from ..kernels.png_codec import encode_png

    header = f"MM01 image {SCAN_W} {SCAN_H} 0 0 1\n".encode("ascii")
    body = encode_png((build_scan_raster(doc_id) * 255).astype(np.uint8))
    return header + body


def synthesize_scans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan page per document: (scan_id, payload) with a real raster
    embedding one code symbol at a doc_id-derived position."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "scan_id": ids,
                    "payload": [build_scan_payload(int(i)) for i in ids],
                }
            )

    return docs.mapInPandas(gen, schema="scan_id long, payload binary")


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [build_media_payload(int(i)) for i in ids],
                }
            )

    return docs.mapInPandas(gen, schema="media_id long, payload binary")
