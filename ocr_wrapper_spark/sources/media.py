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
# RASTER_H) rendered with a closed-form tilt angle, so the raster tilt
# kernel has actual pixels to decode and the oracle can recompute the
# expected angle from doc_id
TILT_ANGLES = [-8, -4, -2, 0, 2, 4, 8]
RASTER_W, RASTER_H = 160, 120

_RASTER_CACHE: dict[int, bytes] = {}


def image_tilt_for_doc(doc_id: int) -> int:
    return TILT_ANGLES[doc_id % len(TILT_ANGLES)]


def _raster_bytes(angle: int) -> bytes:
    body = _RASTER_CACHE.get(angle)
    if body is None:
        from ..kernels.raster_tilt import render_text_raster

        r = render_text_raster(angle, width=RASTER_W, height=RASTER_H)
        body = (r * 255).astype(np.uint8).tobytes()
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
