"""v0 <-> v1 span format round trip (reference compat.py:9-34).

v1 (this engine's native span struct): {bbox fields flattened, text,
label, confidence}. v0 "flat" form: the BBox dataclass with text/label
attached and confidence carried separately — as columns:
``spans_v0: array<struct<...coords, in_pixels, text, label>>`` +
``confidences: array<double>`` (the reference's extra["confidences"]
list-of-lists, ocr_wrapper.py:143-144).

Pure JVM transforms — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import COORD_FIELDS


def spans_to_v0(spans_col: Column) -> tuple[Column, Column]:
    """v1 span array -> (v0 bbox array without confidence, confidence
    array) — reference convert_to_old_format (compat.py:26-34)."""
    bboxes = F.transform(
        spans_col,
        lambda s: F.struct(
            *[s[c].alias(c) for c in COORD_FIELDS],
            s["in_pixels"].alias("in_pixels"),
            s["text"].alias("text"),
            s["label"].alias("label"),
        ),
    )
    confidences = F.transform(spans_col, lambda s: s["confidence"])
    return bboxes, confidences


def v0_to_spans(bboxes_col: Column, confidences_col: Column) -> Column:
    """(v0 bbox array, confidence array) -> v1 span array — reference
    convert_to_new_format (compat.py:9-23)."""
    idx = F.sequence(F.lit(0), F.size(bboxes_col) - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            *[F.element_at(bboxes_col, i + 1)[c].alias(c) for c in COORD_FIELDS],
            F.element_at(bboxes_col, i + 1)["in_pixels"].alias("in_pixels"),
            F.element_at(bboxes_col, i + 1)["text"].alias("text"),
            F.element_at(bboxes_col, i + 1)["label"].alias("label"),
            F.element_at(confidences_col, i + 1).alias("confidence"),
        ),
    )
