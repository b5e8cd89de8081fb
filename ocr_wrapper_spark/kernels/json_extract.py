"""JSON-layout payload dialect — the third provider branch.

Mirrors the breadth of the reference's provider registry
(autoselect.py:17-27 registers google/azure/aws/easy/paddle; each
converter turns a provider-specific response shape into the common
BBox+text+confidence list, e.g. aws.py:54-56, easy_ocr.py,
paddleocr.py). Here the third response dialect is a documentai-style
JSON layout document:

    {"layout": {"width": W, "height": H, "lang": "..",
                "pages": [{"id": 0,
                           "spans": [{"t": word, "c": conf,
                                      "q": [x0,y0,...x3,y3]}, ...]}]}}

The converter returns the exact tuple shape of
``pdf_extract.parse_pdf_payload`` so the downstream normalize -> rotate
-> date-split -> order pipeline is shared verbatim between dialects.
"""

from __future__ import annotations

import json

import numpy as np

JSON_MAGIC = b'{"layout"'


def is_json_layout(payload: bytes) -> bool:
    return payload[: len(JSON_MAGIC)] == JSON_MAGIC


def parse_json_payload(payload: bytes):
    """JSON layout document -> (raw_quads (n,8), texts, confidences,
    page_width, page_height, lang, page_ids). Spans missing a quad or
    text are dropped (the F3 non-WORD-block filter analogue for this
    dialect)."""
    doc = json.loads(payload.decode("utf-8", errors="replace"))
    layout = doc.get("layout") or {}
    width = int(layout.get("width") or 1224)
    height = int(layout.get("height") or 1584)
    lang = str(layout.get("lang") or "")
    quads: list[list[float]] = []
    words: list[str] = []
    confs: list[float] = []
    pages: list[int] = []
    for page in layout.get("pages") or []:
        pid = int(page.get("id") or 0)
        for span in page.get("spans") or []:
            q = span.get("q")
            t = span.get("t")
            if q is None or t is None or len(q) != 8:
                continue
            quads.append(q)  # numeric conversion batched below (C loop)
            words.append(str(t))
            confs.append(float(span.get("c") or 0.0))
            pages.append(pid)
    coords = np.asarray(quads, dtype=np.float64).reshape(-1, 8)
    return coords, words, confs, width, height, lang, np.asarray(pages, dtype=np.int64)
