"""Fat-page profile knob (BENCH/BASELINE.md §1d): inflating payloads to
realistic Common-Crawl sizes must never change the extracted text.

Each dialect pads in a channel its parser provably ignores:
html -> link-wall nav (link_density 1.0), pdf -> % comment lines,
json -> unread top-level key, hocr -> XML comment, textract -> extra
LINE blocks (WORD-only cut)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_wrapper_spark.kernels.extract_doc import extract_document
from ocr_wrapper_spark.plans.pipeline import run_extraction
from ocr_wrapper_spark.sources import pages as pg

SF = "/root/testdata/sf0.001"
FAT = 40_000

_CASES = [
    # doc_id chosen so each builder matches its dialect's doc_id class
    (pg.build_html, 2, "html"),
    (pg.build_json, 1, "json"),
    (pg.build_pdf, 3, "pdf"),
    (pg.build_hocr, 4, "hocr"),
    (pg.build_textract, 7, "textract"),
]


@pytest.mark.parametrize("builder,did,name", _CASES, ids=[c[2] for c in _CASES])
def test_fat_pad_inflates_but_extraction_identical(builder, did, name):
    text = " ".join(f"tok{i}" for i in range(120))
    lean = builder(did, text, "en")
    fat = builder(did, text, "en", FAT)
    assert len(fat) >= len(lean) + int(FAT * 0.8), (name, len(lean), len(fat))
    r_lean = extract_document(lean, "en")
    r_fat = extract_document(fat, "en")
    assert r_fat.error is None
    assert r_fat.extracted_text == r_lean.extracted_text == text


def test_fat_pages_byte_identity_end_to_end(spark):
    """north_rule invariant holds at fat page sizes through the full
    Spark pipeline (all five dialect classes present at sf0.001)."""
    pages = pg.synthesize_pages(spark, SF, fat_pad=FAT).cache()
    try:
        mean_bytes = pages.select(F.avg(F.length("html"))).first()[0]
        assert mean_bytes > FAT * 0.8
        result = run_extraction(spark, pages)
        bad = (
            result.alias("r")
            .join(pages.alias("p"), "url")
            .filter(F.col("r.extracted_text") != F.col("p.text"))
            .count()
        )
        assert bad == 0
    finally:
        pages.unpersist()


# property: ANY fat_pad size preserves extraction on every dialect
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    pad=st.integers(min_value=0, max_value=120_000),
    case=st.sampled_from(_CASES),
    n_words=st.integers(min_value=0, max_value=150),
)
def test_fat_pad_identity_property(pad, case, n_words):
    builder, did, name = case
    text = " ".join(f"w{i}" for i in range(n_words))
    r = extract_document(builder(did, text, "en", pad), "en")
    expect = extract_document(builder(did, text, "en"), "en")
    assert r.error == expect.error
    assert r.extracted_text == expect.extracted_text
