"""End-to-end Spark pipeline tests: byte identity at sf0.001, cache
hit/miss semantics, resume-from-checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_wrapper_spark.plans.pipeline import run_extraction
from ocr_wrapper_spark.sources.pages import synthesize_pages

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize_pages(spark, SF).cache()


def test_byte_identity_all_docs(spark, pages):
    """north_rule invariant: byte-identical extracted text per url."""
    result = run_extraction(spark, pages)
    check = (
        result.alias("r")
        .join(pages.alias("p"), "url")
        .select(
            "url",
            (F.col("r.extracted_text") == F.col("p.text")).alias("ok"),
            "r.error",
        )
    )
    rows = check.collect()
    assert len(rows) > 0
    bad = [r for r in rows if not r.ok]
    assert bad == [], f"{len(bad)} docs mismatched, first: {bad[:3]}"


def test_both_providers_present(spark, pages):
    result = run_extraction(spark, pages)
    providers = {r.provider for r in result.select("provider").distinct().collect()}
    assert {"html", "pdf"} <= providers


def test_rotation_and_tilt_variants_seen(spark, pages):
    result = run_extraction(spark, pages)
    rots = {r.doc_rotation for r in result.select("doc_rotation").distinct().collect()}
    assert len(rots) > 1  # rotated PDFs detected
    tilts = result.filter(F.abs(F.col("tilt_angle")) > 0.5).count()
    assert tilts > 0  # tilted PDFs detected


def test_no_errors_on_synthetic_pages(spark, pages):
    result = run_extraction(spark, pages)
    assert result.filter(F.col("error").isNotNull()).count() == 0


def test_cache_roundtrip(spark, pages, tmp_path):
    """Reference cache semantics (ocr_wrapper.py:319-342): second run of the
    same content is served from the cache table."""
    cache_path = str(tmp_path / "cache")
    metrics_path = str(tmp_path / "metrics")

    r1 = run_extraction(
        spark, pages, cache_path=cache_path, metrics_path=metrics_path, run_id="runA"
    )
    n_docs = pages.count()
    assert r1.filter(F.col("is_hit")).count() == 0

    r2 = run_extraction(
        spark, pages, cache_path=cache_path, metrics_path=metrics_path, run_id="runB"
    )
    assert r2.filter(F.col("is_hit")).count() == n_docs
    # hits carry identical results
    t1 = {r.url: r.extracted_text for r in r1.select("url", "extracted_text").collect()}
    t2 = {r.url: r.extracted_text for r in r2.select("url", "extracted_text").collect()}
    assert t1 == t2


def test_metrics_and_resume(spark, pages, tmp_path):
    metrics_path = str(tmp_path / "metrics")
    run_extraction(spark, pages, metrics_path=metrics_path, run_id="runX")

    from ocr_wrapper_spark.sources.metrics import read_metrics

    m = read_metrics(spark, metrics_path)
    agg = m.agg(F.sum("n_docs").alias("n"), F.sum("n_errors").alias("e")).collect()[0]
    assert agg.n == pages.count()
    assert agg.e == 0

    # resuming the same run_id: all buckets done -> nothing left to process
    r = run_extraction(
        spark, pages, metrics_path=metrics_path, run_id="runX", resume=True
    )
    assert r.count() == 0


def test_results_parquet_roundtrip(spark, pages, tmp_path):
    """RESULT schema persists: write results, read back, spans reassemble
    to the same byte-identical text."""
    from ocr_wrapper_spark.operators.extract import assemble_text_col

    out = str(tmp_path / "results")
    run_extraction(spark, pages).write.parquet(out)
    back = spark.read.parquet(out)
    n_bad = back.filter(
        assemble_text_col(F.col("spans")) != F.col("extracted_text")
    ).count()
    assert n_bad == 0
    assert back.count() == pages.count()
    # confidence values survived (0.9 html / 0.95 pdf / 0.97 json / 0.96 hocr)
    confs = {
        r.c
        for r in back.select(F.explode("spans").alias("s"))
        .select(F.round(F.col("s.confidence"), 2).alias("c"))
        .distinct()
        .collect()
    }
    assert confs <= {0.9, 0.95, 0.97, 0.96, 0.93}  # html/pdf/json/hocr/textract dialect confidences
