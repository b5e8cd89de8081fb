"""Hostile-input and partial-resume behavior (codified from the verify
probes): failures become error rows, never task failures; resume
processes exactly the unfinished buckets."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ocr_wrapper_spark.plans.pipeline import run_extraction
from ocr_wrapper_spark.schema import PAGES_SCHEMA

TS = datetime.datetime(2024, 1, 1)

HOSTILE = [
    ("u1", TS, b"\xff\xfe garbage \x00\x01 not html", "", "en"),
    ("u2", TS, b"%PDF-GRAFT1.0\n%W abc def\nS broken line", "", "en"),
    ("u3", TS, None, "", "en"),
    ("u4", TS, b"<html><body></body></html>", "", "en"),
    ("u5", TS, b"%PDF-GRAFT1.0\n%W 100 100\n%L en\nS 0.1 0.1 0.2 0.1 0.2 0.2 0.1 0.2 nan word", "", "en"),
    ("u6", TS, ("<div>" + "word " * 50 + "</div>").encode(), None, None),
]


def test_hostile_payloads_become_error_rows(spark):
    df = spark.createDataFrame(HOSTILE, PAGES_SCHEMA)
    out = {r.url: r for r in run_extraction(spark, df).collect()}
    assert set(out) == {"u1", "u2", "u3", "u4", "u5", "u6"}  # no row lost
    assert out["u2"].error is not None  # malformed header -> error row
    assert out["u3"].error == "null payload"
    assert out["u1"].error is None and out["u1"].n_spans == 0
    assert out["u4"].n_spans == 0
    assert out["u5"].n_spans == 1
    assert out["u6"].n_spans == 50


def test_partial_resume_processes_only_missing_buckets(spark, tmp_path):
    from ocr_wrapper_spark.sources.metrics import append_metrics, read_metrics
    from ocr_wrapper_spark.sources.pages import synthesize_pages
    from ocr_wrapper_spark.plans.partitioning import with_url_bucket

    metrics_path = str(tmp_path / "metrics")
    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    bucketed = with_url_bucket(pages.withColumn("content_hash", F.sha2(F.col("html"), 256)))
    buckets = sorted(r.bucket for r in bucketed.select("bucket").distinct().collect())
    half = buckets[: len(buckets) // 2]

    # simulate a crashed first attempt that finished only `half`
    fake = (
        bucketed.filter(F.col("bucket").isin(half))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("run_id", F.lit("crashed"))
        .withColumn("status", F.lit("done"))
        .withColumn("n_errors", F.lit(0).cast("long"))
        .withColumn("n_cache_hits", F.lit(0).cast("long"))
        .withColumn("wall_ms", F.lit(0.0))
    )
    append_metrics(fake, metrics_path)

    resumed = run_extraction(
        spark, pages, metrics_path=metrics_path, run_id="crashed", resume=True
    )
    done_docs = bucketed.filter(F.col("bucket").isin(half)).count()
    total = pages.count()
    assert resumed.count() == total - done_docs
    assert resumed.filter(F.col("bucket").isin(half)).count() == 0

    # after the resumed run, every bucket is recorded done for the run
    m = read_metrics(spark, metrics_path).filter(
        (F.col("run_id") == "crashed") & (F.col("status") == "done")
    )
    assert {r.bucket for r in m.select("bucket").distinct().collect()} == set(buckets)


def test_iceberg_gate_detects_absence(spark):
    from ocr_wrapper_spark.sources.iceberg import is_iceberg_available, iceberg_session_conf

    # the sandbox image ships no Iceberg jar — the gate must say so
    assert is_iceberg_available(spark) is False
    conf = iceberg_session_conf("/tmp/warehouse")
    assert conf["spark.sql.catalog.graft.type"] == "hadoop"
