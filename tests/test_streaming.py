"""Structured Streaming pipeline tests (memory/file sinks, synchronous
processAllAvailable at sf0.001)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_wrapper_spark.sources.pages import synthesize_pages

SF = "/root/testdata/sf0.001"


def test_stream_extraction_matches_batch(spark, tmp_path):
    from ocr_wrapper_spark.streaming.stream import stream_extraction

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    synthesize_pages(spark, SF).repartition(4).write.parquet(pages_dir)

    q = stream_extraction(spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out_dir)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert got.count() == docs.count()
    joined = got.join(
        synthesize_pages(spark, SF).select("url", F.col("text").alias("expect")), "url"
    )
    assert joined.filter(F.col("extracted_text") != F.col("expect")).count() == 0

    # restart on the same checkpoint: no new files -> no duplicate output
    q2 = stream_extraction(spark, pages_dir, out_dir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out_dir).count() == docs.count()


def test_streaming_event_windows(spark, tmp_path):
    from ocr_wrapper_spark.streaming.stream import streaming_event_window_counts

    # file-stream source needs a directory of parquet files
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(events_dir)
    agg = streaming_event_window_counts(spark, events_dir)
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_windows")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from evt_windows").collect()
    assert len(rows) > 0
    # cross-check totals against the batch engine
    batch_total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in rows) == batch_total
