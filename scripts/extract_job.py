"""Cluster job entry point — run via spark-submit --py-files.

    python scripts/make_pyfiles_zip.py        # -> dist/ocr_wrapper_spark.zip
    spark-submit --py-files dist/ocr_wrapper_spark.zip \
        scripts/extract_job.py \
        --input  <pages table path>  \
        --output <results table path> \
        --cache  <cache table path>  \
        --metrics <metrics table path> \
        --run-id nightly-2024-06-01 [--resume]

No cluster-only APIs: the same script runs on local[N] for tests and on
a real cluster (master comes from spark-submit). The pages input is any
parquet/Iceberg table with the input_hint schema
(url, warc_ts, html, text, lang).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cache", default=None)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--buckets", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_wrapper_spark.plans.pipeline import run_extraction

    spark = SparkSession.builder.appName("ocr_wrapper_spark.extract").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    pages = spark.read.parquet(args.input)
    result = run_extraction(
        spark,
        pages,
        cache_path=args.cache,
        metrics_path=args.metrics,
        run_id=args.run_id,
        n_buckets=args.buckets,
        resume=args.resume,
    )
    result.write.mode("append").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
