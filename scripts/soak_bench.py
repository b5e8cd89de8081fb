"""Million-page soak: the north rule's invariant (byte-identical
extracted text per url) verified at 10^6 pages in one run, with
sustained-throughput numbers over a materialized pages table 6x the
headline bench's size.

Prints ONE JSON line. The full 5-dialect mix, rotation/tilt variants,
checkbox/QR carriers — everything the generator emits — at
replicate=200 over sf0.1 (5,000 docs -> 1,000,000 pages).

Usage: python scripts/soak_bench.py [--replicate 200] [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=200)
    ap.add_argument("--hostile-ppm", type=int, default=0,
                    help="replace ~this many rows per million with hostile "
                         "payloads (junk bytes, truncated dialect headers, "
                         "NULL/empty) and assert they degrade to error/empty "
                         "rows without killing tasks or touching the rest")
    ap.add_argument("--keep-table", action="store_true")
    args = ap.parse_args()

    import host_health

    probe = host_health.probe()
    print(f"# host probe: {probe}", file=sys.stderr)

    from pyspark.sql import functions as F

    from bench import tree_cpu_seconds
    from ocr_wrapper_spark.plans.pipeline import run_extraction
    from ocr_wrapper_spark.session import get_spark
    from ocr_wrapper_spark.sources.pages import materialize_pages

    spark = get_spark(app_name="soak_bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # same split sizing rationale as bench.py: synthetic pages compress
    # ~6x denser than real web html
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")

    t0 = time.perf_counter()
    path = materialize_pages(spark, args.sf_dir, replicate=args.replicate, partitions=512)
    mat_sec = time.perf_counter() - t0
    pages = spark.read.parquet(path)

    hostile_stats = None
    if args.hostile_ppm:
        # deterministic per-url selection; 5 hostile classes round-robin.
        # All JVM-side exprs — the corruption itself must not add a
        # Python stage to the plan being measured.
        sel = F.abs(F.hash("url")) % 1_000_000 < args.hostile_ppm
        variant = F.abs(F.hash("url", F.lit(1))) % 5
        # NOTE: junk must stay SHORT — long printable runs legitimately
        # degrade through the plain-text fallback to extracted text
        # (a reference OCR engine also reads garbage off a garbage
        # image), which would blur the error/empty accounting below
        hostile_body = (
            F.when(variant == 0, F.lit(b"\xff\xfe garbage \x00\x01 not html"))
            .when(variant == 1, F.lit(b"%PDF-GRAFT1.0\n%W notanint x\nS 0.1"))  # truncated/corrupt PDF
            .when(variant == 2, F.lit(b'{"DocumentMetadata": {"Pages": '))  # cut-off Textract JSON
            .when(variant == 3, F.lit(None).cast("binary"))  # NULL payload
            .otherwise(F.lit(b""))  # empty payload
        )
        pages = pages.withColumn("_hostile", sel).withColumn(
            "html", F.when(sel, hostile_body).otherwise(F.col("html"))
        )

    n_pages, total_bytes = pages.select(F.count("*"), F.sum(F.length("html"))).first()
    print(f"# materialized {n_pages} pages ({total_bytes / 2**30:.1f} GiB payload, "
          f"{mat_sec:.0f}s incl. cache hit)", file=sys.stderr)

    run_extraction(spark, pages.limit(4096)).count()  # warm workers
    cpu0 = tree_cpu_seconds()
    t0 = time.perf_counter()
    n_out = run_extraction(spark, pages).count()
    wall = time.perf_counter() - t0
    cpu_ms_per_doc = round((tree_cpu_seconds() - cpu0) / n_pages * 1000, 3)

    t0 = time.perf_counter()
    joined = (
        run_extraction(spark, pages)
        .alias("r")
        .join(pages.alias("p"), "url")
    )
    if args.hostile_ppm:
        agg = joined.select(
            F.sum(
                F.when(
                    ~F.col("p._hostile")
                    & (F.col("r.extracted_text") != F.col("p.text")),
                    1,
                ).otherwise(0)
            ).alias("clean_mismatch"),
            F.sum(F.when(F.col("p._hostile"), 1).otherwise(0)).alias("n_hostile"),
            F.sum(
                F.when(F.col("p._hostile") & F.col("r.error").isNotNull(), 1).otherwise(0)
            ).alias("hostile_error_rows"),
            F.sum(
                F.when(
                    F.col("p._hostile")
                    & F.col("r.error").isNull()
                    & (F.coalesce(F.col("r.extracted_text"), F.lit("")) == ""),
                    1,
                ).otherwise(0)
            ).alias("hostile_empty_rows"),
        ).first()
        mismatches = agg["clean_mismatch"]
        hostile_stats = {
            "n_hostile": int(agg["n_hostile"]),
            "error_rows": int(agg["hostile_error_rows"]),
            "empty_rows": int(agg["hostile_empty_rows"]),
            # every hostile row must land in one of the two degraded
            # outcomes; anything else would mean garbage text got through
            "unaccounted": int(
                agg["n_hostile"] - agg["hostile_error_rows"] - agg["hostile_empty_rows"]
            ),
        }
    else:
        mismatches = joined.filter(
            F.col("r.extracted_text") != F.col("p.text")
        ).count()
    verify_sec = time.perf_counter() - t0

    if not args.keep_table:
        shutil.rmtree(path, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "1M-page soak: byte-identical extraction, sustained docs/sec",
                "n_pages": int(n_pages),
                "payload_gib": round(total_bytes / 2**30, 2),
                "rows_out": int(n_out),
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(n_pages / wall, 1),
                "cpu_ms_per_doc": cpu_ms_per_doc,
                "byte_identity_mismatches": int(mismatches),
                "verify_pass_sec": round(verify_sec, 1),
                "hostile": hostile_stats,
                "host_probe": probe,
            }
        )
    )


if __name__ == "__main__":
    main()
