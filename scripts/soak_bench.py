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
    mismatches = (
        run_extraction(spark, pages)
        .alias("r")
        .join(pages.alias("p"), "url")
        .filter(F.col("r.extracted_text") != F.col("p.text"))
        .count()
    )
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
                "host_probe": probe,
            }
        )
    )


if __name__ == "__main__":
    main()
