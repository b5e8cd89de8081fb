"""Fat-page profile (BENCH/BASELINE.md §1d): realistic Common-Crawl page
sizes over the FULL 5-dialect mix + compressed-PNG media payloads.

Prints ONE JSON line. Two sections:

1. extract: materialize a fat pages table (~71 KB mean payload via the
   ``fat_pad`` knob in sources/pages.py — every dialect pads in a channel
   its parser provably ignores), run the full extraction pipeline under
   the session-default 8 MB Arrow byte cap, and verify the north_rule
   byte identity (0 mismatches) while measuring docs/s and payload MB/s.
2. media: big (1024x768) PNG-compressed rasters, one UNIQUE raster per
   row (per-row salt pixels that the 3x3 median denoise removes, so the
   per-task md5 memo in detect_raster_tilt cannot shortcut decode), tilt
   detected from pixels and checked against the closed-form angle.

Usage: python scripts/fatpage_bench.py [--docs 8000] [--fat-pad 65000]
       [--media-rows 1024] [--sf-dir /root/testdata/sf0.01]
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

import numpy as np
import pandas as pd


def fat_extract_section(spark, sf_dir: str, target_docs: int, fat_pad: int) -> dict:
    from pyspark.sql import functions as F

    from ocr_wrapper_spark.plans.pipeline import run_extraction
    from ocr_wrapper_spark.sources.pages import materialize_pages

    from bench import tree_cpu_seconds

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    replicate = max(1, -(-target_docs // n_docs))

    # fat pages are ~20x the lean profile per row: keep the scan balanced
    # at 32 cores (same reasoning as bench.py's 1m split for lean pages)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    spark.conf.set("spark.sql.files.openCostInBytes", "4m")

    path = materialize_pages(spark, sf_dir, replicate=replicate, partitions=64, fat_pad=fat_pad)
    pages = spark.read.parquet(path)
    n_pages, total_bytes = pages.select(
        F.count("*"), F.sum(F.length("html"))
    ).first()
    mean_kb = total_bytes / n_pages / 1024

    run_extraction(spark, pages.limit(2048)).count()  # warm workers
    best = None
    cpu0 = tree_cpu_seconds()
    runs = 3
    for _ in range(runs):
        t0 = time.perf_counter()
        run_extraction(spark, pages).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    cpu_ms_per_doc = round((tree_cpu_seconds() - cpu0) / (runs * n_pages) * 1000, 3)

    mismatches = (
        run_extraction(spark, pages)
        .alias("r")
        .join(pages.alias("p"), "url")
        .filter(F.col("r.extracted_text") != F.col("p.text"))
        .count()
    )
    return {
        "n_pages": int(n_pages),
        "mean_page_kb": round(mean_kb, 1),
        "total_mb": round(total_bytes / 2**20, 1),
        "wall_sec": round(best, 2),
        "docs_per_sec": round(n_pages / best, 1),
        "payload_mb_per_sec": round(total_bytes / 2**20 / best, 1),
        "cpu_ms_per_doc": cpu_ms_per_doc,
        "byte_identity_mismatches": int(mismatches),
    }


def fat_media_section(spark, media_rows: int) -> dict:
    """Big compressed rasters through the tilt kernel — every payload
    unique so every row pays a real PNG decode under the 8 MB cap."""
    from pyspark.sql import functions as F

    from ocr_wrapper_spark.kernels.png_codec import encode_png
    from ocr_wrapper_spark.kernels.raster_tilt import render_text_raster
    from ocr_wrapper_spark.operators import multimodal as mm
    from ocr_wrapper_spark.sources.media import TILT_ANGLES

    W, H = 1024, 768
    # realistic scan metrics (~13 text lines per page) + per-line word
    # stagger — fixed-pitch dashes at 9px line height would be 85 lines
    # of ant print with a page-wide vertical word lattice, a shape no
    # real scan has and one that defeats the projection scan
    lh = max(9, H // 13)
    base = {
        a: render_text_raster(
            a, width=W, height=H, line_h=lh, thickness=max(2, lh // 4),
            word_w=max(8, lh), gap=max(3, lh // 3), margin=max(10, H // 12),
            stagger=True,
        )
        for a in TILT_ANGLES
    }

    def payload(mid: int) -> bytes:
        a = TILT_ANGLES[mid % len(TILT_ANGLES)]
        img = (base[a] * 255).astype(np.uint8).copy()
        # per-row salt pixels (removed by the 3x3 median denoise): makes
        # the PNG bytes unique per row without perturbing the detector
        rng = np.random.default_rng(mid)
        ys = rng.integers(1, H - 1, size=8)
        xs = rng.integers(1, W - 1, size=8)
        img[ys, xs] = 255 - img[ys, xs]
        body = encode_png(img)
        return f"MM01 image {W} {H} 0 0 1\n".encode("ascii") + body

    sample = payload(0)
    pdf = pd.DataFrame(
        {"media_id": np.arange(media_rows, dtype=np.int64),
         "payload": [payload(i) for i in range(media_rows)]}
    )
    df = spark.createDataFrame(pdf).repartition(32).cache()
    df.count()

    t0 = time.perf_counter()
    detected = (
        mm.detect_raster_tilt(df)
        .select("media_id", F.round("tilt_deg", 0).cast("long").alias("deg"))
        .collect()
    )
    wall = time.perf_counter() - t0
    df.unpersist()
    wrong = sum(1 for r in detected if r.deg != TILT_ANGLES[r.media_id % len(TILT_ANGLES)])
    return {
        "rows": media_rows,
        "raster_px": f"{W}x{H}",
        "png_kb_per_row": round(len(sample) / 1024, 1),
        "decoded_mb_per_row": round(W * H / 2**20, 2),
        "wall_sec": round(wall, 2),
        "images_per_sec": round(media_rows / wall, 1),
        "tilt_mismatches": int(wrong),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--docs", type=int, default=8000)
    ap.add_argument("--fat-pad", type=int, default=65000)
    ap.add_argument("--media-rows", type=int, default=1024)
    ap.add_argument("--keep-table", action="store_true")
    args = ap.parse_args()

    import host_health

    probe = host_health.probe()
    print(f"# host probe: {probe}", file=sys.stderr)

    from ocr_wrapper_spark.session import get_spark

    spark = get_spark(
        app_name="fatpage_bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    arrow_cap = spark.conf.get("spark.sql.execution.arrow.maxBytesPerBatch", "unset")

    extract = fat_extract_section(spark, args.sf_dir, args.docs, args.fat_pad)
    print(f"# extract: {extract}", file=sys.stderr)
    media = fat_media_section(spark, args.media_rows)
    print(f"# media: {media}", file=sys.stderr)

    if not args.keep_table:
        # fat tables are ~0.5 GB in /tmp — don't leave them behind
        for d in os.listdir("/tmp/spark_graft_pages"):
            if d.endswith(f"_f{args.fat_pad}"):
                shutil.rmtree(f"/tmp/spark_graft_pages/{d}", ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "fat-page profile: 5-dialect mix + PNG media under the Arrow byte cap",
                "arrow_max_bytes_per_batch": arrow_cap,
                "extract": extract,
                "media": media,
                "host_probe": probe,
            }
        )
    )


if __name__ == "__main__":
    main()
