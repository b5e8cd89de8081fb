"""Resume-from-checkpoint + cache-hit evidence at soak scale.

The north rule requires the job to checkpoint per-partition lineage +
metrics and resume from failure. The unit test proves the mechanism at
sf0.001; this harness proves it at 200k pages with real wall-clock:

phase 1  "crashed" run — extraction over HALF the url-hash buckets,
         cache + metrics written under run_id.
phase 2  resume — same run_id, resume=True over the full table: the
         completed-buckets anti-join must skip phase-1 work, output
         exactly the missing docs, and cost about half a full run.
phase 3  warm re-run — a fresh run over the full table with the now-
         populated cache: every row must be a cache hit (is_hit), no
         extraction recomputed.

Prints ONE JSON line with per-phase wall/doc counts and the invariant
checks. Usage: python scripts/resume_bench.py [--replicate 40]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=40)
    args = ap.parse_args()

    import host_health

    probe = host_health.probe()
    print(f"# host probe: {probe}", file=sys.stderr)

    from pyspark.sql import functions as F

    from ocr_wrapper_spark.plans.pipeline import run_extraction
    from ocr_wrapper_spark.plans.partitioning import DEFAULT_BUCKETS, with_url_bucket
    from ocr_wrapper_spark.session import get_spark
    from ocr_wrapper_spark.sources.metrics import read_metrics
    from ocr_wrapper_spark.sources.pages import materialize_pages

    spark = get_spark(app_name="resume_bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")

    path = materialize_pages(spark, args.sf_dir, replicate=args.replicate, partitions=256)
    pages = spark.read.parquet(path)
    n_total = pages.count()

    bucketed = with_url_bucket(pages)
    half = DEFAULT_BUCKETS // 2
    first_half = bucketed.filter(F.col("bucket") < half).drop("bucket")

    work = tempfile.mkdtemp(prefix="resume_bench_")
    cache_path = f"{work}/cache"
    metrics_path = f"{work}/metrics"
    run_id = "soakresume"

    run_extraction(spark, pages.limit(2048)).count()  # warm workers

    t0 = time.perf_counter()
    p1 = run_extraction(
        spark, first_half, cache_path=cache_path, metrics_path=metrics_path, run_id=run_id
    ).count()
    w1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    resumed = run_extraction(
        spark, pages, cache_path=cache_path, metrics_path=metrics_path,
        run_id=run_id, resume=True,
    )
    p2 = resumed.count()
    p2_in_done_buckets = resumed.filter(F.col("bucket") < half).count()
    w2 = time.perf_counter() - t0

    m = read_metrics(spark, metrics_path).filter(F.col("run_id") == run_id)
    buckets_done = m.select("bucket").distinct().count()

    t0 = time.perf_counter()
    warm = run_extraction(spark, pages, cache_path=cache_path, run_id="warm")
    n_hits = warm.filter(F.col("is_hit")).count()
    w3 = time.perf_counter() - t0

    shutil.rmtree(work, ignore_errors=True)

    checks = {
        "resume_outputs_only_missing": p2 == n_total - p1,
        "resume_skips_done_buckets": p2_in_done_buckets == 0,
        "all_buckets_recorded_done": buckets_done == DEFAULT_BUCKETS,
        "warm_run_all_cache_hits": n_hits == n_total,
    }
    print(
        json.dumps(
            {
                "metric": "resume-from-checkpoint + cache warm-run at 200k pages",
                "n_pages": int(n_total),
                "phase1_crashed_half": {"docs": int(p1), "wall_sec": round(w1, 1)},
                "phase2_resume": {"docs": int(p2), "wall_sec": round(w2, 1)},
                "phase3_warm_cache": {"hits": int(n_hits), "wall_sec": round(w3, 1)},
                "checks": checks,
                "all_green": all(checks.values()),
                "host_probe": probe,
            }
        )
    )
    sys.exit(0 if all(checks.values()) else 1)


if __name__ == "__main__":
    main()
