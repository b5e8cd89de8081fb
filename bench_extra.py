"""Per-query measurement harness for optimization work (guide §1).

bench.py is FROZEN for driver measurement; this file exists so the
optimization rounds can time individual queries, with more repeats,
at any scale factor, and capture `.explain("formatted")` plans —
without touching the frozen methodology.

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--noop] [--plans OUTDIR] q1 q2 ...

Timing methodology matches bench.py (best-of-N `.count()`), unless
--noop is given, in which case every column of every row is computed
and discarded through the noop sink (guide §1.4) — use that when a
query's projection hides work that `.count()` would let the optimizer
prune.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="write <q>.txt explain output here")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ocr_wrapper_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    spark.range(1000).count()  # warm JVM

    names = args.queries or list(qs)
    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qs[name](spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        if args.reps == 0:  # plan capture only
            continue
        best, n = None, 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "reps": args.reps, "noop": args.noop, "queries": timings}))


if __name__ == "__main__":
    main()
