"""SparkSession factory tuned for the extraction workload.

Settings chosen for scale (see SURVEY.md §4): AQE on (runtime re-plan +
skew-join splitting), shuffle partitions sized to cores for local mode,
Arrow enabled with a small max batch size because rows carry large
``html`` binary payloads (SURVEY.md §7 watch-list item 6).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Large html blobs: keep Arrow batches small so a batch of pages stays well
# under executor memory (at Common-Crawl sizes html averages ~100 KB ->
# 1024 rows/batch ~ 100 MB upper bound; tune down via env for fatter pages).
ARROW_MAX_RECORDS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "1024"))


def get_spark(
    app_name: str = "ocr_wrapper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster the caller passes no master and spark-submit decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; a real cluster would size this to 2-3x total cores.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if inner == "*" else max(8, int(inner))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # bytes cap makes the batch size adapt to the page size: thin
        # synthetic pages run full 1024-row batches, 70KB+ real-web pages
        # get cut to ~100 rows (measured 2.7x on fat pages; oversized
        # batches stall the JVM<->worker pipeline and bloat task memory)
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BYTES", str(8 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
