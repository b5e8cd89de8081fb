"""Per-partition lineage + metrics table (north_rule; SURVEY.md §2.11).

Rows: (run_id, bucket, status, n_docs, n_errors, n_cache_hits, wall_ms).
``bucket`` is the url-hash lineage unit — stable across runs and cluster
sizes (unlike physical partition ids), so a restarted job can anti-join
completed buckets regardless of parallelism. Append-only parquet
snapshots, same pattern as the cache table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import METRICS_SCHEMA

STATUS_DONE = "done"


def read_metrics(spark: SparkSession, path: str | None) -> DataFrame:
    if path and os.path.isdir(path) and any(
        name.startswith("snap-") for name in os.listdir(path)
    ):
        return spark.read.schema(METRICS_SCHEMA).parquet(f"{path}/snap-*")
    return spark.createDataFrame([], METRICS_SCHEMA)


def append_metrics(df: DataFrame, path: str) -> None:
    snap = f"{path}/snap-{uuid.uuid4().hex[:12]}"
    df.select([f.name for f in METRICS_SCHEMA.fields]).write.mode("overwrite").parquet(snap)


def completed_buckets(spark: SparkSession, path: str | None, run_id: str) -> DataFrame:
    """Buckets already finished for this run_id (resume-from-failure)."""
    m = read_metrics(spark, path)
    return (
        m.filter((F.col("run_id") == run_id) & (F.col("status") == STATUS_DONE))
        .select("bucket")
        .distinct()
    )
