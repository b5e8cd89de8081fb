"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction run on sf0.001 synthetic pages.
queries()     — every implemented operator exposed as (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query (byte-identity and
                relational cross-checks); non-SQL-expressible ops omit
                their entry (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full extraction pipeline over deterministic
    Common-Crawl-style pages synthesized from sf0.001 documents."""
    from pyspark.sql import functions as F

    from ocr_wrapper_spark.plans.pipeline import run_extraction
    from ocr_wrapper_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    result = run_extraction(spark, pages)
    return result.select(
        "url",
        "content_hash",
        "extracted_text",
        "n_spans",
        "doc_rotation",
        F.round("tilt_angle", 4).alias("tilt_angle"),
        "provider",
        "error",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_wrapper_spark import media_queries, pipeline_queries, text_queries  # noqa: F401 — registers queries
    from ocr_wrapper_spark.relational import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_wrapper_spark import media_queries, pipeline_queries, text_queries  # noqa: F401
    from ocr_wrapper_spark.relational import ORACLES

    return dict(ORACLES)
