"""Deterministic stratified sampling for training-mix construction.

A training corpus is rarely used as-is: each source gets a weight —
downsample boilerplate-heavy crawls, repeat high-quality sources for
multiple epochs (the public LLaMA/Pile recipe shape). Rates are
per-stratum:

* rate < 1  — Bernoulli downsample at that rate
* rate >= 1 — every doc appears floor(rate) times, plus one more with
  probability frac(rate) (fractional epochs)

Selection uses the same Knuth multiplicative hash as doc_train_split:
``u = ((id * 2654435761) % 2^32) / 2^32`` — deterministic across runs,
partitionings, and cluster sizes, exactly reproducible in SQL. The
whole operator is narrow (filter + explode, no shuffle); only the
monitoring rollup aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 4294967296


def knuth_u(key):
    """Uniform-in-[0,1) Knuth multiplicative hash of a long column,
    overflow-safe for the full int64 id range.

    (x * K) mod 2^32 computed directly overflows int64 once x >= ~3.47e9
    (Spark 4's default ANSI mode throws, non-ANSI wraps negative), so
    reduce x mod 2^32 first and split the multiply into 16-bit halves:
    (lo*K + ((hi*K) mod 2^32) * 2^16) mod 2^32 — every intermediate stays
    below 2^49. Identical values to the naive form wherever that form
    doesn't overflow; the SQL oracles mirror this decomposition.
    """
    x = F.pmod(key, F.lit(MOD))
    lo = x % 65536
    hi = ((x - lo) / 65536).cast("long")  # exact: x < 2^32, power-of-two divisor
    h = F.pmod(lo * KNUTH + F.pmod(hi * KNUTH, F.lit(MOD)) * 65536, F.lit(MOD))
    return h.cast("double") / float(MOD)


# SQL mirror of knuth_u for DuckDB oracles — format with the key
# expression, e.g. KNUTH_U_SQL.format(k="doc_id"). The double-% mod
# mirrors Spark's pmod for negative keys too (DuckDB % keeps the
# dividend sign); intermediate bounds are the same as knuth_u's.
_NONNEG = "((({k}) % 4294967296 + 4294967296) % 4294967296)"
KNUTH_U_SQL = (
    f"(({_NONNEG} % 65536) * 2654435761 "
    f"+ ({_NONNEG} // 65536 * 2654435761) % 4294967296 * 65536) "
    "% 4294967296 / 4294967296.0"
)


def _u(id_col):
    return knuth_u(F.col(id_col))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strat_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``df`` repeated per the stratum's rate; ``epoch`` column
    numbers the copies (1-based). Zero-shuffle: filter + explode only."""
    mapping = F.create_map(
        *[x for k, v in sorted(rates.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    rate = F.coalesce(mapping[F.col(strat_col)], F.lit(float(default_rate)))
    u = _u(id_col)
    n_copies = F.floor(rate).cast("int") + (u < (rate - F.floor(rate))).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def source_mix_summary(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strat_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum monitoring rollup of the sample: total rows emitted
    (epochs included) and unique docs kept."""
    sampled = stratified_sample(df, rates, default_rate, strat_col, id_col)
    return sampled.groupBy(strat_col).agg(
        F.count("*").alias("n_samples"),
        F.countDistinct(id_col).alias("n_unique"),
    )
