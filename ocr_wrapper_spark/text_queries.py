"""Training-data-pipeline queries: dedup, similarity search, text analysis.

Registered into the same queries()/oracle_sql() registry as relational.py.
SQL-expressible operators get exact DuckDB oracles; LSH/SimHash pieces are
rows-only checks (the judge sees which).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, textstats
from .relational import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_LANGS = sorted(textstats.LANG_MARKERS)
_N_LANGS = len(_LANGS)


def _marker_count_sql(words: list[str]) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(str_split(text, ' '), x -> list_contains([{lits}], x)))"


def _lang_id_oracle() -> str:
    encoded = ", ".join(
        f"({_marker_count_sql(textstats.LANG_MARKERS[lang])} * {_N_LANGS} + {rank})"
        for rank, lang in enumerate(_LANGS)
    )
    lang_array = ", ".join(f"'{l}'" for l in _LANGS)
    return f"""
    WITH scored AS (
      SELECT doc_id, lang, greatest({encoded}) AS best FROM documents)
    SELECT doc_id, lang,
           CASE WHEN best // {_N_LANGS} > 0
                THEN ([{lang_array}])[CAST(best % {_N_LANGS} AS INT) + 1]
                ELSE 'und' END AS lang_guess
    FROM scored
    """


@register("doc_lang_id", _lang_id_oracle())
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", textstats.lang_id_cols(F.col("text")).alias("lang_guess"))


_STOP_LITS = ", ".join(f"'{w}'" for w in textstats.STOPWORDS_EN)


@register(
    "doc_quality_scores",
    f"""
    SELECT doc_id,
           CASE WHEN text = '' THEN 0 ELSE len(str_split(text, ' ')) END AS n_tokens,
           CASE WHEN text <> '' THEN
             round((length(text) - (len(str_split(text, ' ')) - 1))
                   / CAST(len(str_split(text, ' ')) AS DOUBLE), 4) ELSE 0.0 END AS mean_word_len,
           CASE WHEN text <> '' THEN
             round(len(list_filter(str_split(text, ' '), x -> list_contains([{_STOP_LITS}], x)))
                   / CAST(len(str_split(text, ' ')) AS DOUBLE), 4) ELSE 0.0 END AS stopword_ratio,
           CASE WHEN length(text) > 0 THEN
             round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / CAST(length(text) AS DOUBLE), 4) ELSE 0.0 END AS alpha_ratio,
           CASE WHEN length(text) > 0 THEN
             round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                   / CAST(length(text) AS DOUBLE), 4) ELSE 0.0 END AS digit_ratio
    FROM documents
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", *textstats.quality_score_cols(F.col("text")))


@register(
    "doc_token_counts",
    """
    SELECT doc_id,
           CASE WHEN text = '' THEN 0 ELSE len(str_split(text, ' ')) END AS ws_tokens,
           CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT)   AS est_bpe_tokens
    FROM documents
    """,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", *textstats.token_count_cols(F.col("text")))


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp_md5
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(normalized).alias("fp_md5"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH shingled AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(str_split(text, ' ')) >= {dedup.SHINGLE_K}
               THEN list_transform(range(0, len(str_split(text, ' ')) - {dedup.SHINGLE_K} + 1),
                    i -> array_to_string((str_split(text, ' '))[i + 1 : i + {dedup.SHINGLE_K}], ' '))
               ELSE [text] END) AS shingles
      FROM documents),
    sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM shingled),
    exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           round(n_inter / CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter / CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, threshold=0.8)


@register("dedup_minhash_lsh")  # rows-only: LSH banding not SQL-expressible
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(d)


@register("dedup_simhash")  # rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, max_hamming=3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

TOPK = 5


@register(
    "ann_topk_cosine",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(c.embedding, q.embedding), 4) AS cosine
      FROM embeddings c CROSS JOIN q),
    ranked AS (
      SELECT query_id, vec_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {TOPK}
    """,
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # 4dp rounding before ranking on both engines -> identical ties
    return similarity.cosine_topk_bruteforce(e, queries, k=TOPK, round_digits=4)


@register("ann_topk_lsh")  # rows-only: approximate path
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk_lsh(e, queries, k=TOPK, dim=64)
