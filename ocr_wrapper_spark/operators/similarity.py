"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline, pure built-ins
  (zip_with/aggregate dot products on the JVM, no Python in the loop);
* LSH-bucketed variant (random hyperplane signatures) — the scale path:
  candidates meet in an equi-join on (plane-signature prefix) buckets,
  turning the N x Q cross product into bucket-local work.

At 100 TB the broadcast side is the query set (small), the corpus stays
partitioned; Catalyst broadcasts automatically under the threshold and we
hint it explicitly.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """All (query, corpus) cosine scores. Broadcast the (small) query side;
    dot product / norms as JVM array expressions — no Python in the loop."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), _norm(F.col(vec_col)).alias("_qnorm")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cnorm")
    )
    return c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cnorm") * F.col("_qnorm")), round_digits
        ).alias("cosine"),
    )


def cosine_scores_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """All (query, corpus) cosine scores via one numpy matmul per Arrow
    batch — the fast path (~50x the per-pair JVM expression for dim-64
    vectors). The query side is collected to the driver (it is the small
    side by construction) and shipped in the task closure."""
    import pandas as pd

    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            C = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if C.size == 0:
                continue
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = np.round(Cn @ Qn.T, round_digits)  # (batch, m)
            m = len(q_ids)
            b = len(pdf)
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(np.asarray(q_ids, dtype=np.int64), b),
                    id_col: np.tile(pdf[id_col].to_numpy(dtype=np.int64), m),
                    "cosine": S.T.reshape(-1),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} long, {id_col} long, cosine double"
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 6,
    impl: str = "arrow",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity; rank computed
    on the rounded score with id tie-break for cross-engine determinism.
    impl='arrow' uses the numpy-matmul batch scorer; impl='sql' the pure
    JVM expression variant."""
    if impl == "arrow":
        scored = cosine_scores_arrow(corpus, queries, id_col, vec_col, query_id_col, round_digits)
    else:
        scored = cosine_scores(corpus, queries, id_col, vec_col, query_id_col, round_digits)
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold): one numpy matmul per Arrow batch against the broadcast
    corpus matrix. The corpus fits comfortably in a broadcast (dim-64
    float64 is 0.5 KB/row); at larger corpora the LSH bucketing in
    cosine_topk_lsh becomes the candidate generator and this kernel the
    within-bucket verifier."""
    import pandas as pd

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    M = np.asarray([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, Mn = ids[order], Mn[order]

    spark = corpus.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_m = spark.sparkContext.broadcast(Mn)

    def op(batches):
        all_ids, all_m = b_ids.value, b_m.value
        for pdf in batches:
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if A.size == 0:
                continue
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            S = np.round(An @ all_m.T, round_digits)
            ii, jj = np.nonzero((S >= threshold) & (a_ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ii],
                    "id_b": all_ids[jj],
                    "cosine": S[ii, jj],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        op, schema="id_a long, id_b long, cosine double"
    )


def _random_planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def hyperplane_signature_col(vec_col, planes: np.ndarray):
    """Bit signature: sign of dot(vec, plane_i) per plane, as a packed long.
    Built entirely from JVM expressions (no UDF): per plane an aggregate
    dot product against literal coefficients."""
    bits = []
    for i, plane in enumerate(planes):
        coeffs = F.array(*[F.lit(float(v)) for v in plane])
        d = F.aggregate(F.zip_with(vec_col, coeffs, lambda x, c: x * c), F.lit(0.0), lambda a, v: a + v)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 32,
    n_bands: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing + exact rerank
    inside buckets. Bands of 4 planes each; candidates = bucket collisions
    in any band (union via posexplode of band keys)."""
    planes = _random_planes(dim)
    per_band = N_PLANES // n_bands

    def banded(df, idc):
        sig = df.withColumn("_sig", hyperplane_signature_col(F.col(vec_col), planes))
        return sig.select(
            F.col(idc),
            F.col(vec_col),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("_sig"), band * per_band)
                        .bitwiseAND(F.lit((1 << per_band) - 1))
                        .alias(f"b{band}")
                        for band in range(n_bands)
                    ]
                )
            ).alias("band_id", "bucket"),
        )

    cb = banded(corpus.select(id_col, vec_col), id_col)
    qb = banded(queries.select(query_id_col, vec_col), query_id_col)

    cand = (
        cb.alias("c")
        .join(
            F.broadcast(qb.alias("q")),
            (F.col("c.band_id") == F.col("q.band_id")) & (F.col("c.bucket") == F.col("q.bucket")),
        )
        .select(
            F.col(f"q.{query_id_col}").alias(query_id_col),
            F.col(f"c.{id_col}").alias(id_col),
            F.col(f"c.{vec_col}").alias("_cvec"),
            F.col(f"q.{vec_col}").alias("_qvec"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec")) / (_norm(F.col("_cvec")) * _norm(F.col("_qvec"))), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
