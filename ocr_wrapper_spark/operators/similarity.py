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
import pandas as pd

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


ZERO_NORM_EPS = 1e-100  # below this max|v| a vector counts as zero


def _quantize_i8(V: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 scalar quantization: q = floor(v * 127 /
    max|v| + 0.5). floor(x + 0.5) instead of numpy's round-half-even so
    DuckDB's floor reproduces every code exactly. (Near-)zero vectors
    quantize to all-zero codes instead of NaN garbage — the oracle
    mirrors the same m < eps branch."""
    m = np.abs(V).max(axis=1, keepdims=True)
    zero = m < ZERO_NORM_EPS
    safe_m = np.where(zero, 1.0, m)
    codes = np.floor(V * (127.0 / safe_m) + 0.5).astype(np.int32)
    return np.where(zero, 0, codes)


def cosine_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """Quantized brute-force top-k: vectors scalar-quantized to int8
    (per-vector symmetric scale), cosine computed on the integer codes.
    The scale cancels in the cosine, so this approximates the float
    score to ~1/127 while reading 4 bytes/dim less — at 100 TB of
    embeddings the scan is memory-bandwidth-bound and the quantized
    corpus is 4x smaller (int8 SIMD dot on real hardware). Integer dot
    products are order-exact, which is what makes the DuckDB oracle an
    exact mirror rather than a tolerance check."""
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    Q = _quantize_i8(np.asarray([r[1] for r in q_rows], dtype=np.float64)).astype(np.int64)
    qnorm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _quantize_i8(np.asarray(pdf[vec_col].tolist(), dtype=np.float64)).astype(np.int64)
            cnorm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            # integer dot products are order-exact; only the final
            # divide + round touch floats, so DuckDB reproduces every
            # score bit-for-bit. The norm-product floor keeps zero-code
            # vectors at cosine 0 instead of 0/0 NaN (oracle mirrors it).
            D = (C @ Q.T).astype(np.float64)
            denom = np.maximum(cnorm[:, None] * qnorm[None, :], ZERO_NORM_EPS)
            S = np.round(D / denom, round_digits)
            m = len(q_ids)
            b = len(pdf)
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(np.asarray(q_ids, dtype=np.int64), b),
                    id_col: np.tile(pdf[id_col].to_numpy(dtype=np.int64), m),
                    "cosine": S.T.reshape(-1),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} long, {id_col} long, cosine double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# Above this corpus size the broadcast-matmul near-pairs path would
# collect too much to the driver; the LSH candidate path takes over.
BROADCAST_LIMIT = 200_000


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    strategy: str = "auto",
    broadcast_limit: int = BROADCAST_LIMIT,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).

    strategy='broadcast': one numpy matmul per Arrow batch against the
    broadcast corpus matrix — exact, O(n) driver memory, fine while the
    corpus is small (dim-64 float64 is 0.5 KB/row).
    strategy='lsh': random-hyperplane LSH buckets generate candidates in
    an equi-join (corpus stays partitioned, nothing on the driver), then
    the exact cosine verifies each candidate — the 100 TB path; recall
    <1 for borderline pairs but ~1 for true near-dups (see
    cosine_near_pairs_lsh).
    strategy='auto': count the id column (cheap, column-pruned scan) and
    pick: <= broadcast_limit -> broadcast, else lsh.
    """
    import pandas as pd

    if strategy not in ("auto", "broadcast", "lsh"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "lsh":
        n = corpus.select(id_col).count()
        if n > broadcast_limit:
            if strategy == "broadcast":
                raise ValueError(
                    f"corpus has {n} rows > broadcast_limit {broadcast_limit}; "
                    "use strategy='lsh' (collect+broadcast would exhaust driver memory)"
                )
            strategy = "lsh"
        else:
            strategy = "broadcast"
    if strategy == "lsh":
        return cosine_near_pairs_lsh(corpus, threshold, id_col, vec_col, round_digits)

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


# IVF coarse quantizer: the first N_CENTROIDS corpus vectors act as the
# (deterministic) centroid seeds — k-means init without Lloyd rounds, so
# the DuckDB oracle can recompute every assignment exactly. At real
# scale the seeds would be refined by distributed Lloyd iterations; the
# query-side structure (assign -> probe top clusters -> in-cluster
# rerank) is identical either way and is what this operator exercises.
N_CENTROIDS = 16
N_PROBE = 4  # random embeddings scatter true neighbors across clusters;
# probing 4/16 lists reads 25% of the corpus for ~0.7 recall here
_CODE_OFFSET = 2_000_000  # shift rounded-cosine codes positive before packing


def _cluster_code_matrix(Vn: np.ndarray, Cn: np.ndarray, n_centroids: int) -> np.ndarray:
    """Packed (rounded-cosine, centroid-id) codes: sortable ints whose
    descending order is (cosine desc, cid asc) — the arithmetic argmax
    trick the DuckDB oracle mirrors (greatest() takes no structs)."""
    S = np.round(Vn @ Cn.T, 6)
    codes = (
        np.rint(S * 1e6 + _CODE_OFFSET).astype(np.int64) * n_centroids
        + (n_centroids - 1 - np.arange(n_centroids, dtype=np.int64))
    )
    return codes


def top_clusters_pandas_udf(Cn: np.ndarray, n_centroids: int, n_top: int):
    """Vectorized top-n_top coarse-centroid assignment (one matmul per
    Arrow batch) on the packed-code argmax the DuckDB oracle mirrors.
    Shared by ivf_topk_cosine and the SemDeDup cluster assignment."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        codes = _cluster_code_matrix(Vn, Cn, n_centroids)
        order = np.argsort(-codes, axis=1, kind="stable")[:, :n_top]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return udf


def seed_centroids(
    corpus: DataFrame, n_centroids: int = N_CENTROIDS, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """The deterministic centroid seeds (first n_centroids corpus
    vectors by id) as a float64 matrix — n_centroids x dim, driver-side
    by construction."""
    seeds = sorted(
        corpus.filter(F.col(id_col) < n_centroids).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    return np.asarray([r[1] for r in seeds], dtype=np.float64)


MEAN_ROUND = 6  # Lloyd centroid means rounded at 1e-6 so the float64
# accumulation-order noise (~1e-15, Spark partition order vs DuckDB scan
# order) can never reach the value the oracle recomputes


def lloyd_refine(
    corpus: DataFrame,
    C: np.ndarray,
    n_iter: int = 1,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd iteration(s) over the coarse centroids.

    Each iteration: assign every corpus vector to its best centroid
    (same packed-code argmax the query path uses), accumulate per-cluster
    (sum, count) partials inside each partition via mapInPandas (<=
    n_centroids rows per partition — the shuffle is numPartitions x
    n_centroids rows, never the corpus), element-wise-sum the partials in
    Spark (posexplode -> groupBy(cluster, pos)), and take the mean
    rounded at 1e-6. Only the n_centroids x dim result reaches the
    driver. Empty clusters keep their previous centroid.

    The rounding makes the refined centroids engine- and
    partitioning-deterministic: float32 inputs summed in float64 differ
    across orders by ~1e-15, eight orders below the rounding grain.
    """
    import pandas as pd

    n_centroids, dim = C.shape
    for _ in range(n_iter):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

        def partials(batches):
            sums = np.zeros((n_centroids, dim), dtype=np.float64)
            counts = np.zeros(n_centroids, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
                codes = _cluster_code_matrix(Vn, Cn, n_centroids)
                best = np.argmax(codes, axis=1)
                np.add.at(sums, best, V)
                np.add.at(counts, best, 1)
            hit = np.nonzero(counts)[0]
            if hit.size:
                yield pd.DataFrame(
                    {
                        "cluster": hit.astype("int32"),
                        "cnt": counts[hit],
                        "vsum": [sums[c].tolist() for c in hit],
                    }
                )

        parts = corpus.select(vec_col).mapInPandas(
            partials, schema="cluster int, cnt long, vsum array<double>"
        )
        summed = (
            parts.select("cluster", "cnt", F.posexplode("vsum").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.sum("cnt").alias("n"))
            .collect()
        )  # n_centroids x dim rows — tiny at any corpus scale
        C_new = C.copy()
        counts_total = np.zeros(n_centroids, dtype=np.int64)
        sums_total = np.zeros((n_centroids, dim), dtype=np.float64)
        for r in summed:
            sums_total[r["cluster"], r["pos"]] = r["s"]
            counts_total[r["cluster"]] = r["n"]
        hit = counts_total > 0
        C_new[hit] = np.round(sums_total[hit] / counts_total[hit, None], MEAN_ROUND)
        C = C_new
    return C


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 4,
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their best coarse centroid once (the inverted lists);
    each query probes its ``n_probe`` closest centroids and reranks
    exactly inside those lists only. The candidate set meets in an
    equi-join on cluster id — corpus stays partitioned, nothing large on
    the driver (centroids are n_centroids x dim).

    ``lloyd_iters`` > 0 refines the seeded centroids with distributed
    k-means iterations (lloyd_refine) before building the lists —
    tighter clusters, better recall per probed list at real scale."""
    import pandas as pd
    from pyspark.sql import types as T

    C = seed_centroids(corpus, n_centroids, id_col, vec_col)
    if lloyd_iters:
        C = lloyd_refine(corpus, C, n_iter=lloyd_iters, vec_col=vec_col)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def top_clusters_udf(n_top: int):
        return top_clusters_pandas_udf(Cn, n_centroids, n_top)

    # norms are computed ONCE per corpus row / per probe row and carried
    # through the join as scalars; per-candidate work is then a single
    # dot-product fold instead of three O(dim) array folds (the norm of
    # a vector does not depend on the candidate pair).
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_cnorm"),
        F.element_at(top_clusters_udf(1)(F.col(vec_col)), 1).alias("cluster"),
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        _norm(F.col(vec_col)).alias("_qnorm"),
        F.explode(top_clusters_udf(n_probe)(F.col(vec_col))).alias("cluster"),
    )
    cand = assigned.join(F.broadcast(probes), "cluster").select(
        query_id_col,
        id_col,
        F.col(vec_col).alias("_cvec"),
        "_qvec",
        "_cnorm",
        "_qnorm",
    )
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cnorm") * F.col("_qnorm")),
            round_digits,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _random_planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


# near-pair LSH: 64 planes in 8 bands of 8 bits. For a true near-dup
# (cosine >= 0.99) the per-band collision probability is
# (1 - theta/pi)^8 ~ 0.69, so missing all 8 bands is ~1e-4; borderline
# pairs at exactly the threshold have lower recall — the documented
# approximation of the scale path.
N_PAIR_PLANES = 64
N_PAIR_BANDS = 8


def _band_buckets_udf(planes: np.ndarray, n_bands: int):
    """Arrow-batched band-bucket signature: one numpy matmul per batch
    (not 16 x dim literal JVM expressions — no plan bloat at dim 768).
    Returns array<long> of per-band bucket values."""
    from pyspark.sql import types as T

    per_band = planes.shape[0] // n_bands
    weights = (np.int64(1) << np.arange(per_band, dtype=np.int64)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        B = (V @ planes.T >= 0).astype(np.int64)  # (n, n_planes)
        buckets = np.stack(
            [B[:, b * per_band : (b + 1) * per_band] @ weights for b in range(n_bands)],
            axis=1,
        )
        return pd.Series([row.tolist() for row in buckets])

    return udf


def cosine_near_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    n_bands: int = N_PAIR_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs at corpus scale: hyperplane-LSH buckets
    generate candidates in a distributed equi-join (nothing collected to
    the driver), then an exact Arrow-batched cosine verifies each
    candidate with the same numpy rounding as the broadcast path.

    ``max_bucket`` optionally drops degenerate buckets (all-identical
    embeddings) before the self-join, like lsh_candidate_pairs."""
    import pandas as pd

    head = corpus.select(vec_col).head()
    if head is None:
        return corpus.sparkSession.createDataFrame(
            [], schema="id_a long, id_b long, cosine double"
        )
    dim = len(head[0])
    rng = np.random.RandomState(11)
    planes = rng.standard_normal((N_PAIR_PLANES, dim)).astype(np.float64)

    sig = corpus.select(id_col, vec_col).withColumn(
        "_buckets", _band_buckets_udf(planes, n_bands)(F.col(vec_col))
    )
    bands = sig.select(
        id_col, vec_col, F.posexplode("_buckets").alias("band_id", "bucket")
    )
    if max_bucket is not None:
        counts = bands.groupBy("band_id", "bucket").agg(F.count("*").alias("_bn"))
        bands = bands.join(
            F.broadcast(counts.filter(F.col("_bn") > max_bucket)),
            ["band_id", "bucket"],
            "left_anti",
        )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.asarray(pdf["_va"].tolist(), dtype=np.float64)
            B = np.asarray(pdf["_vb"].tolist(), dtype=np.float64)
            cos = np.round(
                (A * B).sum(axis=1)
                / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)),
                round_digits,
            )
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return cand.mapInPandas(verify, schema="id_a long, id_b long, cosine double")


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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-scan ANN path
# ---------------------------------------------------------------------------

# dim-64 embeddings split into PQ_M subspaces of dim/PQ_M dims; each
# subvector is coded as the L2-nearest of PQ_K seeded codewords, so a
# vector stores as PQ_M 4-bit codes (4 bytes) instead of 64 floats
# (256 bytes) — the 64x scan compression that makes 10^12-row ANN
# memory-bandwidth-feasible. Codewords are the subvectors of the first
# PQ_K corpus vectors (same deterministic seeding as the IVF coarse
# quantizer, N_CENTROIDS above) so the DuckDB oracle recomputes every
# code and every ADC score exactly.
PQ_M = 8
PQ_K = 16
# assignment scores are round(2*dot(v,c) - |c|^2, 6); for unit-norm
# vectors that sits in [-3, 2], so a 4e6 shift keeps every packed code
# positive (packed = (score*1e6 + offset)*PQ_K + tiebreak < 2^27).
_PQ_OFFSET = 4_000_000


def pq_codebook(
    corpus: DataFrame,
    n_codewords: int = PQ_K,
    m_subspaces: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded PQ codebook (M, K, ds): subvectors of the first K corpus
    vectors. K rows collected — a provably tiny side at any corpus
    scale (like seed_centroids); a production variant would Lloyd-refine
    per subspace exactly as lloyd_refine does for IVF."""
    rows = corpus.filter(F.col(id_col) < n_codewords).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    V = np.asarray([r[1] for r in rows], dtype=np.float64)  # (K, dim)
    if V.shape[0] != n_codewords:
        raise ValueError(f"need {n_codewords} seed vectors, found {V.shape[0]}")
    dim = V.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by {m_subspaces} subspaces")
    ds = dim // m_subspaces
    return V.reshape(n_codewords, m_subspaces, ds).transpose(1, 0, 2).copy()


def pq_encode_batch(Vm: np.ndarray, C: np.ndarray) -> np.ndarray:
    """PQ codes (b, M) for a batch: per subspace, the L2-argmin codeword
    via the packed argmax of round(2*dot(v,c) - |c|^2, 6) (|v|^2 is
    constant per subvector so argmin L2 == argmax of this) — the same
    sortable-int trick as _cluster_code_matrix, lowest code id wins
    rounded ties, and the DuckDB oracle mirrors the packing."""
    n_k = C.shape[1]
    S = 2.0 * np.einsum("bmd,mkd->bmk", Vm, C) - (C * C).sum(axis=2)[None, :, :]
    pack = np.rint(np.round(S, 6) * 1e6 + _PQ_OFFSET).astype(np.int64) * n_k + (
        n_k - 1 - np.arange(n_k, dtype=np.int64)
    )
    best = pack.max(axis=2)
    # the code decode relies on floor-mod == trunc-mod, i.e. best >= 0:
    # numpy % floors while DuckDB % truncates, so a negative pack (a
    # vector far outside the unit-norm envelope _PQ_OFFSET covers) must
    # fail loudly here rather than silently diverge from the oracle.
    if best.size and best.min() < 0:
        raise ValueError("PQ pack underflow: vector norms exceed the _PQ_OFFSET envelope")
    return (n_k - 1 - (best % n_k)).astype(np.int64)


def pq_query_lut(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Integer ADC lookup tables (nq, M, K): micro-scaled subspace dot
    products round(dot(q_sub, codeword), 6)*1e6 as int64. Summing M
    integer entries is order-exact, so the final ADC score carries no
    float-accumulation noise for the oracle to miss."""
    m_sub, n_k, ds = C.shape
    Qm = Q.reshape(Q.shape[0], m_sub, ds)
    D = np.einsum("qmd,mkd->qmk", Qm, C)
    return np.rint(np.round(D, 6) * 1e6).astype(np.int64)


def pq_topk_adc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m_subspaces: int = PQ_M,
    n_codewords: int = PQ_K,
) -> DataFrame:
    """PQ top-k via asymmetric distance computation: one fused
    mapInPandas pass encodes each Arrow batch to 4-bit codes and scores
    the codes against per-query integer LUTs (a table lookup + int sum
    per candidate — no float math in the scan). The query side and the
    K-row codebook travel in the closure; the corpus is read once and
    never shuffles until the per-query top-k window (which Spark caps
    per-partition via WindowGroupLimit)."""
    C = pq_codebook(corpus, n_codewords, m_subspaces, id_col, vec_col)
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    lut = pq_query_lut(Q, C)  # (nq, M, K)
    m_idx = np.arange(m_subspaces)

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = pq_encode_batch(V.reshape(len(pdf), m_subspaces, -1), C)
            # gather (nq, b, M) LUT entries and sum subspaces: int64-exact
            adc = lut[:, np.broadcast_to(m_idx, codes.shape), codes].sum(axis=2)
            b = len(pdf)
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(q_ids, b),
                    id_col: np.tile(pdf[id_col].to_numpy(dtype=np.int64), len(q_ids)),
                    "adc_micros": adc.reshape(-1),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        scan, schema=f"{query_id_col} long, {id_col} long, adc_micros long"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_micros").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    round_digits: int = 4,
) -> DataFrame:
    """Contrastive hard-negative mining: per query, the k most
    cosine-similar corpus vectors whose label DIFFERS from the query's —
    the pairs a contrastive trainer wants. Each Arrow batch emits only
    its batch-local top-k per query (the global top-k is a subset of the
    union of batch-local top-k's under the same (cosine desc, id asc)
    order), so the rank window shuffles k rows per (query, batch), not
    the full score matrix."""
    q_rows = queries.select(query_id_col, vec_col, label_col).collect()
    q_ids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_lab = np.asarray([int(r[2]) for r in q_rows], dtype=np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Cv = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            Cn = Cv / np.linalg.norm(Cv, axis=1, keepdims=True)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_lab = pdf[label_col].to_numpy(dtype=np.int64)
            S = np.round(Cn @ Qn.T, round_digits)  # (b, nq)
            frames = []
            for qi in range(len(q_ids)):
                mask = c_lab != q_lab[qi]
                if not mask.any():
                    continue
                s, ids, labs = S[mask, qi], c_ids[mask], c_lab[mask]
                order = np.lexsort((ids, -s))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            query_id_col: np.full(len(order), q_ids[qi]),
                            "query_label": np.full(len(order), q_lab[qi], dtype=np.int32),
                            id_col: ids[order],
                            "neg_label": labs[order].astype(np.int32),
                            "cosine": s[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = corpus.select(id_col, vec_col, label_col).mapInPandas(
        score,
        schema=f"{query_id_col} long, query_label int, {id_col} long, neg_label int, cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# bitext mining (margin criterion)
# ---------------------------------------------------------------------------

BITEXT_COS_SCALE = 10_000  # round(cos, 4) * 1e4 — exact int64 "cosine ticks"


def _cos_ticks(cos_col):
    """round(cos,4)*1e4 is within ~1e-9 of an integer in float64, so a
    final half-up round before the cast lands on the same int64 in Spark
    and DuckDB regardless of their round-half conventions."""
    return F.round(cos_col * BITEXT_COS_SCALE).cast("long")


def bitext_margin_candidates(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    knn=None,
) -> DataFrame:
    """Margin-based bitext candidate scoring (Artetxe & Schwenk 2019,
    the CCMatrix mining criterion): for every source vector x, score its
    k nearest target vectors y by

        margin(x, y) = cos(x, y) / ((avg_fwd(x) + avg_bwd(y)) / 2)

    where avg_fwd(x) is the mean cosine of x's k nearest targets and
    avg_bwd(y) the mean cosine of y's k nearest sources — the ratio
    penalizes "hub" vectors that are near everything.

    Exactness: cosines are rounded to `round_digits` then scaled to
    int64 ticks; the margin is published as ONE IEEE division of two
    exactly-representable int64s (2*k*cos_ticks / (sum_fwd + sum_bwd)),
    bit-identical across engines — no libm, no float accumulation.
    A non-positive denominator (degenerate geometry: the kNN shells sum
    to <= 0) yields NULL margin.

    Scale shape: the kNN stage is pluggable (`knn`; defaults to the
    exact arrow scorer with batch-local partial top-k). At 10^12 rows
    both language sides are corpus-scale, so the kNN swaps to the
    IVF/PQ path (ivf_topk_cosine / pq_topk_adc) exactly like the ann_*
    family — everything downstream of the kNN is k-row-per-vector
    tables: two keyed sums of |src| and |tgt| rows and two equi-joins
    back onto the k*|src|-row candidate set. Nothing below this line
    ever touches the |src| x |tgt| score matrix.
    """
    if knn is None:
        knn = cosine_topk_bruteforce
    s_q = src.select(F.col(id_col).alias("query_id"), vec_col)
    t_q = tgt.select(F.col(id_col).alias("query_id"), vec_col)
    fwd = knn(tgt, s_q, k=k, id_col=id_col, vec_col=vec_col, round_digits=round_digits).select(
        F.col("query_id").alias("src_id"),
        F.col(id_col).alias("tgt_id"),
        "cosine",
    )
    bwd = knn(src, t_q, k=k, id_col=id_col, vec_col=vec_col, round_digits=round_digits).select(
        F.col("query_id").alias("tgt_id"),
        F.col(id_col).alias("src_id"),
        "cosine",
    )
    sum_fwd = fwd.groupBy("src_id").agg(F.sum(_cos_ticks(F.col("cosine"))).alias("sum_fwd"))
    sum_bwd = bwd.groupBy("tgt_id").agg(F.sum(_cos_ticks(F.col("cosine"))).alias("sum_bwd"))
    den = F.col("sum_fwd") + F.col("sum_bwd")
    return (
        # keyed equi-joins, NOT broadcast hints: sum_fwd/sum_bwd are
        # |src|- and |tgt|-row tables (corpus-scale at 10^12); AQE
        # broadcasts them when they are actually small.
        fwd.join(sum_fwd, "src_id")
        .join(sum_bwd, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cosine",
            F.when(
                den > 0,
                (F.lit(2 * k) * _cos_ticks(F.col("cosine"))).cast("double") / den.cast("double"),
            ).alias("margin"),
        )
    )

# ---------------------------------------------------------------------------
# k-center greedy coreset (Gonzalez max-min selection)
# ---------------------------------------------------------------------------


def _cos_dist_ticks(a, b, round_digits: int = 4):
    """Cosine distance in int64 ticks: 10^4 * (1 - round(cos, 4)) — the
    same round-then-scale grain every ANN/bitext oracle uses, so both
    engines agree bit-for-bit (a vector's distance to itself is 0)."""
    cos = F.round(_dot(a, b) / (_norm(a) * _norm(b)), round_digits)
    return F.lit(BITEXT_COS_SCALE) - _cos_ticks(cos)


def kcenter_greedy(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Gonzalez greedy k-center over cosine distance: seed with the
    lowest id (the 2-approximation guarantee holds for ANY seed), then
    repeatedly pick the vector farthest from its nearest selected
    center (ties: lowest id). The classic diversity-coreset selection
    for training-data curation — the k points that cover the embedding
    space with the smallest max distance, up to a factor of 2.

    Returns (centers, state): centers has one row per selection
    (center_rank, vec_id, radius_ticks — the max-min distance at the
    moment of selection, NULL for the seed; non-increasing in rank),
    state is the final per-vector coverage (vec_id, mind = distance in
    ticks to the nearest of the k centers).

    Scale shape: each of the k iterations reduces the corpus to a 1-row
    argmax via partial-aggregated max/max_by (map-side combine — never a
    constant-key window over the corpus) and broadcasts that row back to
    relax per-vector minima. The (id, vector) projection is persisted
    once (the bpe_learn_merges idiom), so the unrolled lineage re-runs
    only cheap cached narrow maps, not source scans: one read + k 1-row
    broadcasts total, no corpus shuffle anywhere. Degenerate corpora
    (max-min
    distance 0, i.e. every vector already coincides with a center) keep
    selecting the seed's duplicate deterministically — identical on
    both engines, asserted by the degeneracy test."""
    from pyspark import StorageLevel

    e = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    seed = e.agg(F.min_by(F.struct("vec_id", "v"), F.col("vec_id")).alias("c")).select(
        F.col("c.vec_id").alias("c_id"), F.col("c.v").alias("c_v")
    )
    state = e.crossJoin(F.broadcast(seed)).select(
        "vec_id", "v", _cos_dist_ticks(F.col("v"), F.col("c_v")).alias("mind")
    )
    centers = seed.select(
        F.lit(1).alias("center_rank"),
        F.col("c_id").alias("vec_id"),
        F.lit(None).cast("long").alias("radius_ticks"),
    )
    for it in range(2, k + 1):
        # persist the per-iteration state: iteration i's 1-row argmax
        # job otherwise re-executes the whole unrolled relax chain
        # (i-1 distance evaluations per vector), turning k iterations
        # into O(k^2) distance work; with the cache each argmax reads
        # the previous iteration's materialized minima and computes
        # exactly ONE new distance per vector. Integer-tick distances,
        # so materialization cannot perturb results.
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        ordk = F.struct(F.col("mind"), (-F.col("vec_id")).alias("nid"))
        top = state.agg(
            F.max(ordk).alias("o"),
            F.max_by(F.col("v"), ordk).alias("c_v"),
        ).select(
            F.col("o.mind").alias("radius_ticks"),
            (-F.col("o.nid")).alias("c_id"),
            "c_v",
        )
        centers = centers.unionByName(
            top.select(
                F.lit(it).alias("center_rank"),
                F.col("c_id").alias("vec_id"),
                "radius_ticks",
            )
        )
        state = state.crossJoin(F.broadcast(top.drop("radius_ticks"))).select(
            "vec_id",
            "v",
            F.least(F.col("mind"), _cos_dist_ticks(F.col("v"), F.col("c_v"))).alias("mind"),
        )
    return centers, state.select("vec_id", "mind")
