"""k-center greedy coreset + URL-parallel mining: independent python
replica of the Gonzalez sweep, partition invariance, the degenerate
all-identical corpus, the non-increasing-radius invariant, coverage-eval
consistency with the operator state, and the length-ratio boundary of
the ParaCrawl candidate band."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _write_embeddings(tmp_path, ids, vecs, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": np.asarray(ids, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(labels, dtype=np.int32),
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _replica_kcenter(ids, V, k):
    """Independent Gonzalez sweep: float32-product cosines rounded to 4
    decimals then scaled to int ticks (the arrow/JVM grain), seed =
    lowest id, argmax of min-distance with lowest-id tie-break.
    Returns (centers [(rank, id, radius_or_None)], final mind per id)."""
    ids = np.asarray(ids, dtype=np.int64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    order = np.argsort(ids)
    seed = order[0]

    def dist_ticks(ci):
        cos = np.round(Vn @ Vn[ci], 4)
        return 10_000 - np.rint(cos * 10_000).astype(np.int64)

    mind = dist_ticks(seed)
    centers = [(1, int(ids[seed]), None)]
    for rank in range(2, k + 1):
        # argmax mind, tie lowest id
        best = np.lexsort((ids, -mind))[0]
        centers.append((rank, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, dist_ticks(best))
    return centers, dict(zip(ids.tolist(), mind.tolist()))


def test_kcenter_matches_python_replica(spark, tmp_path):
    from ocr_wrapper_spark.operators import similarity

    rng = np.random.default_rng(41)
    n = 50
    V = rng.standard_normal((n, 16))
    ids = list(range(7, 7 + n))  # non-zero-based ids: seed must be min id, not 0
    sf_dir = _write_embeddings(tmp_path, ids, V, [0] * n)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers, state = similarity.kcenter_greedy(e, k=6)
    got = [(r.center_rank, r.vec_id, r.radius_ticks) for r in centers.collect()]
    want, want_mind = _replica_kcenter(ids, V, 6)
    assert sorted(got) == want
    got_mind = {r.vec_id: r.mind for r in state.collect()}
    assert got_mind == want_mind
    # Gonzalez invariant: the recorded radius is non-increasing in rank
    radii = [rad for _, _, rad in sorted(got) if rad is not None]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_partition_invariant(spark, tmp_path):
    """The max/max_by partial aggregation must be exact: a 16-partition
    corpus selects the identical center sequence as a single partition."""
    from ocr_wrapper_spark.operators import similarity

    rng = np.random.default_rng(43)
    n = 64
    V = rng.standard_normal((n, 16))
    sf_dir = _write_embeddings(tmp_path, list(range(n)), V, [0] * n)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wide, _ = similarity.kcenter_greedy(e.repartition(16), k=5)
    narrow, _ = similarity.kcenter_greedy(e.coalesce(1), k=5)
    key = lambda r: (r.center_rank, r.vec_id, r.radius_ticks)
    assert sorted(map(key, wide.collect())) == sorted(map(key, narrow.collect()))


def test_kcenter_degenerate_identical_vectors(spark, tmp_path):
    """All-identical corpus: after the seed every max-min distance is 0,
    so the sweep deterministically re-selects the lowest id with radius
    0 — same on both the operator and the replica (documented
    degeneracy, not an error path)."""
    from ocr_wrapper_spark.operators import similarity

    V = np.tile(np.arange(1.0, 17.0), (8, 1))
    ids = list(range(10, 18))
    sf_dir = _write_embeddings(tmp_path, ids, V, [0] * 8)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers, state = similarity.kcenter_greedy(e, k=3)
    got = sorted((r.center_rank, r.vec_id, r.radius_ticks) for r in centers.collect())
    want, want_mind = _replica_kcenter(ids, V, 3)
    assert got == want == [(1, 10, None), (2, 10, 0), (3, 10, 0)]
    assert {r.vec_id: r.mind for r in state.collect()} == want_mind
    assert set(want_mind.values()) == {0}


def test_coverage_eval_consistent_with_operator_state(spark, tmp_path):
    """The eval's radii/sums must equal direct recomputation from the
    operator state and the first-k baseline replica; the k-center radius
    can never exceed... is not bounded by the baseline in general, so
    only internal consistency is asserted."""
    from ocr_wrapper_spark import embedding_queries as eq
    from ocr_wrapper_spark.operators import similarity

    rng = np.random.default_rng(47)
    n = 40
    V = rng.standard_normal((n, 16))
    ids = list(range(n))
    sf_dir = _write_embeddings(tmp_path, ids, V, [0] * n)
    row = eq.coreset_coverage_eval(spark, sf_dir).collect()[0]
    _, mind = _replica_kcenter(ids, V, eq.KCENTER_K)
    assert row.k == eq.KCENTER_K and row.n_vectors == n
    assert row.radius_kcenter_ticks == max(mind.values())
    assert row.sum_kcenter_ticks == sum(mind.values())
    # first-k baseline replica: centers = k lowest ids
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn[: eq.KCENTER_K]
    d = 10_000 - np.rint(np.round(Vn @ C.T, 4) * 10_000).astype(np.int64)
    fk_mind = d.min(axis=1)
    assert row.radius_firstk_ticks == int(fk_mind.max())
    assert row.sum_firstk_ticks == int(fk_mind.sum())


def _write_documents(tmp_path, doc_ids, langs, n_chars):
    pdf = pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "text": ["w " * 3] * len(doc_ids),
            "lang": langs,
            "source": ["src0"] * len(doc_ids),
            "n_chars": np.asarray(n_chars, dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_url_parallel_pairs_and_ratio_boundary(spark, tmp_path):
    """One site-path group of 5 docs: every en x non-en pair within the
    group is a candidate, pairs across groups are not, and the accepted
    band is closed at exactly [500000, 2000000] ppm (integer DIV, so
    2000001-equivalent ratios fall out)."""
    from ocr_wrapper_spark import text_queries as tq

    # group 0: docs 0-4; group 1: docs 5-9 (different host/path key)
    langs = ["en", "de", "zh", "en", "fr", "en", "es", "de", "fr", "zh"]
    #          0     1     2     3     4     5     6     7     8     9
    chars = [100, 200, 50, 300, 49, 400, 200, 800, 201, 199]
    sf_dir = _write_documents(tmp_path, list(range(10)), langs, chars)
    rows = tq.url_parallel_candidates(spark, sf_dir).collect()
    got = {(r.src_doc_id, r.tgt_doc_id): (r.len_ratio_ppm, r.accepted) for r in rows}
    # candidates: group0 en={0,3} x tgt={1,2,4}; group1 en={5} x tgt={6,7,8,9}
    assert set(got) == {(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 4),
                        (5, 6), (5, 7), (5, 8), (5, 9)}
    # exact boundaries: 100/200 = 500000 ppm (lo, accepted);
    # 100/49 = 2040816 ppm (> hi, rejected); 400/200 = 2000000 (hi, accepted);
    # 400/201 = 1990049 (in), 400/199 = 2010050 (out); 300/50 = 6000000 (out)
    assert got[(0, 1)] == (500_000, True)
    assert got[(0, 4)] == (2_040_816, False)
    assert got[(5, 6)] == (2_000_000, True)
    assert got[(5, 8)] == (1_990_049, True)
    assert got[(5, 9)] == (2_010_050, False)
    assert got[(3, 2)] == (6_000_000, False)
    # all pairs in a group share one host, distinct groups may differ
    hosts = {r.src_doc_id // 5: r.host for r in rows}
    assert len(hosts) == 2


def test_url_parallel_zero_chars_guard(spark, tmp_path):
    """A zero-length target doc must yield NULL ratio + accepted=false,
    never a divide-by-zero task failure (hostile-payload contract)."""
    from ocr_wrapper_spark import text_queries as tq

    sf_dir = _write_documents(
        tmp_path, [0, 1], ["en", "de"], [100, 0]
    )
    rows = tq.url_parallel_candidates(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].len_ratio_ppm is None and rows[0].accepted is False
