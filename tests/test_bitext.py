"""Bitext mining (margin criterion): independent python replica of the
margin arithmetic, partition invariance of the pluggable kNN stage,
degenerate-geometry NULL margins, hub penalization, and eval
consistency between the two mining strategies."""

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


def _unit_rows(rng, n, dim):
    V = rng.standard_normal((n, dim))
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def _replica_margins(src_ids, S, tgt_ids, T, k):
    """Independent margin computation: rounded cosines, per-direction
    top-k by (cosine desc, id asc), int tick sums, margin as one float
    division of the int numerator/denominator. Returns
    {(src_id, tgt_id): (cosine, margin_or_None)} over forward-kNN
    candidates."""
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    C = np.round(Sn @ Tn.T, 4)  # (ns, nt) — np.round matches the arrow scorer
    ticks = np.rint(C * 10_000).astype(np.int64)

    def topk(scores, ids, kk):
        order = np.lexsort((ids, -scores))[:kk]
        return order

    sum_fwd, fwd_sets = {}, {}
    for i, sid in enumerate(src_ids):
        idx = topk(C[i], np.asarray(tgt_ids), k)
        sum_fwd[sid] = int(ticks[i, idx].sum())
        fwd_sets[sid] = idx
    sum_bwd = {}
    for j, tid in enumerate(tgt_ids):
        idx = topk(C[:, j], np.asarray(src_ids), k)
        sum_bwd[tid] = int(ticks[idx, j].sum())

    out = {}
    for i, sid in enumerate(src_ids):
        for j in fwd_sets[sid]:
            tid = tgt_ids[j]
            den = sum_fwd[sid] + sum_bwd[tid]
            margin = (2 * k * int(ticks[i, j])) / den if den > 0 else None
            out[(sid, tid)] = (float(C[i, j]), margin)
    return out


def test_margin_matches_python_replica(spark, tmp_path):
    from ocr_wrapper_spark import embedding_queries as eq

    rng = np.random.default_rng(23)
    n = 12
    S = _unit_rows(rng, n, 16)
    T = _unit_rows(rng, n, 16)
    src_ids = list(range(0, n))
    tgt_ids = list(range(100, 100 + n))
    sf_dir = _write_embeddings(
        tmp_path,
        src_ids + tgt_ids,
        np.vstack([S, T]),
        [eq.BITEXT_SRC_LABEL] * n + [eq.BITEXT_TGT_LABEL] * n,
    )
    rows = eq.bitext_margin_mine(spark, sf_dir).collect()
    expect = _replica_margins(src_ids, S, tgt_ids, T, eq.BITEXT_K)
    assert len(rows) == len(expect) == n * eq.BITEXT_K
    for r in rows:
        cos, margin = expect[(r.src_id, r.tgt_id)]
        assert r.cosine == cos, (r.src_id, r.tgt_id)
        if margin is None:
            assert r.margin is None
        else:
            assert r.margin == margin, (r.src_id, r.tgt_id, r.margin, margin)
    # mined = per-source argmax margin above threshold, exactly one max
    by_src = {}
    for (sid, tid), (_, m) in expect.items():
        if m is not None and (sid not in by_src or (m, -tid) > (by_src[sid][0], -by_src[sid][1])):
            by_src[sid] = (m, tid)
    want_mined = {
        (sid, tid) for sid, (m, tid) in by_src.items() if m >= eq.BITEXT_MARGIN_T
    }
    got_mined = {(r.src_id, r.tgt_id) for r in rows if r.mined}
    assert got_mined == want_mined


def test_candidates_partition_invariant(spark, tmp_path):
    """The batch-local partial top-k union must be exact: 16-partition
    and 1-partition corpora produce identical candidate sets/margins."""
    from ocr_wrapper_spark.operators import similarity

    rng = np.random.default_rng(31)
    n = 40
    S = _unit_rows(rng, n, 16)
    T = _unit_rows(rng, n, 16)
    sf_dir = _write_embeddings(
        tmp_path, list(range(2 * n)), np.vstack([S, T]), [0] * n + [1] * n
    )
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = e.filter("label = 0")
    tgt = e.filter("label = 1")
    wide = similarity.bitext_margin_candidates(src.repartition(16), tgt.repartition(16), k=4)
    narrow = similarity.bitext_margin_candidates(src.coalesce(1), tgt.coalesce(1), k=4)
    key = lambda r: (r.src_id, r.tgt_id)
    a = {key(r): (r.cosine, r.margin) for r in wide.collect()}
    b = {key(r): (r.cosine, r.margin) for r in narrow.collect()}
    assert a == b and len(a) == n * 4


def test_degenerate_geometry_yields_null_margins(spark, tmp_path):
    """All-negative cosine shells: denominator <= 0 must surface as NULL
    margin and mined=false everywhere (no div-by-zero, no -inf rank
    poisoning), and the eval reports 0 mined."""
    from ocr_wrapper_spark import embedding_queries as eq

    dim = 16
    base = np.eye(dim)[:5]
    S = base  # 5 orthonormal sources
    T = -base  # targets anti-aligned: every cosine is 0 or -1
    sf_dir = _write_embeddings(
        tmp_path,
        list(range(10)),
        np.vstack([S, T]),
        [eq.BITEXT_SRC_LABEL] * 5 + [eq.BITEXT_TGT_LABEL] * 5,
    )
    rows = eq.bitext_margin_mine(spark, sf_dir).collect()
    assert len(rows) == 5 * eq.BITEXT_K
    assert all(r.margin is None for r in rows)
    assert not any(r.mined for r in rows)
    ev = eq.bitext_mine_eval(spark, sf_dir).collect()[0]
    assert ev.n_mined == 0 and ev.n_candidates == 5 * eq.BITEXT_K


def test_hub_target_is_margin_penalized(spark, tmp_path):
    """The ratio margin's reason to exist: a hub target near every
    source scores a LOWER margin than a dedicated partner with the same
    raw cosine neighborhood size."""
    from ocr_wrapper_spark.operators import similarity

    rng = np.random.default_rng(5)
    dim = 16
    S = _unit_rows(rng, 8, dim)
    partner = S[0] + 0.05 * rng.standard_normal(dim)
    partner /= np.linalg.norm(partner)
    hub = S.mean(axis=0)
    hub /= np.linalg.norm(hub)
    fillers = _unit_rows(rng, 4, dim)
    T = np.vstack([partner, hub, fillers])
    sf_dir = _write_embeddings(
        tmp_path,
        list(range(8)) + list(range(100, 106)),
        np.vstack([S, T]),
        [0] * 8 + [1] * 6,
    )
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cand = similarity.bitext_margin_candidates(
        e.filter("label = 0"), e.filter("label = 1"), k=4
    )
    m = {(r.src_id, r.tgt_id): r.margin for r in cand.collect()}
    assert (0, 100) in m and (0, 101) in m, "source 0 must see both partner and hub"
    assert m[(0, 100)] > m[(0, 101)], (m[(0, 100)], m[(0, 101)])


def test_eval_counts_consistent(spark, tmp_path):
    """n_overlap <= min(n_mined, n_mutual); counts equal direct
    recomputation from the two mining outputs."""
    from ocr_wrapper_spark import embedding_queries as eq

    rng = np.random.default_rng(47)
    n = 20
    sf_dir = _write_embeddings(
        tmp_path,
        list(range(2 * n)),
        np.vstack([_unit_rows(rng, n, 16), _unit_rows(rng, n, 16)]),
        [eq.BITEXT_SRC_LABEL] * n + [eq.BITEXT_TGT_LABEL] * n,
    )
    ev = eq.bitext_mine_eval(spark, sf_dir).collect()[0]
    mined = {
        (r.src_id, r.tgt_id) for r in eq.bitext_margin_mine(spark, sf_dir).collect() if r.mined
    }
    mutual = {
        (r.src_id, r.tgt_id) for r in eq.bitext_mutual_top1(spark, sf_dir).collect()
    }
    assert ev.n_mined == len(mined)
    assert ev.n_mutual == len(mutual)
    assert ev.n_overlap == len(mined & mutual)
    assert ev.n_overlap <= min(ev.n_mined, ev.n_mutual)
    assert ev.n_candidates == n * eq.BITEXT_K
    assert ev.mined_share_ppm == len(mined) * 1_000_000 // (n * eq.BITEXT_K)
