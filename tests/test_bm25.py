"""bm25_retrieval guarantees: exact arithmetic replica of the rational
BM25 form (k1=1.2, b=0.75 cleared to the integer 22/10/3/9 factors) on
a synthetic corpus, and the scale-shape plan assertions (window-group-
limit top-k before the exchange, no sort-merge join anywhere)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _python_bm25(texts: dict[int, str], queries: list[tuple[int, str]], top_k: int):
    """Pure-python replica with the exact engine semantics: every factor
    converted to an IEEE double inside the same expression tree, floor
    per term, exact int sum, ties on doc_id."""
    docs = {i: t.split(" ") for i, t in texts.items() if t != ""}
    n = len(docs)
    t_tok = sum(len(w) for w in docs.values())
    tf: dict[tuple[int, str], int] = {}
    for i, words in docs.items():
        for w in words:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    vocab = {t for _, t in queries}
    df = {v: sum(1 for (_, w) in tf if w == v) for v in vocab}
    scores: dict[tuple[int, int], list[int]] = {}
    for qid, term in queries:
        if df.get(term, 0) == 0:
            continue
        idf = math.floor(float(n) * 1000000.0 / float(df[term]))
        for (i, w), c in tf.items():
            if w != term:
                continue
            dl = len(docs[i])
            num = float(c) * 22.0 * float(t_tok)
            den = float(c) * 10.0 * float(t_tok) + 3.0 * float(t_tok) + 9.0 * float(dl) * float(n)
            scores.setdefault((qid, i), []).append(math.floor(float(idf) * num / den))
    rows = [
        (qid, i, sum(parts), len(parts))
        for (qid, i), parts in scores.items()
    ]
    out = []
    for qid in sorted({r[0] for r in rows}):
        ranked = sorted(
            [r for r in rows if r[0] == qid], key=lambda r: (-r[2], r[1])
        )[:top_k]
        out.extend(
            (qid, i, s, hit, rank + 1) for rank, (_, i, s, hit) in enumerate(ranked)
        )
    return sorted(out)


def test_bm25_matches_pure_python_replica(spark, tmp_path):
    from ocr_wrapper_spark.text_queries import BM25_QUERIES, BM25_TOP_K, bm25_retrieval

    texts = {
        0: "hash join hash join hash scan",
        1: "stream batch window stream",
        2: "spark query spark query spark query spark",
        3: "vector scan slow vector",
        4: "hash",  # short doc: length normalization must beat doc 0 on idf ties
        5: "",  # empty doc: excluded entirely
        6: "window window window batch stream slow join",
        7: "filler words only here nothing relevant",
    }
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.query_id, r.doc_id, r.score_ppm, r.terms_hit, r.rank)
        for r in bm25_retrieval(spark, sf_dir).collect()
    )
    assert got == _python_bm25(texts, BM25_QUERIES, BM25_TOP_K)
    # the short doc really does outrank the long one for the 1-term query
    q1 = {r[1]: r[4] for r in got if r[0] == 1}
    assert q1[0] < q1[4]  # doc 0 has tf=3 'hash' + 'join'; doc 4 ranks below


def test_bm25_plan_group_limits_before_exchange(spark):
    """The per-query top-k must plan as a WindowGroupLimit (partial
    top-k map-side, before the 4-partition window exchange) and the
    corpus must never sort-merge — at 10^12 docs every candidate row
    crossing the wire would be the bottleneck."""
    from ocr_wrapper_spark.text_queries import bm25_retrieval

    plan = (
        bm25_retrieval(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def _python_mrr(texts, queries, top_k):
    """Metric replica on top of the bm25 replica: conjunctive relevance
    (doc contains EVERY query term), recall@k and MRR in floor-div ppm."""
    ranked = _python_bm25(texts, queries, top_k)
    qterms: dict[int, set] = {}
    for qid, t in queries:
        qterms.setdefault(qid, set()).add(t)
    out = []
    for qid, terms in sorted(qterms.items()):
        rel = {
            d for d, t in texts.items() if t != "" and terms <= set(t.split(" "))
        }
        hit_ranks = [r[4] for r in ranked if r[0] == qid and r[1] in rel]
        out.append(
            (
                qid,
                len(rel),
                len(hit_ranks),
                len(hit_ranks) * 1_000_000 // max(len(rel), 1),
                1_000_000 // min(hit_ranks) if hit_ranks else 0,
            )
        )
    return out


def test_retrieval_eval_mrr_matches_replica(spark, tmp_path):
    from ocr_wrapper_spark.text_queries import (
        BM25_QUERIES,
        BM25_TOP_K,
        retrieval_eval_mrr,
    )

    texts = {
        0: "hash join hash join hash scan",  # q1-relevant (hash AND join)
        1: "stream batch window stream",  # q2-relevant
        2: "spark query spark query spark query spark",  # q3-relevant
        3: "vector scan slow vector",  # q4-relevant
        4: "hash",  # partial q1: ranked but NOT relevant
        5: "",
        6: "window window window batch stream slow join",  # q2-relevant
        7: "filler words only here nothing relevant",
    }
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.query_id, r.n_relevant, r.hits_at_k, r.recall_ppm, r.mrr_ppm)
        for r in retrieval_eval_mrr(spark, sf_dir).collect()
    )
    assert got == _python_mrr(texts, BM25_QUERIES, BM25_TOP_K)
    by_q = {r[0]: r for r in got}
    # q2's two conjunctive docs both land in the top-10: perfect recall
    assert by_q[2][1] == 2 and by_q[2][3] == 1_000_000
    # doc 4 ranks for q1 but misses 'join': relevance stays conjunctive
    assert by_q[1][1] == 1


def test_retrieval_eval_plan_broadcasts_the_ranking(spark):
    from ocr_wrapper_spark.text_queries import retrieval_eval_mrr

    plan = (
        retrieval_eval_mrr(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the <=K*|Q|-row ranked side must ride a broadcast into the hit
    # join; the corpus never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
