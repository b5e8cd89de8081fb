"""Collocation lift (log-free PMI ordering) and asymmetric containment
dedup: python-replica exactness on planted corpora + the plan shapes."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_collocation_lift_matches_python_replica(spark, tmp_path):
    """Exact integer-ppm lift on a hand-buildable corpus: 'new york'
    always adjacent (high lift) vs 'the the' style frequent-word pairs
    (lift ~ 1e6 or below); every surviving pair recomputed in python."""
    from ocr_wrapper_spark.curation_queries import (
        COLLOC_MIN_PAIR,
        collocation_lift_topk,
    )

    docs = []
    for i in range(1, 13):
        docs.append((i, f"visit new york the city the hub w{i} the end"))
    sf_dir = _write_docs(tmp_path, docs)

    # python replica
    uni: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for _, text in docs:
        tk = text.split(" ")
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    n = sum(uni.values())
    expected = {
        p: c * n * 1_000_000 // (uni[p[0]] * uni[p[1]])
        for p, c in pairs.items()
        if c >= COLLOC_MIN_PAIR
    }

    rows = collocation_lift_topk(spark, sf_dir).collect()
    got = {(r.w1, r.w2): r.lift_ppm for r in rows}
    for p, lift in got.items():
        assert expected[p] == lift, p
    # ranks are contiguous and ordered by (lift desc, w1, w2)
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, len(rows) + 1))
    lifts = [r.lift_ppm for r in by_rank]
    assert lifts == sorted(lifts, reverse=True)
    # the always-adjacent pair outranks the frequent-word pairs
    assert got[("new", "york")] > got[("the", "city")]


def test_collocation_topk_is_group_limited(spark):
    from ocr_wrapper_spark.curation_queries import collocation_lift_topk

    plan = (
        collocation_lift_topk(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_containment_flags_partial_scrape_not_exact_dup(spark, tmp_path):
    """A doc wholly contained in a 3x-larger doc is high-containment
    LOW-Jaccard (jaccard_missed=true); an exact duplicate pair is
    high-containment HIGH-Jaccard (jaccard_missed=false); an unrelated
    doc pairs with nobody."""
    from ocr_wrapper_spark.text_queries import dedup_containment

    base = " ".join(f"s{i}" for i in range(30))
    big = base + " " + " ".join(f"t{i}" for i in range(90))
    other = " ".join(f"u{i}" for i in range(30))
    sf_dir = _write_docs(
        tmp_path,
        [(1, base), (2, big), (3, base), (4, other)],
    )
    rows = dedup_containment(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b): r for r in rows}
    # 1 in 2 and 3 in 2: scrape pairs; 1-3 exact dup
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)].jaccard_missed and got[(2, 3)].jaccard_missed
    assert not got[(1, 3)].jaccard_missed
    assert max(got[(1, 2)].cont_a_ppm, got[(1, 2)].cont_b_ppm) == 1_000_000
    assert got[(1, 3)].jaccard_ppm == 1_000_000


def test_containment_respects_stop_shingle_cut(spark, tmp_path):
    """A shingle present in > max_df docs must not create pairs: 40
    docs sharing one boilerplate sentence plus unique content produce
    NO containment pairs (the shared shingles are cut, the unique
    remainder doesn't overlap)."""
    from ocr_wrapper_spark.text_queries import dedup_containment

    boiler = "all rights reserved contact us today"
    docs = [(i, f"{boiler} unique{i} " + " ".join(f"x{i}_{j}" for j in range(10)))
            for i in range(1, 41)]
    sf_dir = _write_docs(tmp_path, docs)
    assert dedup_containment(spark, sf_dir).count() == 0


def test_containment_dominates_jaccard_invariant(spark):
    """Algebraic invariant on the real smoke corpus: jaccard_ppm <=
    min(cont_a_ppm, cont_b_ppm) for every pair (the union is at least
    as large as either set; floor is monotone), and every containment
    is <= 1e6."""
    from ocr_wrapper_spark.text_queries import dedup_containment

    rows = dedup_containment(spark, SF_SMOKE).collect()
    assert rows, "smoke corpus must contain full-dup pairs"
    for r in rows:
        assert r.jaccard_ppm <= min(r.cont_a_ppm, r.cont_b_ppm)
        assert max(r.cont_a_ppm, r.cont_b_ppm) <= 1_000_000
