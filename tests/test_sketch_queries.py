"""Sketch-family tests: KMV bottom-k distinct, HyperLogLog registers,
Count-Min heavy hitters, priority sampling, robots politeness filter.

Each query carries its own exact ground truth in the result row, so
these tests assert the *sketch guarantees* (one-sided CMS error, KMV
exact-below-K, DLT tau semantics) plus the plan shapes that make them
viable at 10^12 rows (WindowGroupLimit pushdown, broadcast probes,
zero-shuffle politeness map)."""

from __future__ import annotations

import hashlib

import pandas as pd

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k_and_formula_above(spark):
    """Hosts with fewer than K distinct hashes report the exact count
    (kth_min = -1 sentinel); hosts at or above K satisfy the estimator
    identity est = (K-1)*2^40 // (h_K >> 20) recomputed row-by-row."""
    from ocr_wrapper_spark.sketch_queries import (
        _KMV_SHIFT,
        _KMV_SPACE,
        KMV_K,
        kmv_distinct_sketch,
    )

    rows = kmv_distinct_sketch(spark, SF_SMOKE).collect()
    assert rows, "smoke corpus must produce at least one host"
    for r in rows:
        if r.kth_min == -1:
            assert r.n_distinct < KMV_K
            assert r.kmv_estimate == r.n_distinct
            assert r.err_ppm == 0
        else:
            assert r.n_distinct >= KMV_K
            assert r.kmv_estimate == (KMV_K - 1) * _KMV_SPACE // max(
                r.kth_min // _KMV_SHIFT, 1
            )
        assert r.err_ppm == abs(r.kmv_estimate - r.n_distinct) * 1_000_000 // r.n_distinct


def test_kmv_bottom_k_pushes_group_limit_before_exchange(spark):
    """The bottom-K must ship at most K rows per (host, salt) from each
    map task — Spark 4's WindowGroupLimit, the property that keeps the
    Zipf top host from sorting in one task."""
    from ocr_wrapper_spark.sketch_queries import kmv_distinct_sketch

    plan = _plan(kmv_distinct_sketch(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_matches_python_reference(spark, tmp_path):
    """Register construction and the 128-bit estimate division recomputed
    from scratch in Python over a tiny corpus — bit-exact."""
    from ocr_wrapper_spark.sketch_queries import (
        _HLL_EST_NUM,
        _HLL_RHO_MAX,
        HLL_M,
        hll_register_estimate,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = [(i, f"tok{i} tok{i % 7} shared alpha beta") for i in range(1, 60)]
    sf_dir = _write_docs(tmp_path, docs)

    # python reference: distinct (host, 60-bit md5(term)) -> registers
    import numpy as np

    seen = set()
    for doc_id, text in docs:
        host = int(host_for_doc(np.array([doc_id]))[0])
        for term in text.split(" "):
            h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
            seen.add((host, h))
    regs: dict[tuple[int, int], int] = {}
    counts: dict[int, int] = {}
    for host, h in seen:
        counts[host] = counts.get(host, 0) + 1
        pat = h // HLL_M
        rho = _HLL_RHO_MAX if pat == 0 else _HLL_RHO_MAX - pat.bit_length()
        key = (host, h % HLL_M)
        regs[key] = max(regs.get(key, 0), rho)
    expected = {}
    for host in counts:
        present = [rho for (hh, _), rho in regs.items() if hh == host]
        s = sum(1 << (_HLL_RHO_MAX - rho) for rho in present)
        s += (HLL_M - len(present)) * (1 << _HLL_RHO_MAX)
        expected[host] = (counts[host], _HLL_EST_NUM // s)

    got = {
        int(r.host[4:6]): (r.n_distinct, r.hll_estimate)
        for r in hll_register_estimate(spark, sf_dir).collect()
    }
    assert got == expected


def test_hll_is_single_scan_bounded_state(spark):
    """One corpus scan, no join, no window: the register table is the
    only shuffle and it is <= m rows per host."""
    from ocr_wrapper_spark.sketch_queries import hll_register_estimate

    plan = _plan(hll_register_estimate(spark, SF_SMOKE))
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct"):
        assert bad not in plan, bad


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cms_one_sided_error_and_topk(spark):
    """The Count-Min guarantee: estimate >= true count for EVERY probed
    term (min over depth rows can only overcount), ranks are the
    contiguous top-K, and overcount is the published difference."""
    from ocr_wrapper_spark.sketch_queries import CMS_TOP_K, cms_heavy_hitters

    rows = cms_heavy_hitters(spark, SF_SMOKE).collect()
    assert sorted(r.rank for r in rows) == list(range(1, min(CMS_TOP_K, len(rows)) + 1))
    for r in rows:
        assert r.cms_estimate >= r.true_count, r.term
        assert r.overcount == r.cms_estimate - r.true_count


def test_cms_probe_join_is_broadcast(spark):
    """The K-row candidate list must broadcast against the <=D*W-row
    sketch — the corpus never crosses a join exchange."""
    from ocr_wrapper_spark.sketch_queries import cms_heavy_hitters

    plan = _plan(cms_heavy_hitters(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# priority sampling
# ---------------------------------------------------------------------------


def test_priority_sample_tau_semantics(spark):
    """DLT invariants: exactly K rows (corpus > K), ranks 1..K by
    descending priority, every kept priority >= tau, and the estimator
    is max(weight, tau) — with weight = min(n_chars+1, cap)."""
    from ocr_wrapper_spark.sketch_queries import PRIO_K, priority_sample_topk

    rows = sorted(priority_sample_topk(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert len(rows) == PRIO_K
    taus = {r.tau for r in rows}
    assert len(taus) == 1
    tau = taus.pop()
    pris = [r.priority for r in rows]
    assert pris == sorted(pris, reverse=True)
    for r in rows:
        assert r.priority >= tau
        assert r.est_weight == max(r.weight, tau)


def test_priority_sample_smaller_corpus_than_k(spark, tmp_path):
    """n <= K: every doc is kept and tau = 0, so est_weight == weight
    (the sample degrades to the exact corpus, unbiased trivially)."""
    from ocr_wrapper_spark.sketch_queries import priority_sample_topk

    sf_dir = _write_docs(tmp_path, [(i, f"doc {i}") for i in range(1, 11)])
    rows = priority_sample_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.tau == 0 and r.est_weight == r.weight for r in rows)


def test_priority_sample_topk_is_group_limited(spark):
    """The global top-(K+1) must go through WindowGroupLimit so each map
    task ships at most K+1 rows — no full-corpus single-task sort."""
    from ocr_wrapper_spark.sketch_queries import priority_sample_topk

    plan = _plan(priority_sample_topk(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# robots politeness filter
# ---------------------------------------------------------------------------


def test_robots_blocked_iff_prefix_matches(spark):
    """blocked must equal startswith(path, rule) with hosts 2 mod 3
    carrying no rule (empty prefix, never blocked); both blocked and
    unblocked rows must occur on the smoke corpus."""
    from ocr_wrapper_spark.sketch_queries import robots_disallow_filter

    rows = robots_disallow_filter(spark, SF_SMOKE).collect()
    saw = {True: 0, False: 0}
    for r in rows:
        host_idx = int(r.host[4:6])
        if host_idx % 3 == 2:
            assert r.disallow_prefix == "" and not r.blocked
        else:
            assert r.blocked == r.path.startswith(r.disallow_prefix)
        saw[bool(r.blocked)] += 1
    assert saw[True] > 0 and saw[False] > 0


def test_robots_filter_is_zero_shuffle(spark):
    """Politeness is a pure narrow map: no exchange anywhere in the
    physical plan (rule lookup is a closed form of host_idx)."""
    from ocr_wrapper_spark.sketch_queries import robots_disallow_filter

    plan = _plan(robots_disallow_filter(spark, SF_SMOKE))
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# sketch union / mergeability
# ---------------------------------------------------------------------------


def test_sketch_union_equals_directly_built_global_sketch(spark, tmp_path):
    """The merge identity: per-host sketches merged (HLL register-wise
    max, KMV pooled bottom-Ks re-cut) must equal the sketch built over
    the whole corpus at once — recomputed here globally in Python."""
    from ocr_wrapper_spark.sketch_queries import (
        _HLL_EST_NUM,
        _HLL_RHO_MAX,
        _KMV_SHIFT,
        _KMV_SPACE,
        HLL_M,
        KMV_K,
        sketch_union_corpus,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc
    import numpy as np

    docs = [(i, " ".join(f"w{(i * 13 + j) % 450}" for j in range(30))) for i in range(1, 80)]
    sf_dir = _write_docs(tmp_path, docs)

    hashes = set()  # global distinct (host, hash) pairs -> global hash set per host
    for doc_id, text in docs:
        host = int(host_for_doc(np.array([doc_id]))[0])
        for term in text.split(" "):
            hashes.add((host, int(hashlib.md5(term.encode()).hexdigest()[:15], 16)))

    # direct global HLL over all (host, h) pairs
    regs: dict[int, int] = {}
    for _, h in hashes:
        pat = h // HLL_M
        rho = _HLL_RHO_MAX if pat == 0 else _HLL_RHO_MAX - pat.bit_length()
        regs[h % HLL_M] = max(regs.get(h % HLL_M, 0), rho)
    s = sum(1 << (_HLL_RHO_MAX - r) for r in regs.values())
    s += (HLL_M - len(regs)) * (1 << _HLL_RHO_MAX)
    hll_direct = _HLL_EST_NUM // s

    # direct global bottom-K over the distinct hash values
    pool = sorted({h for _, h in hashes})
    if len(pool) >= KMV_K:
        kmv_direct = (KMV_K - 1) * _KMV_SPACE // max(pool[KMV_K - 1] // _KMV_SHIFT, 1)
    else:
        kmv_direct = len(pool)

    row = sketch_union_corpus(spark, sf_dir).collect()[0]
    assert row.n_exact == len({h for _, h in hashes})
    assert row.hll_union_estimate == hll_direct
    assert row.kmv_union_estimate == kmv_direct
