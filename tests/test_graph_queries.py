"""Link-graph + paragraph-dedup guarantees beyond the DuckDB crosscheck:

* PageRank invariants the oracle can't see failing cheaply: edge-weight
  totals, rank-mass conservation (up to floor losses + dangling drop),
  Zipf-top host attracting the top rank.
* paragraph_dedup first-occurrence semantics on a crafted corpus with
  known duplicate paragraphs (the synthetic sf tables have few).
* plan shape: the iteration joins broadcast the rank vector; the
  paragraph window is fingerprint-partitioned (never a global window).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _n_html_docs(spark) -> int:
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return d.filter(
        ((F.col("doc_id") % 5 == 0) | (F.col("doc_id") % 5 == 2))
        & (F.col("doc_id") % 10 != 7)
    ).count()


def test_link_graph_totals_and_hosts(spark):
    """Every html page carries exactly OUTLINKS_PER_DOC parseable
    anchors; non-html dialects carry none."""
    from ocr_wrapper_spark.graph_queries import (
        N_HOSTS,
        OUTLINKS_PER_DOC,
        crawl_link_graph,
    )

    rows = crawl_link_graph(spark, SF_SMOKE).collect()
    assert sum(r.n_links for r in rows) == OUTLINKS_PER_DOC * _n_html_docs(spark)
    for r in rows:
        assert r.src.startswith("host") and r.src.endswith(".example.com")
        assert 0 <= int(r.dst[4:6]) < N_HOSTS
        assert 1 <= r.n_src_docs <= r.n_links


def test_pagerank_exactly_mirrors_reference_iteration(spark):
    """All 40 ppm values must equal an independent in-test integer
    PageRank over the edges crawl_link_graph itself reports — pinning
    the distributed loop (broadcast join + keyed agg + floor div) to
    the textbook sequential form, including dangling-mass drop for
    hosts whose docs are all non-html."""
    from ocr_wrapper_spark.graph_queries import (
        DAMP_PPM,
        N_HOSTS,
        OUTLINKS_PER_DOC,
        PAGERANK_ITERS,
        PR_BASE_PPM,
        PR_INIT_PPM,
        crawl_link_graph,
        crawl_pagerank,
    )

    edges = [
        (int(r.src[4:6]), int(r.dst[4:6]), r.n_links)
        for r in crawl_link_graph(spark, SF_SMOKE).collect()
    ]
    outdeg = {}
    for s, _, w in edges:
        outdeg[s] = outdeg.get(s, 0) + w
    ppm = {v: PR_INIT_PPM for v in range(N_HOSTS)}
    for _ in range(PAGERANK_ITERS):
        inc = {}
        for s, t, w in edges:
            inc[t] = inc.get(t, 0) + (ppm[s] * w) // outdeg[s]
        ppm = {v: PR_BASE_PPM + (DAMP_PPM * inc.get(v, 0)) // 1_000_000 for v in range(N_HOSTS)}

    pr = crawl_pagerank(spark, SF_SMOKE).collect()
    assert len(pr) == N_HOSTS
    got = {int(r.host[4:6]): r.pr_ppm for r in pr}
    assert got == ppm
    # the Zipf cdf makes host00 the most-linked-to destination
    assert max(got, key=got.get) == 0
    assert sum(r.out_links for r in pr) == OUTLINKS_PER_DOC * _n_html_docs(spark)


def test_pagerank_iteration_broadcasts_rank_vector(spark):
    from ocr_wrapper_spark.graph_queries import crawl_pagerank

    plan = crawl_pagerank(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_paragraph_dedup_first_occurrence(spark, tmp_path):
    from ocr_wrapper_spark.graph_queries import PARA_WORDS, paragraph_dedup

    para_a = " ".join(f"a{i}" for i in range(PARA_WORDS))
    para_b = " ".join(f"b{i}" for i in range(PARA_WORDS))
    docs = [
        (1, f"{para_a} {para_b}", "en", "web", 0),
        (2, f"{para_b} {para_a}", "en", "web", 0),  # both paras are dups
        (3, para_a, "en", "web", 0),  # dup of doc 1 para 0
        (4, "short tail", "en", "web", 0),  # partial paragraph, unique
        (5, "", "en", "web", 0),  # empty: no paragraphs
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    out = {(r.doc_id, r.para_idx): r for r in paragraph_dedup(spark, sf).collect()}
    assert set(out) == {(1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (4, 0)}
    assert out[(1, 0)].is_first and out[(1, 1)].is_first
    assert not out[(2, 0)].is_first and not out[(2, 1)].is_first
    assert not out[(3, 0)].is_first
    assert out[(4, 0)].is_first
    # exactly one first per fingerprint
    firsts = [r for r in out.values() if r.is_first]
    assert len({r.fp_md5 for r in firsts}) == len(firsts)
    assert len({r.fp_md5 for r in out.values()}) == len(firsts)


def test_paragraph_dup_ratio_keep_cut(spark, tmp_path):
    from ocr_wrapper_spark.graph_queries import PARA_WORDS, paragraph_dup_ratio

    para = " ".join(f"w{i}" for i in range(PARA_WORDS))
    uniq = [" ".join(f"u{d}_{i}" for i in range(PARA_WORDS)) for d in range(3)]
    docs = [
        (1, para, "en", "web", 0),  # the original: 0% dup
        (2, f"{para} {para}", "en", "web", 0),  # 100% dup -> cut
        (3, f"{uniq[0]} {uniq[1]} {uniq[2]} {para}", "en", "web", 0),  # 25% -> keep
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    got = {r.doc_id: r for r in paragraph_dup_ratio(spark, sf).collect()}
    assert got[1].keep and got[1].dup_ppm == 0
    assert not got[2].keep and got[2].dup_ppm == 1_000_000
    assert got[3].keep and got[3].dup_ppm == 250_000 and got[3].n_paras == 4


def test_paragraph_window_is_fingerprint_partitioned(spark):
    from ocr_wrapper_spark.graph_queries import paragraph_dedup

    plan = (
        paragraph_dedup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(fp_md5" in plan


def test_anchor_stats_prunes_page_scan(spark):
    """The anchor scan must read only (url, html) from the pages parquet
    — dragging `text` (the widest column) through a 100 TB scan would
    double the IO."""
    from ocr_wrapper_spark.pipeline_queries import html_anchor_stats

    plan = (
        html_anchor_stats(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"url", "html"}, cols
    assert "BatchEvalPython" not in plan


def test_graph_iterations_scan_pages_once(spark, monkeypatch):
    """Each iterative graph query must derive EVERY corpus read —
    iteration joins, degree rollups, the final out_links join — from
    the one persisted edge table: a second _outlinked lineage would
    re-scan and re-parse the corpus, doubling the corpus-size work at
    100 TB (the regression the r5 review pass caught in pagerank's
    out_links join)."""
    import ocr_wrapper_spark.graph_queries as gq

    calls = []
    orig = gq._outlinked
    monkeypatch.setattr(
        gq, "_outlinked", lambda s, d: (calls.append(1), orig(s, d))[1]
    )
    for fn in (gq.crawl_pagerank, gq.crawl_hits):
        calls.clear()
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert len(calls) == 1, (fn.__name__, len(calls))
        # and the single lineage is served from the persisted cache
        assert "InMemoryTableScan" in plan, fn.__name__


def test_hits_exactly_mirrors_reference_iteration(spark):
    """All 40 (auth, hub) ppm pairs must equal an independent in-test
    integer HITS over the edges crawl_link_graph reports — pinning the
    distributed loop (outdegree-ppm weights, per-edge floor, L1 ppm
    normalization) to the sequential textbook form."""
    from ocr_wrapper_spark.graph_queries import (
        HITS_INIT_PPM,
        HITS_ITERS,
        N_HOSTS,
        crawl_hits,
        crawl_link_graph,
    )

    edges = [
        (int(r.src[4:6]), int(r.dst[4:6]), r.n_links)
        for r in crawl_link_graph(spark, SF_SMOKE).collect()
    ]
    outdeg = {}
    for s, _, w in edges:
        outdeg[s] = outdeg.get(s, 0) + w
    ew = [(s, t, (w * 1_000_000) // outdeg[s]) for s, t, w in edges]

    def gather(scores, key_in):
        raw = {v: 0 for v in range(N_HOSTS)}
        for s, t, wn in ew:
            src, dst = (s, t) if key_in == 0 else (t, s)
            raw[dst] += (scores[src] * wn) // 1_000_000
        total = max(sum(raw.values()), 1)
        return {v: (r * 1_000_000) // total for v, r in raw.items()}

    h = {v: HITS_INIT_PPM for v in range(N_HOSTS)}
    for _ in range(HITS_ITERS):
        a = gather(h, 0)
        h = gather(a, 1)

    got = {int(r.host[4:6]): (r.auth_ppm, r.hub_ppm) for r in crawl_hits(spark, SF_SMOKE).collect()}
    assert len(got) == N_HOSTS
    assert got == {v: (a[v], h[v]) for v in range(N_HOSTS)}
    # Zipf: host00 is the strongest authority
    assert max(got, key=lambda v: got[v][0]) == 0


def test_degree_reciprocity_consistency(spark):
    """Degrees/weights must reconcile with the edge table itself, and
    reciprocity must match a set-based recomputation."""
    from ocr_wrapper_spark.graph_queries import (
        N_HOSTS,
        crawl_link_graph,
        host_degree_reciprocity,
    )

    edges = {
        (int(r.src[4:6]), int(r.dst[4:6])): r.n_links
        for r in crawl_link_graph(spark, SF_SMOKE).collect()
    }
    rows = {int(r.host[4:6]): r for r in host_degree_reciprocity(spark, SF_SMOKE).collect()}
    assert len(rows) == N_HOSTS
    for v, r in rows.items():
        outs = {d: w for (s, d), w in edges.items() if s == v}
        ins = {s: w for (s, d), w in edges.items() if d == v}
        assert r.out_deg == len(outs) and r.out_w == sum(outs.values())
        assert r.in_deg == len(ins) and r.in_w == sum(ins.values())
        # self-loops are their own reverse and must NOT count as mutual
        n_recip = sum(1 for d in outs if d != v and (d, v) in edges)
        assert r.n_recip == n_recip
        assert r.recip_ppm == (n_recip * 1_000_000) // max(r.out_deg, 1)


def test_hits_iteration_broadcasts_score_vector(spark):
    from ocr_wrapper_spark.graph_queries import crawl_hits

    plan = crawl_hits(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_doc_id_parse_survives_wide_ids(spark):
    """Urls zero-pad doc_id to 10 digits but WIDEN past 1e10 (replicated
    corpora, the brief's 10^12 rows) — the shared parse must accept 10+
    digits, not exactly 10."""
    from ocr_wrapper_spark.sources.pages import doc_id_from_url

    wide = 123_456_789_012  # 12 digits
    df = spark.createDataFrame(
        [
            (f"https://host00.example.com/en/{wide:010d}.html",),
            ("https://host01.example.com/en/0000000042.html",),
        ],
        "url string",
    )
    got = sorted(r[0] for r in df.select(doc_id_from_url()).collect())
    assert got == [42, wide]


# ---------------------------------------------------------------------------
# frontier priority fusion
# ---------------------------------------------------------------------------


def test_priority_fusion_consistent_with_components_and_plan(spark):
    """The fusion must equal the join of the two REGISTERED components
    (crawl_pagerank authority x doc_quality_classifier score) ordered by
    (priority desc, doc_id) — and the head must be planned as
    TakeOrderedAndProject, not a global sort."""
    from ocr_wrapper_spark.graph_queries import (
        FUSION_TOP_K,
        crawl_pagerank,
        crawl_priority_fusion,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc
    from ocr_wrapper_spark.text_queries import doc_quality_classifier

    import numpy as np

    sf = SF_SMOKE
    pr = {r.host: r.pr_ppm for r in crawl_pagerank(spark, sf).collect()}
    qc = {r.doc_id: r.score_ppm for r in doc_quality_classifier(spark, sf).collect()}
    ids = np.array(sorted(qc), dtype=np.int64)
    hosts = host_for_doc(ids)
    fused = sorted(
        (
            (
                -pr[f"host{int(h):02d}.example.com"] * (max(qc[int(i)], 0) + 1),
                int(i),
            )
            for i, h in zip(ids, hosts)
        )
    )[:FUSION_TOP_K]
    expect = [(doc_id, -neg) for neg, doc_id in fused]
    got = [
        (r.doc_id, r.priority) for r in crawl_priority_fusion(spark, sf).collect()
    ]
    assert got == expect
    plan = crawl_priority_fusion(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_colink_similarity_matches_link_graph_sets(spark):
    """Pairwise Jaccard must equal the brute-force set computation over
    the distinct (src, dst) edges crawl_link_graph itself reports —
    pinning the dst-keyed pair join to the set-algebra definition."""
    from ocr_wrapper_spark.graph_queries import (
        COLINK_MIRROR_PPM,
        crawl_link_graph,
        host_colink_similarity,
    )

    out: dict[int, set[int]] = {}
    for r in crawl_link_graph(spark, SF_SMOKE).collect():
        out.setdefault(int(r.src[4:6]), set()).add(int(r.dst[4:6]))
    expect = {}
    hosts = sorted(out)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            shared = len(out[a] & out[b])
            if shared == 0:
                continue
            union = len(out[a]) + len(out[b]) - shared
            jac = shared * 1_000_000 // union
            expect[(a, b)] = (
                len(out[a]),
                len(out[b]),
                shared,
                jac,
                jac >= COLINK_MIRROR_PPM,
            )
    got = {
        (r.host_a, r.host_b): (
            r.n_out_a,
            r.n_out_b,
            r.n_shared,
            r.jaccard_ppm,
            r.mirror_candidate,
        )
        for r in host_colink_similarity(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect  # the nav-wall anchors guarantee co-links at smoke scale
    for (a, b), (_, _, _, jac, _) in got.items():
        assert a < b and 0 <= jac <= 1_000_000
