"""Curation-family tests: Bloom decontamination, bigram-LM fluency,
exact decile tiering, host-graph components."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    """Write a minimal documents.parquet a curation query can read."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_flags_every_eval_doc_and_duplicates(spark, tmp_path):
    """Bloom guarantees: no false negatives — every eval doc is flagged,
    and a training doc whose NORMALIZED text equals an eval doc's is
    flagged through the shared fingerprint (the contamination the
    operator exists to catch)."""
    from ocr_wrapper_spark.curation_queries import EVAL_MOD, EVAL_REM, decontaminate_bloom

    eval_id = EVAL_REM  # doc_id % EVAL_MOD == EVAL_REM
    sf_dir = _write_docs(
        tmp_path,
        [
            (eval_id, "the quick brown fox"),
            # same text after whitespace normalization -> same fingerprint
            (eval_id + 1, "  the   quick brown\tfox "),
            (eval_id + 2, "completely different content here"),
        ],
    )
    got = {r.doc_id: (r.in_eval, r.flagged) for r in decontaminate_bloom(spark, sf_dir).collect()}
    assert got[eval_id] == (True, True)
    assert got[eval_id + 1] == (False, True)  # contaminated duplicate
    assert got[eval_id + 2] == (False, False)


def test_bloom_corpus_side_never_shuffles(spark):
    """The membership test must be K broadcast probes over the scan —
    no sort-merge join, no corpus-keyed exchange (the property that
    makes decontamination a map-only pass at 10^12 docs)."""
    from ocr_wrapper_spark.curation_queries import decontaminate_bloom

    plan = (
        decontaminate_bloom(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_stats_bitmap_is_self_consistent(spark):
    """The packed 63-bit-word bitmap must contain exactly the distinct
    probe positions (n_set_bits == n_positions), and fill_ppm follows."""
    from ocr_wrapper_spark.curation_queries import BLOOM_M, bloom_filter_stats

    row = bloom_filter_stats(spark, SF_SMOKE).collect()[0]
    assert row.n_set_bits == row.n_positions
    assert row.n_words <= row.n_positions
    assert row.fill_ppm == row.n_positions * 1_000_000 // BLOOM_M


# ---------------------------------------------------------------------------
# bigram-LM fluency
# ---------------------------------------------------------------------------


def test_bigram_lm_matches_pure_python(spark, tmp_path):
    """Entire result equals an independent in-test bigram LM over a
    crafted corpus (reference slice = doc_id % 3 == 0): pins both the
    count derivation and the integer-ppm scoring."""
    from ocr_wrapper_spark.curation_queries import LM_MOD, LM_REM, doc_bigram_lm_score

    rows = [
        (0, "a b a b c"),  # reference doc
        (1, "a b x"),  # scored only
        (2, ""),  # empty -> 0/0
        (3, "b c a b"),  # reference doc
        (4, "zzz"),  # single token -> 0/0
    ]
    sf_dir = _write_docs(tmp_path, rows)

    c2: dict[tuple[str, str], int] = {}
    for doc_id, text in rows:
        toks = text.split(" ") if text else []
        if doc_id % LM_MOD == LM_REM and len(toks) >= 2:
            for w1, w2 in zip(toks, toks[1:]):
                c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c

    expected = {}
    for doc_id, text in rows:
        toks = text.split(" ") if text else []
        if len(toks) < 2:
            expected[doc_id] = (0, 0)
            continue
        ps = [
            1_000_000 * c2.get((w1, w2), 0) // c1[w1] if (w1, w2) in c2 else 0
            for w1, w2 in zip(toks, toks[1:])
        ]
        expected[doc_id] = (len(ps), sum(ps) // len(ps))

    got = {
        r.doc_id: (r.n_bigrams, r.fluency_ppm)
        for r in doc_bigram_lm_score(spark, sf_dir).collect()
    }
    assert got == expected


def test_bigram_lm_reference_text_scores_above_shuffled(spark, tmp_path):
    """Direction check: text made of common continuations outscores the
    same tokens in a rare order."""
    from ocr_wrapper_spark.curation_queries import doc_bigram_lm_score

    fluent = "the cat sat on the mat " * 5
    sf_dir = _write_docs(
        tmp_path,
        [
            (0, fluent.strip()),  # trains the model AND scores high
            (1, "mat the on sat cat the " * 3),  # same vocab, rare order
        ],
    )
    got = {r.doc_id: r.fluency_ppm for r in doc_bigram_lm_score(spark, sf_dir).collect()}
    assert got[0] > got[1]


# ---------------------------------------------------------------------------
# exact quality tiers
# ---------------------------------------------------------------------------


def test_quality_tiers_match_rank_definition(spark):
    """tier = (10 * |docs with strictly smaller bucket|) div N, exactly —
    recomputed from the collected buckets."""
    from ocr_wrapper_spark.curation_queries import N_TIERS, doc_quality_tiers

    rows = doc_quality_tiers(spark, SF_SMOKE).collect()
    buckets = sorted(r.bucket for r in rows)
    n = len(rows)
    import bisect

    for r in rows:
        lt = bisect.bisect_left(buckets, r.bucket)
        assert r.tier == (N_TIERS * lt) // n, (r.doc_id, r.bucket)
    assert {r.tier for r in rows} == set(range(N_TIERS))


def test_quality_tiers_ties_share_a_tier(spark, tmp_path):
    """Documents with identical per-token buckets land in the same tier
    (the determinism ntile() cannot give)."""
    from ocr_wrapper_spark.curation_queries import doc_quality_tiers

    sf_dir = _write_docs(
        tmp_path,
        [(i, "same text for everyone") for i in range(7)] + [(7, "rare wobble unique")],
    )
    rows = doc_quality_tiers(spark, sf_dir).collect()
    by_bucket: dict[int, set[int]] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, set()).add(r.tier)
    for tiers in by_bucket.values():
        assert len(tiers) == 1


def test_quality_tiers_plan_is_broadcast_back(spark):
    from ocr_wrapper_spark.curation_queries import doc_quality_tiers

    plan = doc_quality_tiers(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# host components
# ---------------------------------------------------------------------------


def test_host_components_agree_with_union_find(spark):
    """Component labels equal an independent union-find over the same
    strong-edge set (derived from crawl_link_graph's reported edges and
    the identical threshold rule)."""
    from ocr_wrapper_spark.curation_queries import STRONG_DIV, host_components
    from ocr_wrapper_spark.graph_queries import N_HOSTS, crawl_link_graph

    edges = {}
    for r in crawl_link_graph(spark, SF_SMOKE).collect():
        s, d = int(r.src[4:6]), int(r.dst[4:6])
        if s != d:
            edges[(s, d)] = r.n_links
    total = sum(edges.values())
    strong = [(s, d) for (s, d), w in edges.items() if w * STRONG_DIV >= total]

    parent = list(range(N_HOSTS))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in strong:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    expected_comp = {v: find(v) for v in range(N_HOSTS)}
    sizes: dict[int, int] = {}
    for v, c in expected_comp.items():
        sizes[c] = sizes.get(c, 0) + 1

    rows = host_components(spark, SF_SMOKE).collect()
    assert len(rows) == N_HOSTS
    for r in rows:
        v, c = int(r.host[4:6]), int(r.component[4:6])
        assert c == expected_comp[v], (v, c)
        assert r.comp_size == sizes[expected_comp[v]]


def test_host_components_nontrivial_structure(spark):
    """The Zipf host graph must yield BOTH a multi-host core and
    singletons at smoke scale — guarding against a degenerate threshold
    (all-one-component or all-singletons would silently weaken every
    other assertion here)."""
    from ocr_wrapper_spark.curation_queries import host_components

    rows = host_components(spark, SF_SMOKE).collect()
    sizes = {r.comp_size for r in rows}
    assert max(sizes) >= 3
    assert 1 in sizes


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_duplicate(spark, tmp_path):
    """A vector pointing the same direction as a lower-id vector in its
    cluster is dropped; orthogonal vectors all survive. One-hot axes
    make every cosine exactly 0 or 1, so the verdict is unambiguous."""
    import numpy as np

    from ocr_wrapper_spark.curation_queries import semantic_dedup
    from ocr_wrapper_spark.operators.similarity import N_CENTROIDS

    n, dim = 20, 64
    rows = []
    for i in range(n):
        v = np.zeros(dim, dtype=np.float32)
        if i == 19:
            v[20] = 0.5  # same direction as vec 18, different magnitude
        else:
            v[i if i < 18 else 20] = 1.0  # vec 18 = axis 20, like vec 19
        rows.append((i, v.tolist(), 0))
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    assert n > N_CENTROIDS  # seeds exist
    got = {r.vec_id: r.keep for r in semantic_dedup(spark, str(tmp_path)).collect()}
    assert got[19] is False or got[19] == False  # noqa: E712
    assert all(got[i] for i in range(19))


def test_semantic_dedup_verdicts_match_numpy(spark):
    """Every keep/drop verdict equals an independent numpy recomputation
    of the full SemDeDup rule (quantize -> cluster -> in-cluster integer
    threshold) over the real fixture."""
    import numpy as np

    from ocr_wrapper_spark.curation_queries import (
        SEMDEDUP_TAU_DEN,
        SEMDEDUP_TAU_NUM,
        semantic_dedup,
        semdedup_n_centroids,
    )
    from ocr_wrapper_spark.operators.similarity import (
        _cluster_code_matrix,
        _quantize_i8,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in e])
    V = np.asarray([r.embedding for r in e], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]

    n_centroids = semdedup_n_centroids(len(ids))
    C = V[ids < n_centroids]
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    codes = _cluster_code_matrix(Vn, Cn, n_centroids)
    cluster = np.argmax(codes, axis=1)
    Q = _quantize_i8(V).astype(np.int64)
    q2 = (Q * Q).sum(axis=1)

    tn2 = SEMDEDUP_TAU_NUM * SEMDEDUP_TAU_NUM
    td2 = SEMDEDUP_TAU_DEN * SEMDEDUP_TAU_DEN
    expected = {}
    for j in range(len(ids)):
        dup = False
        for i in range(len(ids)):
            if ids[i] < ids[j] and cluster[i] == cluster[j]:
                dot = int(Q[i] @ Q[j])
                if dot >= 0 and q2[i] > 0 and q2[j] > 0 and td2 * dot * dot >= tn2 * q2[i] * q2[j]:
                    dup = True
                    break
        expected[int(ids[j])] = (int(cluster[j]), not dup)

    got = {r.vec_id: (r.cluster, r.keep) for r in semantic_dedup(spark, SF_SMOKE).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# CDX url index
# ---------------------------------------------------------------------------


def test_cdx_index_round_trips_the_real_urls(spark):
    """Every CDX row must be derivable from the url/warc_ts the pages
    source actually emitted — recomputed per row in pure python."""
    from ocr_wrapper_spark.curation_queries import CDX_SHARD_HOSTS, cdx_url_index
    from ocr_wrapper_spark.sources.pages import materialize_pages

    pages = {
        r.url: r.warc_ts
        for r in spark.read.parquet(materialize_pages(spark, SF_SMOKE))
        .select("url", "warc_ts")
        .collect()
    }
    expected = set()
    for url, ts in pages.items():
        host, rest = url.removeprefix("https://").split(".example.com/", 1)
        expected.add((f"com,example,{host})/{rest}", ts.strftime("%Y%m%d%H%M%S")))
    rows = cdx_url_index(spark, SF_SMOKE).collect()
    got = {(r.urlkey, r.capture_ts) for r in rows}
    assert got == expected
    for r in rows:
        host_idx = int(r.urlkey[16:18])
        assert r.shard == host_idx // CDX_SHARD_HOSTS
        assert len(r.capture_ts) == 14 and r.capture_ts.isdigit()


def test_cdx_digest_matches_doc_fingerprint(spark):
    """The CDX digest column is the corpus-wide normalized fingerprint —
    identical to doc_fingerprint's for the same doc_id."""
    from ocr_wrapper_spark.curation_queries import cdx_url_index
    from ocr_wrapper_spark.text_queries import doc_fingerprint

    fps = {r.doc_id: r.fp_md5 for r in doc_fingerprint(spark, SF_SMOKE).collect()}
    for r in cdx_url_index(spark, SF_SMOKE).collect():
        doc_id = int(r.urlkey.split("/")[-1].split(".")[0])
        assert r.digest == fps[doc_id]


# ---------------------------------------------------------------------------
# source-mix apportionment
# ---------------------------------------------------------------------------


def test_apportionment_sums_to_exactly_one_million(spark):
    from ocr_wrapper_spark.curation_queries import MIX_UNITS, source_mix_apportionment

    rows = source_mix_apportionment(spark, SF_SMOKE).collect()
    assert sum(r.share_ppm for r in rows) == MIX_UNITS
    assert len(rows) > 10  # real group structure, not a collapsed key


def test_apportionment_matches_pure_python_hamilton(spark):
    """share_ppm equals an independent largest-remainder apportionment
    over the same token totals."""
    from ocr_wrapper_spark.curation_queries import MIX_UNITS, source_mix_apportionment

    rows = source_mix_apportionment(spark, SF_SMOKE).collect()
    total = sum(r.n_tokens for r in rows)
    base = {(r.source, r.lang): r.n_tokens * MIX_UNITS // total for r in rows}
    frac = {(r.source, r.lang): r.n_tokens * MIX_UNITS % total for r in rows}
    leftover = MIX_UNITS - sum(base.values())
    order = sorted(frac, key=lambda k: (-frac[k], k))
    for k in order[:leftover]:
        base[k] += 1
    got = {(r.source, r.lang): r.share_ppm for r in rows}
    assert got == base


# ---------------------------------------------------------------------------
# host downsample cap / length histogram
# ---------------------------------------------------------------------------


def test_host_cap_bounds_every_hosts_expected_share(spark):
    """rate_ppm must equal the closed-form cap rule per host, and the
    Zipf-top host must actually be cut (rate < 1e6) while tail hosts
    keep everything."""
    from ocr_wrapper_spark.curation_queries import HOST_CAP_PPM, host_downsample_cap

    rows = host_downsample_cap(spark, SF_SMOKE).collect()
    total = len(rows)
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    rates = {}
    for host, hr in by_host.items():
        n = len(hr)
        expected_rate = min(n, total * HOST_CAP_PPM // 1_000_000) * 1_000_000 // n
        assert all(r.rate_ppm == expected_rate for r in hr), host
        rates[host] = expected_rate
    assert min(rates.values()) < 1_000_000  # top host really capped
    assert max(rates.values()) == 1_000_000  # tail hosts untouched
    # verdicts are the deterministic hash rule: kept set is reproducible
    again = {r.doc_id: r.keep for r in host_downsample_cap(spark, SF_SMOKE).collect()}
    assert {r.doc_id: r.keep for r in rows} == again


def test_length_histogram_is_exact_log2(spark):
    """Buckets and shares recomputed from raw token counts."""
    from ocr_wrapper_spark.curation_queries import doc_length_histogram

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ns = [len(d.text.split(" ")) if d.text else 0 for d in docs]
    hist: dict[int, list[int]] = {}
    for n in ns:
        b = 0 if n == 0 else n.bit_length()
        hist.setdefault(b, [0, 0])
        hist[b][0] += 1
        hist[b][1] += n
    td, tt = sum(v[0] for v in hist.values()), max(1, sum(v[1] for v in hist.values()))
    rows = doc_length_histogram(spark, SF_SMOKE).collect()
    got = {r.bucket: (r.n_docs, r.n_tokens, r.doc_share_ppm, r.token_share_ppm) for r in rows}
    expected = {
        b: (v[0], v[1], v[0] * 1_000_000 // td, v[1] * 1_000_000 // tt)
        for b, v in hist.items()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# DSIR importance weighting
# ---------------------------------------------------------------------------


def _dsir_expected(docs):
    """Pure-python replica of the DSIR arithmetic: docs is a list of
    (doc_id, lang, text); returns {doc_id: (n_tokens, weight_ppm,
    selected)}."""
    import hashlib

    from ocr_wrapper_spark.curation_queries import (
        DSIR_B,
        DSIR_SELECT_PPM,
        DSIR_TARGET_LANG,
    )

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % DSIR_B

    q: dict[int, int] = {}
    p: dict[int, int] = {}
    for _, lang, text in docs:
        if text == "":
            continue
        for w in text.split(" "):
            b = bucket(w)
            q[b] = q.get(b, 0) + 1
            if lang == DSIR_TARGET_LANG:
                p[b] = p.get(b, 0) + 1
    qc = {b: c + 1 for b, c in q.items()}
    pc = {b: p.get(b, 0) + 1 for b in q}
    qt, pt = sum(qc.values()), sum(pc.values())
    r = {b: 1_000_000 * pc[b] * qt // (qc[b] * pt) for b in q}
    out = {}
    for doc_id, _, text in docs:
        if text == "":
            out[doc_id] = (0, 0, False)
            continue
        toks = text.split(" ")
        s = sum(r[bucket(w)] for w in toks)
        w_ppm = s // len(toks)
        out[doc_id] = (len(toks), w_ppm, w_ppm >= DSIR_SELECT_PPM)
    return out


def _write_lang_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)
    return str(tmp_path)


def test_dsir_weights_match_pure_python(spark, tmp_path):
    """Exact arithmetic replica over a mixed-language corpus, including
    the empty-doc verdict and an off-target doc built from target-heavy
    tokens (which must still score high — DSIR weights tokens, not
    labels)."""
    from ocr_wrapper_spark.curation_queries import dsir_importance_weights

    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog ran to the park"),
        (2, "de", "der hund lief zum park"),
        (3, "fr", "le chat dort sur le tapis"),
        (4, "de", "the cat ran to the mat"),  # target tokens, raw label
        (5, "en", ""),
    ]
    sf_dir = _write_lang_docs(tmp_path, docs)
    got = {
        r.doc_id: (r.n_tokens, r.dsir_weight_ppm, r.selected)
        for r in dsir_importance_weights(spark, sf_dir).collect()
    }
    assert got == _dsir_expected(docs)
    # the target-shaped doc with a raw label is kept; pure off-target text is not
    assert got[4][2] is True
    assert got[2][2] is False and got[3][2] is False


def test_dsir_empty_target_slice_still_scores(spark, tmp_path):
    """No en docs at all: add-1 smoothing keeps every ratio defined
    (uniform p), so weights exist and nothing crashes or drops."""
    from ocr_wrapper_spark.curation_queries import dsir_importance_weights

    docs = [(0, "de", "ein zwei drei"), (1, "fr", "un deux trois")]
    sf_dir = _write_lang_docs(tmp_path, docs)
    rows = dsir_importance_weights(spark, sf_dir).collect()
    assert len(rows) == 2
    assert all(r.dsir_weight_ppm > 0 for r in rows)
    assert _dsir_expected(docs) == {
        r.doc_id: (r.n_tokens, r.dsir_weight_ppm, r.selected) for r in rows
    }


def test_dsir_scoring_plan_is_broadcast(spark):
    """The token stream must meet the B-row ratio table through a
    broadcast hash join — a sort-merge exchange of the exploded token
    stream would shuffle |corpus tokens| rows at 10^12 docs."""
    from ocr_wrapper_spark.curation_queries import dsir_importance_weights

    plan = (
        dsir_importance_weights(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# recrawl scheduling
# ---------------------------------------------------------------------------


def test_recrawl_tiers_match_fingerprint_history(spark, tmp_path):
    """Planted capture histories: identical captures -> frozen, all
    distinct -> hot; normalization-equal captures share a fingerprint."""
    from ocr_wrapper_spark.curation_queries import recrawl_schedule

    docs = [
        (0, "stable page text"),
        (1, "stable   page\ttext "),  # same fp after normalization
        (2, "version one"),
        (3, "version two"),
    ]
    sf_dir = _write_docs(tmp_path, docs)
    got = {r.url_key: r for r in recrawl_schedule(spark, sf_dir).collect()}
    assert got[0].n_versions == 1 and got[0].recrawl_tier == "frozen"
    assert got[0].change_rate_ppm == 0
    assert got[1].n_versions == 2 and got[1].recrawl_tier == "hot"
    assert got[1].change_rate_ppm == 1_000_000


def test_recrawl_single_shuffle_no_join(spark):
    """One keyed aggregation is the whole plan: no join, no window, no
    second exchange above the partial agg."""
    from ocr_wrapper_spark.curation_queries import recrawl_schedule

    plan = (
        recrawl_schedule(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# training-shard manifest
# ---------------------------------------------------------------------------


def test_shard_manifest_accounts_for_every_doc_and_token(spark):
    """Shard totals partition the corpus exactly: sums over the manifest
    equal corpus totals, every shard id is in range, and the share/
    imbalance columns recompute from the totals."""
    from ocr_wrapper_spark.curation_queries import N_SHARDS, training_shard_manifest

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    total_docs = len(docs)
    total_tokens = sum(len(d.text.split(" ")) if d.text else 0 for d in docs)
    total_bytes = sum(len(d.text) for d in docs)
    rows = training_shard_manifest(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.n_tokens for r in rows) == total_tokens
    assert sum(r.n_bytes for r in rows) == total_bytes
    assert all(0 <= r.shard_id < N_SHARDS for r in rows)
    tt = max(total_tokens, 1)
    for r in rows:
        assert r.token_share_ppm == r.n_tokens * 1_000_000 // tt
        assert r.imbalance_ppm == abs(r.n_tokens * N_SHARDS * 1_000_000 // tt - 1_000_000)


def test_shard_assignment_is_content_stable(spark, tmp_path):
    """The same text lands in the same shard whatever its doc_id — the
    writer-resume guarantee — and normalization-equal texts share a
    shard."""
    from ocr_wrapper_spark.curation_queries import training_shard_manifest

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    sf_a = _write_docs(tmp_path / "a", [(1, "the quick brown fox"), (2, "zzz")])
    sf_b = _write_docs(tmp_path / "b", [(900, "the  quick brown\tfox"), (901, "zzz")])
    a = {r.n_bytes: r.shard_id for r in training_shard_manifest(spark, sf_a).collect()}
    b = {r.n_bytes: r.shard_id for r in training_shard_manifest(spark, sf_b).collect()}
    assert a[3] == b[3]  # "zzz" shard is doc_id-independent
