"""Release-integrity family tests: redirect-chain pointer jumping
(python replica, gap semantics, full-depth coverage of the doubling
rounds), confusable-skeleton dedup (planted homoglyph twin + natural
exact-dup control + full python replica), and the k-anonymity gate
(python replica over the shared Zipf host draw). Replicas are built
from the parquet bytes, never from the query's own SQL."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# redirect-chain resolution
# ---------------------------------------------------------------------------


def _walk_replica(ids):
    """Sequential existence-aware chain walk (the naive algorithm)."""
    from ocr_wrapper_spark.integrity_queries import REDIRECT_CHAIN

    present = set(int(i) for i in ids)
    out = {}
    for d in present:
        cur, hops = d, 0
        while cur % REDIRECT_CHAIN != 0 and (cur - 1) in present:
            cur, hops = cur - 1, hops + 1
        out[d] = (cur, hops)
    return out


def test_redirect_pointer_jump_matches_sequential_replica(spark):
    from ocr_wrapper_spark.integrity_queries import redirect_chain_resolution

    ids = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id"])["doc_id"]
    expect = _walk_replica(ids)
    got = {
        r.doc_id: (r.canonical_id, r.hops)
        for r in redirect_chain_resolution(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_redirect_chain_breaks_at_gaps(spark, tmp_path):
    """Docs whose arithmetic parent is absent are their own canonical
    target — the id set carries two mid-chain gaps and one intact
    3-chain."""
    from ocr_wrapper_spark.integrity_queries import redirect_chain_resolution

    sf = _write_docs(tmp_path, [(i, f"t{i}") for i in (0, 1, 2, 18, 19, 33)])
    got = {
        r.doc_id: (r.canonical_id, r.hops)
        for r in redirect_chain_resolution(spark, sf).collect()
    }
    assert got == {
        0: (0, 0),  # chain head
        1: (0, 1),
        2: (0, 2),
        18: (18, 0),  # parent 17 absent -> root
        19: (18, 1),
        33: (33, 0),  # parent 32 absent -> root
    }


def test_redirect_doubling_rounds_cover_max_depth(spark, tmp_path):
    """Three full 16-deep chains: the deepest member (position 15) must
    resolve in the configured PJ_ROUNDS — if someone lowers the round
    count below ceil(log2(CHAIN-1)) this is the test that fails."""
    from ocr_wrapper_spark.integrity_queries import (
        REDIRECT_CHAIN,
        redirect_chain_resolution,
    )

    sf = _write_docs(tmp_path, [(i, f"t{i}") for i in range(3 * REDIRECT_CHAIN)])
    rows = redirect_chain_resolution(spark, sf).collect()
    assert len(rows) == 3 * REDIRECT_CHAIN
    for r in rows:
        assert r.canonical_id == r.doc_id - (r.doc_id % REDIRECT_CHAIN)
        assert r.hops == r.doc_id % REDIRECT_CHAIN
    assert max(r.hops for r in rows) == REDIRECT_CHAIN - 1


# ---------------------------------------------------------------------------
# confusable-skeleton dedup
# ---------------------------------------------------------------------------


def _conf_replica(docs: pd.DataFrame):
    from ocr_wrapper_spark.integrity_queries import (
        CONF_ASCII,
        CONF_CYRIL,
        VARIANT_MOD,
        VARIANT_OFFSET,
        VARIANT_RES,
        ZERO_WIDTH,
    )

    fwd = str.maketrans(CONF_ASCII, CONF_CYRIL)
    back = str.maketrans(CONF_CYRIL, CONF_ASCII)
    strip = {ord(c): None for c in ZERO_WIDTH}
    corpus = [(int(r.doc_id), r.text) for r in docs.itertuples()]
    corpus += [
        (int(r.doc_id) + VARIANT_OFFSET, r.text.translate(fwd).replace(" ", " " + ZERO_WIDTH[0]))
        for r in docs.itertuples()
        if int(r.doc_id) % VARIANT_MOD == VARIANT_RES
    ]
    groups = {}
    for doc_id, text in corpus:
        sk = hashlib.md5(text.translate(strip).translate(back).encode()).hexdigest()
        raw = hashlib.md5(text.encode()).hexdigest()
        g = groups.setdefault(sk, {"n": 0, "raw": set(), "min_id": doc_id})
        g["n"] += 1
        g["raw"].add(raw)
        g["min_id"] = min(g["min_id"], doc_id)
    return {
        sk: (g["n"], len(g["raw"]), g["min_id"], len(g["raw"]) >= 2)
        for sk, g in groups.items()
        if g["n"] >= 2
    }


def test_confusable_planted_twin_and_exact_dup_control(spark, tmp_path):
    from ocr_wrapper_spark.integrity_queries import confusable_skeleton_dedup

    # id 3 (3 % 7 == 3) gains an obfuscated twin; ids 1 and 8 are a
    # natural exact-dup pair (1 % 7 and 8 % 7 are both 1 — no twins);
    # id 2 is isolated and must not appear.
    sf = _write_docs(
        tmp_path,
        [(3, "payload ace zone"), (1, "dup dup"), (8, "dup dup"), (2, "lonely row")],
    )
    rows = {r.canonical_doc: r for r in confusable_skeleton_dedup(spark, sf).collect()}
    assert set(rows) == {3, 1}
    twin = rows[3]
    assert (twin.n_docs, twin.n_raw_variants, twin.evades_exact_dedup) == (2, 2, True)
    ctrl = rows[1]
    assert (ctrl.n_docs, ctrl.n_raw_variants, ctrl.evades_exact_dedup) == (2, 1, False)


def test_confusable_python_replica_smoke(spark):
    from ocr_wrapper_spark.integrity_queries import confusable_skeleton_dedup

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    expect = _conf_replica(docs)
    got = {
        r.skeleton_fp: (r.n_docs, r.n_raw_variants, r.canonical_doc, r.evades_exact_dedup)
        for r in confusable_skeleton_dedup(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the planted twins must actually be present and flagged
    assert any(v[3] for v in got.values())


# ---------------------------------------------------------------------------
# k-anonymity release gate
# ---------------------------------------------------------------------------


def test_k_anonymity_replica_smoke(spark):
    from ocr_wrapper_spark.integrity_queries import (
        K_ANON,
        SIZE_BUCKET_CHARS,
        release_k_anonymity,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = pd.read_parquet(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    docs = docs.assign(
        host=[f"host{h:02d}.example.com" for h in hosts],
        size_bucket=docs.n_chars.to_numpy(np.int64) // SIZE_BUCKET_CHARS,
    )
    expect = {
        (h, la, int(b)): n
        for (h, la, b), n in docs.groupby(["host", "lang", "size_bucket"]).size().items()
    }
    rows = release_k_anonymity(spark, SF_SMOKE).collect()
    got = {(r.host, r.lang, r.size_bucket): r.n_docs for r in rows}
    assert got == expect
    assert sum(got.values()) == len(docs)
    for r in rows:
        assert r.released == (r.n_docs >= K_ANON)
    # both verdicts must occur on the smoke corpus for the gate to mean anything
    verdicts = {r.released for r in rows}
    assert verdicts == {True, False}


# ---------------------------------------------------------------------------
# token-budget quality cut
# ---------------------------------------------------------------------------


def _knuth_u(x: int) -> float:
    return ((x % 2**32) * 2654435761 % 2**32) / 2**32


def _qc_score(text: str) -> int:
    from ocr_wrapper_spark.text_queries import QC_BUCKETS

    if text == "":
        return 0
    s = 0
    for tok in text.split(" "):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % QC_BUCKETS
        s += int(np.floor(_knuth_u(b) * 2_000_000)) - 1_000_000
    return s


def test_token_budget_cut_replica_and_monotonicity(spark):
    from ocr_wrapper_spark.integrity_queries import (
        BUDGET_PPM,
        QB_SHIFT,
        QB_WIDTH,
        token_budget_quality_cut,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    buckets = {}
    for t in docs.text:
        n = 0 if t == "" else len(t.split(" "))
        b = (_qc_score(t) + QB_SHIFT) // QB_WIDTH
        nd, bt = buckets.get(b, (0, 0))
        buckets[b] = (nd + 1, bt + n)
    total = sum(bt for _, bt in buckets.values())
    cum, expect = 0, {}
    for b in sorted(buckets, reverse=True):
        nd, bt = buckets[b]
        in_budget = cum * 1_000_000 < total * BUDGET_PPM
        cum += bt
        expect[b * QB_WIDTH - QB_SHIFT] = (nd, bt, cum, in_budget)
    rows = token_budget_quality_cut(spark, SF_SMOKE).collect()
    got = {
        r.score_floor_ppm: (r.n_docs, r.bucket_tokens, r.cum_tokens, r.in_budget)
        for r in rows
    }
    assert got == expect
    # the verdict is monotone in score: a prefix of the descending order
    ordered = [r.in_budget for r in sorted(rows, key=lambda r: -r.score_floor_ppm)]
    assert ordered == sorted(ordered, reverse=True)
    assert True in ordered and False in ordered  # budget binds on smoke
    # token accounting is exact
    assert max(r.cum_tokens for r in rows) == sum(r.bucket_tokens for r in rows)


# ---------------------------------------------------------------------------
# host-disjoint split + leakage audit
# ---------------------------------------------------------------------------


def _split_of_host(h: int) -> str:
    from ocr_wrapper_spark.integrity_queries import SPLIT_SALT, SPLIT_TRAIN, SPLIT_VAL

    u = _knuth_u(h + SPLIT_SALT)
    return "train" if u < SPLIT_TRAIN else "val" if u < SPLIT_VAL else "test"


def _fp_md5(text: str) -> str:
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip()).lower()
    return hashlib.md5(norm.encode()).hexdigest()


def test_host_disjoint_split_replica_smoke(spark):
    from ocr_wrapper_spark.integrity_queries import host_disjoint_split
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    splits = [_split_of_host(int(h)) for h in hosts]
    fps = [_fp_md5(t) for t in docs.text]
    per = {}
    for sp, h, fp in zip(splits, hosts, fps):
        d = per.setdefault(sp, {"n": 0, "hosts": set(), "fps": set()})
        d["n"] += 1
        d["hosts"].add(int(h))
        d["fps"].add(fp)
    fp_splits = {}
    for sp, fp in zip(splits, fps):
        fp_splits.setdefault(fp, set()).add(sp)
    expect = {
        sp: (
            d["n"],
            len(d["hosts"]),
            len(d["fps"]),
            sum(1 for fp in d["fps"] if len(fp_splits[fp]) >= 2),
        )
        for sp, d in per.items()
    }
    got = {
        r.split: (r.n_docs, r.n_hosts, r.n_fps, r.n_leaked_fps)
        for r in host_disjoint_split(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert set(got) == {"train", "val", "test"}  # all splits populated on smoke


def test_host_disjoint_split_planted_cross_split_leak(spark, tmp_path):
    """The same text on a train-host doc and a test-host doc must count
    as one leaked fingerprint in BOTH splits; ids are searched at test
    time so the planted docs provably land on hosts in different
    splits."""
    import itertools

    from ocr_wrapper_spark.integrity_queries import host_disjoint_split
    from ocr_wrapper_spark.sources.pages import host_for_doc

    by_split = {}
    for i in itertools.count():
        sp = _split_of_host(int(host_for_doc(np.array([i], dtype=np.int64))[0]))
        by_split.setdefault(sp, i)
        if {"train", "test"} <= set(by_split):
            break
    a, b = by_split["train"], by_split["test"]
    sf = _write_docs(
        tmp_path, [(a, "shared leak text"), (b, "shared leak text"), (a + 1000000, "solo")]
    )
    got = {r.split: r for r in host_disjoint_split(spark, sf).collect()}
    assert got["train"].n_leaked_fps == 1
    assert got["test"].n_leaked_fps == 1


# ---------------------------------------------------------------------------
# pagination stitch join
# ---------------------------------------------------------------------------


def test_stitch_planted_pagination_pair(spark, tmp_path):
    from ocr_wrapper_spark.integrity_queries import (
        OVERLAP_K,
        STITCH_MIN_TOKENS,
        STITCH_OFF1,
        STITCH_OFF2,
        doc_pagination_stitch,
    )

    toks = [f"w{i}" for i in range(14)]  # 14 >= STITCH_MIN_TOKENS, all distinct
    short = [f"s{i}" for i in range(STITCH_MIN_TOKENS - 1)]  # too short to split
    sf = _write_docs(tmp_path, [(16, " ".join(toks)), (27, " ".join(short))])
    rows = doc_pagination_stitch(spark, tmp_path.as_posix()).collect()
    assert sf  # silence unused warning
    pairs = {(r.prev_id, r.next_id) for r in rows}
    assert (16 + STITCH_OFF1, 16 + STITCH_OFF2) in pairs
    # no pair involves the short doc's pseudo-pages (they don't exist)
    assert not any(p % 10**12 == 27 for pair in pairs for p in pair if p >= 10**12)
    # overlap fingerprint is the md5 of page-1's trailing k tokens
    m = len(toks) // 2
    fp = hashlib.md5(" ".join(toks[m - OVERLAP_K : m]).encode()).hexdigest()
    row = next(r for r in rows if (r.prev_id, r.next_id) == (16 + STITCH_OFF1, 16 + STITCH_OFF2))
    assert row.overlap_fp == fp


def test_stitch_hot_key_cut(spark, tmp_path):
    """A boilerplate ending shared by > STITCH_MAX_DF docs must produce
    ZERO pairs on that fingerprint (quadratic-fanout guard), even
    though a doc starting with the same 5 tokens exists."""
    from ocr_wrapper_spark.integrity_queries import STITCH_MAX_DF, doc_pagination_stitch

    hot = "z1 z2 z3 z4 z5"
    rows = [(i * 11 + 1, f"u{i} " + hot) for i in range(STITCH_MAX_DF + 1)]  # ids % 11 == 1
    rows.append((2, hot + " continuation text here"))
    sf = _write_docs(tmp_path, rows)
    got = doc_pagination_stitch(spark, sf).collect()
    fp = hashlib.md5(hot.encode()).hexdigest()
    assert not any(r.overlap_fp == fp for r in got)


def test_stitch_python_replica_smoke(spark):
    from ocr_wrapper_spark.integrity_queries import (
        OVERLAP_K,
        STITCH_MAX_DF,
        STITCH_MIN_TOKENS,
        STITCH_MOD,
        STITCH_OFF1,
        STITCH_OFF2,
        STITCH_RES,
        doc_pagination_stitch,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    corpus = [(int(r.doc_id), r.text) for r in docs.itertuples()]
    for doc_id, text in list(corpus):
        tk = text.split(" ")
        n = len(tk)
        if doc_id % STITCH_MOD == STITCH_RES and n >= STITCH_MIN_TOKENS:
            m = n // 2
            corpus.append((doc_id + STITCH_OFF1, " ".join(tk[:m])))
            corpus.append((doc_id + STITCH_OFF2, " ".join(tk[m - OVERLAP_K :])))
    tails, heads = {}, {}
    for doc_id, text in corpus:
        tk = text.split(" ")
        if len(tk) < OVERLAP_K:
            continue
        tails.setdefault(
            hashlib.md5(" ".join(tk[-OVERLAP_K:]).encode()).hexdigest(), []
        ).append(doc_id)
        heads.setdefault(
            hashlib.md5(" ".join(tk[:OVERLAP_K]).encode()).hexdigest(), []
        ).append(doc_id)
    expect = set()
    for fp, prevs in tails.items():
        nexts = heads.get(fp, [])
        if len(prevs) > STITCH_MAX_DF or len(nexts) > STITCH_MAX_DF:
            continue
        for p in prevs:
            for q in nexts:
                if p != q:
                    expect.add((p, q, fp))
    got = {
        (r.prev_id, r.next_id, r.overlap_fp)
        for r in doc_pagination_stitch(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect  # planted pairs exist on smoke


# ---------------------------------------------------------------------------
# sliding-window streaming
# ---------------------------------------------------------------------------


def test_sliding_windows_double_assignment(spark, tmp_path):
    """Each event must land in exactly two overlapping windows: its own
    5-min bucket's window and the one starting 5 min earlier."""
    from ocr_wrapper_spark.pipeline_queries import streaming_sliding_windows

    ts = pd.to_datetime(
        ["2024-03-07 13:37:22", "2024-03-07 13:41:00", "2024-03-07 00:00:00"]
    )
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": ts,
            "user_id": [10, 10, 11],
            "event_type": ["view", "view", "click"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't read NANOS parquet
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = streaming_sliding_windows(spark, str(tmp_path)).collect()
    assert sum(r.n_events for r in rows) == 2 * len(pdf)
    starts = {(r.window_start, r.event_type): r.n_events for r in rows}
    # 13:37:22 -> windows starting 13:30 and 13:35; 13:41 -> 13:35, 13:40
    assert starts[("2024-03-07 13:35:00", "view")] == 2  # both view events
    assert starts[("2024-03-07 13:30:00", "view")] == 1
    assert starts[("2024-03-07 13:40:00", "view")] == 1
    assert starts[("2024-03-07 00:00:00", "click")] == 1
    assert starts[("2024-03-06 23:55:00", "click")] == 1


# ---------------------------------------------------------------------------
# max-min fair crawl budget (water filling)
# ---------------------------------------------------------------------------


def _water_level_brute(demands, budget):
    """Brute-force max t with sum(min(d, t)) <= budget."""
    t = 0
    while sum(min(d, t + 1) for d in demands) <= budget:
        t += 1
    return t


def test_fair_share_replica_smoke(spark):
    from ocr_wrapper_spark.integrity_queries import (
        CRAWL_BUDGET_DIV,
        host_fair_share_alloc,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id"])
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    demand = pd.Series(hosts).value_counts().to_dict()
    total = sum(demand.values())
    budget = total // CRAWL_BUDGET_DIV
    t = _water_level_brute(list(demand.values()), budget)
    rows = host_fair_share_alloc(spark, SF_SMOKE).collect()
    got = {r.host: r for r in rows}
    assert len(got) == len(demand)
    for h, d in demand.items():
        r = got[f"host{h:02d}.example.com"]
        assert (r.demand, r.alloc, r.saturated) == (d, min(d, t), d > t)
        assert r.water_level == t
    assert sum(r.alloc for r in rows) + rows[0].leftover_slots == budget
    # maximality: one more unit of water would blow the budget
    assert sum(min(d, t + 1) for d in demand.values()) > budget
    # the Zipf head must actually be capped for the allocation to mean anything
    assert any(r.saturated for r in rows) and any(not r.saturated for r in rows)


def test_fair_share_planted_demands(spark, tmp_path):
    """Demands ~[1, 5, 10] across three real hosts, budget 16//5 = 3:
    water level 1, allocs [1, 1, 1], leftover 0 — checked against the
    brute-force level."""
    import itertools

    from ocr_wrapper_spark.integrity_queries import host_fair_share_alloc
    from ocr_wrapper_spark.sources.pages import host_for_doc

    by_host = {}
    for i in itertools.count():
        h = int(host_for_doc(np.array([i], dtype=np.int64))[0])
        by_host.setdefault(h, []).append(i)
        if len(by_host) >= 3 and sorted(len(v) for v in by_host.values())[-3:] >= [1, 5, 10]:
            hs = sorted(by_host, key=lambda h: len(by_host[h]), reverse=True)[:3]
            if len(by_host[hs[0]]) >= 10 and len(by_host[hs[1]]) >= 5:
                break
    a, b, c = hs[2], hs[1], hs[0]
    ids = by_host[a][:1] + by_host[b][:5] + by_host[c][:10]
    sf = _write_docs(tmp_path, [(i, f"t{i}") for i in ids])
    rows = host_fair_share_alloc(spark, sf).collect()
    demands = {r.host: r.demand for r in rows}
    assert sorted(demands.values()) == [1, 5, 10]
    t = _water_level_brute([1, 5, 10], 16 // 5)
    assert t == 1
    for r in rows:
        assert r.water_level == 1
        assert r.alloc == min(r.demand, 1)
        assert r.saturated == (r.demand > 1)
        assert r.leftover_slots == 0
