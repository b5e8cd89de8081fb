"""Archive-ops family tests: syndication linkage (edit distance +
blocking + hot-block cut), CDX revisit-interval compression, host
concentration monitor, shard-manifest set-digest diff, host mirror
pairs. Each query gets an independent python replica built from the
parquet bytes (never from the query's own SQL), plus planted-corpus
semantics tests on temp directories."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)
    return str(tmp_path)


def _read_docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _fp_md5(text: str) -> str:
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip()).lower()
    return hashlib.md5(norm.encode()).hexdigest()


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# headline syndication linkage
# ---------------------------------------------------------------------------


def test_syndication_planted_pairs_and_ascii_strip(spark, tmp_path):
    """Planted blocks: a near-dup pair, a far pair in the same block, an
    isolated block, and a non-ASCII head whose stripped distance must
    match the char-level python replica (the byte-vs-char levenshtein
    divergence the explicit ASCII projection exists to remove)."""
    from ocr_wrapper_spark.archive_queries import (
        LINK_MAX_DIST,
        headline_syndication_pairs,
    )

    texts = {
        0: "alpha beta gamma delta one two three four tail tail",
        1: "alpha beta gamma delta one two three nine tail tail",
        2: "alpha beta gamma qqqqq wwwww eeeee rrrrr ttttt tail",
        3: "zeta eta theta iota kappa lambda mu nu xi omicron",
        4: "alpha beta gamma délta one two three four tail tail",
    }
    sf = _write_docs(tmp_path, sorted(texts.items()))
    rows = {
        (r.id_a, r.id_b): r
        for r in headline_syndication_pairs(spark, sf).collect()
    }

    def head(i):
        h = " ".join(texts[i].split(" ")[:8])
        return re.sub(r"[^\x20-\x7e]", "", h)

    expect_pairs = {(a, b) for a in (0, 1, 2, 4) for b in (0, 1, 2, 4) if a < b}
    assert set(rows) == expect_pairs  # doc 3's block is isolated
    for (a, b), r in rows.items():
        want = _lev(head(a), head(b))
        assert r.edit_dist == want, (a, b, r.edit_dist, want)
        assert r.linked == (want <= LINK_MAX_DIST)
    # the accent-stripped pair is 1 edit from its ASCII twin
    assert rows[(0, 4)].edit_dist == 1 and rows[(0, 4)].linked


def test_syndication_hot_block_cut(spark, tmp_path):
    """Blocks larger than LINK_MAX_BLOCK contribute NO pairs (the
    fanout guard); a small block in the same corpus still links."""
    from ocr_wrapper_spark.archive_queries import (
        LINK_MAX_BLOCK,
        headline_syndication_pairs,
    )

    rows = [(i, f"hot hot hot filler{i} a b c d") for i in range(LINK_MAX_BLOCK + 2)]
    rows += [(900, "cold cold cold one two three four five"),
             (901, "cold cold cold one two three four six")]
    sf = _write_docs(tmp_path, rows)
    got = headline_syndication_pairs(spark, sf).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(900, 901)}


def test_syndication_replica_smoke(spark):
    """Full-row replica on the smoke corpus: blocking, cap, distance,
    verdict recomputed in python from the parquet bytes."""
    from ocr_wrapper_spark.archive_queries import (
        LINK_BLOCK_T,
        LINK_HEAD_T,
        LINK_MAX_BLOCK,
        LINK_MAX_DIST,
        headline_syndication_pairs,
    )

    docs = _read_docs(SF_SMOKE)
    docs = docs[docs.text != ""]
    blocks: dict[str, list[tuple[int, str]]] = {}
    for doc_id, text in docs.itertuples(index=False):
        tk = text.split(" ")
        bk = hashlib.md5(" ".join(tk[:LINK_BLOCK_T]).encode()).hexdigest()
        head = re.sub(r"[^\x20-\x7e]", "", " ".join(tk[:LINK_HEAD_T]))
        blocks.setdefault(bk, []).append((int(doc_id), head))
    want = {}
    for members in blocks.values():
        if len(members) > LINK_MAX_BLOCK:
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, ha), (ib, hb) = members[i], members[j]
                d = _lev(ha, hb)
                want[(ia, ib)] = (d, d <= LINK_MAX_DIST)
    got = {
        (r.id_a, r.id_b): (r.edit_dist, r.linked)
        for r in headline_syndication_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and want, "replica mismatch (or empty smoke yield)"


# ---------------------------------------------------------------------------
# capture revisit intervals
# ---------------------------------------------------------------------------


def _revisit_replica(sf_dir: str):
    from ocr_wrapper_spark.archive_queries import REVISIT_CAPTURES as CAPS

    docs = _read_docs(sf_dir)
    fp = {int(i): _fp_md5(t) for i, t in docs.itertuples(index=False)}
    out = {}
    for doc_id in sorted(fp):
        u, i = doc_id // CAPS, doc_id % CAPS
        src = u * CAPS + min(i, u % CAPS)
        digest = fp[src]
        key = (u, digest)
        runs = out.setdefault(u, [])
        if runs and runs[-1][0] == digest:
            runs[-1][2] = i
            runs[-1][3] += 1
        else:
            runs.append([digest, i, i, 1])
    rows = set()
    for u, runs in out.items():
        for seq, (digest, first, last, n) in enumerate(runs, 1):
            rows.add((u, seq, digest, first, last, n, n > 1))
    return rows


def test_revisit_intervals_replica_smoke(spark):
    from ocr_wrapper_spark.archive_queries import capture_revisit_intervals

    got = {
        (
            r.url_key,
            r.version_seq,
            r.digest,
            r.first_capture,
            r.last_capture,
            r.n_captures,
            r.has_revisits,
        )
        for r in capture_revisit_intervals(spark, SF_SMOKE).collect()
    }
    want = _revisit_replica(SF_SMOKE)
    assert got == want and any(r[6] for r in want), (
        "replica mismatch, or no multi-capture interval in the smoke corpus"
    )


def test_revisit_frozen_and_changing_urls(spark, tmp_path):
    """url 0 (freeze point 0) collapses to ONE interval covering all
    captures; url 1 (freeze point 1) changes once then freezes."""
    from ocr_wrapper_spark.archive_queries import (
        REVISIT_CAPTURES as CAPS,
        capture_revisit_intervals,
    )

    rows = [(i, f"unique text number {i} pad pad") for i in range(2 * CAPS)]
    sf = _write_docs(tmp_path, rows)
    got = sorted(
        (r.url_key, r.version_seq, r.first_capture, r.last_capture, r.n_captures)
        for r in capture_revisit_intervals(spark, sf).collect()
    )
    assert got == [
        (0, 1, 0, CAPS - 1, CAPS),
        (1, 1, 0, 0, 1),
        (1, 2, 1, CAPS - 1, CAPS - 1),
    ]


def test_revisit_window_is_url_partitioned(spark):
    from ocr_wrapper_spark.archive_queries import capture_revisit_intervals

    plan = (
        capture_revisit_intervals(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(url_key" in plan


# ---------------------------------------------------------------------------
# host concentration profile
# ---------------------------------------------------------------------------


def test_concentration_profile_exact_replica(spark):
    """Gini/HHI/top-share recomputed with exact python ints from the
    parquet doc_ids + the generator's own host mapping."""
    from ocr_wrapper_spark.archive_queries import host_concentration_profile
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = _read_docs(SF_SMOKE)
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    _, counts = np.unique(hosts, return_counts=True)
    xs = sorted(int(c) for c in counts)
    n, s = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, 1))
    want = {
        "n_hosts": n,
        "n_docs": s,
        "top1_share_ppm": max(xs) * 1_000_000 // s,
        "hhi_ppm": sum(x * x for x in xs) * 1_000_000 // (s * s),
        "gini_ppm": (2 * s1 - (n + 1) * s) * 1_000_000 // (n * s),
    }
    [r] = host_concentration_profile(spark, SF_SMOKE).collect()
    assert r.asDict() == want
    assert 0 <= r.gini_ppm < 1_000_000 and 0 < r.hhi_ppm <= 1_000_000


# ---------------------------------------------------------------------------
# shard manifest diff
# ---------------------------------------------------------------------------


def _fp60(text: str) -> int:
    return int(_fp_md5(text)[:15], 16)


def test_shard_diff_replica_smoke(spark):
    from ocr_wrapper_spark.archive_queries import (
        DIFF_ADD_MOD,
        DIFF_ADD_REM,
        DIFF_DEL_MOD,
        DIFF_DEL_REM,
        DIFF_SHARDS,
        shard_manifest_diff,
    )

    docs = _read_docs(SF_SMOKE)
    v1: dict[int, list[int]] = {}
    v2: dict[int, list[int]] = {}
    for doc_id, text in docs.itertuples(index=False):
        f = _fp60(text)
        if int(doc_id) % DIFF_ADD_MOD != DIFF_ADD_REM:
            v1.setdefault(f % DIFF_SHARDS, []).append(f)
        if int(doc_id) % DIFF_DEL_MOD != DIFF_DEL_REM:
            v2.setdefault(f % DIFF_SHARDS, []).append(f)

    def digest(fs):
        x = 0
        for f in fs:
            x ^= f
        return x

    want = set()
    for sid in sorted(set(v1) | set(v2)):
        f1, f2 = v1.get(sid), v2.get(sid)
        if f1 is None:
            status = "added"
        elif f2 is None:
            status = "removed"
        elif len(f1) == len(f2) and digest(f1) == digest(f2):
            status = "unchanged"
        else:
            status = "changed"
        want.add(
            (
                sid,
                len(f1 or []),
                len(f2 or []),
                digest(f1 or []),
                digest(f2 or []),
                status,
            )
        )
    got = {
        (r.shard_id, r.n_v1, r.n_v2, r.digest_v1, r.digest_v2, r.status)
        for r in shard_manifest_diff(spark, SF_SMOKE).collect()
    }
    assert got == want
    statuses = {r[5] for r in want}
    assert "changed" in statuses and "unchanged" in statuses


def test_shard_diff_digest_is_order_free(spark):
    """Same rows at different partitioning produce the identical
    digests — XOR set-hash is associative/commutative, so a resumed
    writer re-creates the manifest byte-for-byte."""
    from ocr_wrapper_spark.archive_queries import shard_manifest_diff

    base = {
        (r.shard_id, r.digest_v1, r.digest_v2)
        for r in shard_manifest_diff(spark, SF_SMOKE).collect()
    }
    one = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        again = {
            (r.shard_id, r.digest_v1, r.digest_v2)
            for r in shard_manifest_diff(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", one)
    assert base == again


# ---------------------------------------------------------------------------
# host mirror pairs
# ---------------------------------------------------------------------------


def test_mirror_pairs_replica_smoke(spark):
    from ocr_wrapper_spark.archive_queries import (
        MIRROR_MAX_HOSTS,
        MIRROR_PARA_WORDS,
        MIRROR_PPM,
        host_mirror_pairs,
    )
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = _read_docs(SF_SMOKE)
    docs = docs[docs.text != ""]
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    host_paras: dict[int, set[str]] = {}
    fp_hosts: dict[str, set[int]] = {}
    for h, text in zip(hosts, docs.text):
        tk = text.split(" ")
        for s in range(0, len(tk), MIRROR_PARA_WORDS):
            fp = hashlib.md5(
                " ".join(tk[s : s + MIRROR_PARA_WORDS]).encode()
            ).hexdigest()
            host_paras.setdefault(int(h), set()).add(fp)
            fp_hosts.setdefault(fp, set()).add(int(h))
    hot = {fp for fp, hs in fp_hosts.items() if len(hs) > MIRROR_MAX_HOSTS}
    kept = {h: ps - hot for h, ps in host_paras.items()}
    want = {}
    hs = sorted(kept)
    for i, ha in enumerate(hs):
        for hb in hs[i + 1 :]:
            ni = len(kept[ha] & kept[hb])
            if ni == 0:
                continue
            na, nb = len(kept[ha]), len(kept[hb])
            ppm = ni * 1_000_000 // (na + nb - ni)
            want[(ha, hb)] = (ni, na, nb, ppm, ppm >= MIRROR_PPM)
    got = {
        (r.host_a, r.host_b): (
            r.n_shared,
            r.n_paras_a,
            r.n_paras_b,
            r.jaccard_ppm,
            r.is_mirror,
        )
        for r in host_mirror_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and want, "replica mismatch (or empty smoke yield)"


# ---------------------------------------------------------------------------
# vocabulary drift
# ---------------------------------------------------------------------------


def test_vocab_drift_replica_smoke(spark):
    from ocr_wrapper_spark.archive_queries import (
        DIFF_ADD_MOD,
        DIFF_ADD_REM,
        DIFF_DEL_MOD,
        DIFF_DEL_REM,
        VOCAB_DRIFT_K,
        vocab_drift,
    )

    docs = _read_docs(SF_SMOKE)
    docs = docs[docs.text != ""]
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for doc_id, text in docs.itertuples(index=False):
        for t in text.split(" "):
            if int(doc_id) % DIFF_ADD_MOD != DIFF_ADD_REM:
                c1[t] = c1.get(t, 0) + 1
            if int(doc_id) % DIFF_DEL_MOD != DIFF_DEL_REM:
                c2[t] = c2.get(t, 0) + 1
    vocab = {
        t
        for t, _ in sorted(c1.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_DRIFT_K
        ]
    }
    v2_tokens = sum(c2.values())
    oov = sum(c for t, c in c2.items() if t not in vocab)
    [r] = vocab_drift(spark, SF_SMOKE).collect()
    assert r.asDict() == {
        "n_vocab": len(vocab),
        "n_terms_v1": len(c1),
        "n_terms_v2": len(c2),
        "n_new_terms": len(set(c2) - set(c1)),
        "n_dropped_terms": len(set(c1) - set(c2)),
        "v2_tokens": v2_tokens,
        "v2_oov_tokens": oov,
        "oov_ppm": oov * 1_000_000 // max(v2_tokens, 1),
    }
    assert 0 < r.oov_ppm < 1_000_000  # the K-term vocab is a real cut


def test_vocab_drift_detects_new_and_dropped_terms(spark, tmp_path):
    """Planted drift: a term that only exists in v2 (its doc is excluded
    from v1) and one that only exists in v1 (excluded from v2)."""
    from ocr_wrapper_spark.archive_queries import (
        DIFF_ADD_MOD,
        DIFF_ADD_REM,
        DIFF_DEL_MOD,
        DIFF_DEL_REM,
        vocab_drift,
    )

    base = [(i, "common words everywhere") for i in range(10)]
    base.append((DIFF_ADD_REM, "common brandnewterm"))  # v2-only doc
    base.append((DIFF_DEL_MOD + DIFF_DEL_REM, "common legacyterm"))  # v1-only doc
    # make ids unique: DIFF_ADD_REM=3 collides with range(10) -> rebuild
    rows = {}
    for i, t in base:
        rows[i] = t
    rows[DIFF_ADD_REM] = "common brandnewterm"
    rows[DIFF_DEL_MOD + DIFF_DEL_REM] = "common legacyterm"
    sf = _write_docs(tmp_path, sorted(rows.items()))
    [r] = vocab_drift(spark, sf).collect()
    assert r.n_new_terms == 1 and r.n_dropped_terms == 1
