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
