"""Block-postings varint budget: python-replica exactness, LEB128
length formula, block-bounded window plan (text_queries
postings_varint_budget)."""

from __future__ import annotations

import re
from collections import defaultdict

import duckdb

from ocr_wrapper_spark.text_queries import POSTINGS_BLOCK, postings_varint_budget

SF_SMOKE = "/root/testdata/sf0.001"


def _leb128_len(x: int) -> int:
    """Actual LEB128 encoded length — the ground truth the
    (length(bin(x)) + 6) div 7 formula must reproduce."""
    n = 1
    while x >= 0x80:
        x >>= 7
        n += 1
    return n


def _formula_len(x: int) -> int:
    return (len(bin(x)) - 2 + 6) // 7 if x > 0 else 1


def test_varint_length_formula_matches_real_encoding():
    edges = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**62 - 1]
    for x in edges + list(range(1, 300)):
        assert _formula_len(x) == _leb128_len(x), x


def _python_budget(sf_dir: str) -> dict[str, tuple[int, int, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' WHERE text <> ''"
    ).fetchall()
    postings: dict[str, set[int]] = defaultdict(set)
    for doc_id, text in rows:
        for term in text.split(" "):
            postings[term].add(doc_id)
    out = {}
    for term, ids in postings.items():
        blocks: dict[int, list[int]] = defaultdict(list)
        for i in sorted(ids):
            blocks[i // POSTINGS_BLOCK].append(i)
        nbytes = 0
        for ids_b in blocks.values():
            nbytes += _formula_len(ids_b[0])
            nbytes += sum(_formula_len(b - a) for a, b in zip(ids_b, ids_b[1:]))
        out[term] = (len(ids), len(blocks), nbytes)
    return out


def test_budget_matches_python_replica(spark):
    expect = _python_budget(SF_SMOKE)
    rows = postings_varint_budget(spark, SF_SMOKE).collect()
    assert len(rows) == len(expect)
    for r in rows:
        df, n_blocks, nbytes = expect[r.term]
        assert (r.df, r.n_blocks, r.varint_bytes) == (df, n_blocks, nbytes), r.term
        assert r.raw_bytes == 8 * df
        assert r.saving_ppm == (8 * df - nbytes) * 10**6 // (8 * df)
        # deltas must genuinely compress vs raw 8-byte ids on this corpus
        assert r.varint_bytes < r.raw_bytes


def test_gap_window_partitions_on_block_not_term(spark):
    """The skew guarantee: the delta window's exchange must carry
    (term, block) — a term-only partition would serialize a stopword's
    whole posting list into one task."""
    df = postings_varint_budget(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(term#\d+L?, block#\d+", plan), plan


# ---------------------------------------------------------------------------
# Block-Max WAND upper bounds
# ---------------------------------------------------------------------------


def _python_block_max(sf_dir: str):
    """Independent per-(term, block) impact maxima: exact-int replica of
    the BM25 rational form with python floats (same IEEE ops)."""
    import math

    from ocr_wrapper_spark.text_queries import _BM25_VOCAB, POSTINGS_BLOCK

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' WHERE text <> ''"
    ).fetchall()
    n_docs = len(rows)
    t_tokens = sum(len(t.split(" ")) for _, t in rows)
    tf: dict[tuple[str, int], int] = {}
    dl: dict[int, int] = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        dl[doc_id] = len(toks)
        for t in toks:
            if t in _BM25_VOCAB:
                tf[(t, doc_id)] = tf.get((t, doc_id), 0) + 1
    df: dict[str, int] = {}
    for (t, _), _c in tf.items():
        df[t] = df.get(t, 0) + 1
    out: dict[tuple[str, int], list[int]] = {}
    for (t, doc_id), f in tf.items():
        idf = math.floor(n_docs * 1000000.0 / df[t])
        score = math.floor(
            float(idf) * (f * 22.0 * t_tokens)
            / (f * 10.0 * t_tokens + 3.0 * t_tokens + 9.0 * dl[doc_id] * n_docs)
        )
        key = (t, doc_id // POSTINGS_BLOCK)
        out.setdefault(key, []).append(int(score))
    blocks = {k: (len(v), max(v)) for k, v in out.items()}
    ub = {}
    for (t, _), (_n, mx) in blocks.items():
        ub[t] = max(ub.get(t, 0), mx)
    return blocks, ub


def test_wand_block_max_replica_and_bound_invariants(spark):
    from ocr_wrapper_spark.text_queries import wand_block_max

    blocks, ub = _python_block_max(SF_SMOKE)
    got = wand_block_max(spark, SF_SMOKE).collect()
    assert {(r.term, r.block_id) for r in got} == set(blocks)
    per_term_tight = set()
    for r in got:
        n, mx = blocks[(r.term, r.block_id)]
        assert (r.n_docs, r.block_max_ppm) == (n, mx)
        assert r.term_ub_ppm == ub[r.term]
        assert r.block_max_ppm <= r.term_ub_ppm
        assert r.ub_gap_ppm == r.block_max_ppm * 1_000_000 // max(r.term_ub_ppm, 1)
        assert 0 <= r.ub_gap_ppm <= 1_000_000
        if r.ub_gap_ppm == 1_000_000:
            per_term_tight.add(r.term)
    # every term's bound is achieved by at least one block (max is tight)
    assert per_term_tight == set(ub)


def test_wand_term_bound_has_no_window(spark):
    """The per-term upper bound must come from a map-side max + broadcast
    join, never a per-term window over the block table (a hot term's
    blocks would pile into one rank task)."""
    from ocr_wrapper_spark.text_queries import wand_block_max

    plan = (
        wand_block_max(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
