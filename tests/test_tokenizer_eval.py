"""Session-9 query guarantees: char_coverage_alphabet against a
pure-python replica (including the kept=False tail and the exact
coverage boundary), bpe_encode_lengths against a greedy-BPE encoder
replica built on test_bpe_canonical's verified merge learner, and
dedup_minhash_eval's bucket/recall invariants against the two queries
it grades.
"""

from __future__ import annotations

from collections import Counter

from test_bpe_canonical import (
    _TEXTS,
    _apply_merge,
    _python_bpe,
    _word_freqs,
    _write_docs,
)


# ---------------------------------------------------------------------------
# char_coverage_alphabet
# ---------------------------------------------------------------------------


def _python_coverage(texts, num, den):
    chars = Counter()
    for w, f in _word_freqs(texts).items():
        for ch in w:
            chars[ch] += f
    total = sum(chars.values())
    ranked = sorted(chars.items(), key=lambda kv: (-kv[1], kv[0]))
    out, cum = [], 0
    for rank, (ch, cnt) in enumerate(ranked, start=1):
        kept = cum * den < num * total
        cum += cnt
        out.append((ch, cnt, rank, cum, total, kept))
    return sorted(out)


# Zipf-ish alphabet with a genuine sub-coverage tail: 'z' and 'y' sit
# past the 0.9995 bar (tail mass 40/40000 = 0.1%), unlike the main
# testdata where every char clears it.
_COVERAGE_TEXTS = {
    0: " ".join(["aaaaaaaaaa"] * 2200),  # 22,000 a
    1: " ".join(["bbbbbbbbbb"] * 1400),  # 14,000 b
    2: " ".join(["cccc"] * 990),  # 3,960 c  -> head = 39,960 = 99.9%
    3: " ".join(["zy"] * 20),  # 20 z + 20 y: the 0.1% tail
}


def test_char_coverage_matches_pure_python_with_tail(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _COVERAGE_TEXTS)
    got = sorted(
        (r.ch, r.char_count, r.rank, r.cum_count, r.total_count, r.kept)
        for r in cq.char_coverage_alphabet(spark, sf_dir).collect()
    )
    want = _python_coverage(
        _COVERAGE_TEXTS, cq.CHAR_COVERAGE_NUM, cq.CHAR_COVERAGE_DEN
    )
    assert got == want
    kept = {ch for ch, _, _, _, _, k in got if k}
    dropped = {ch for ch, _, _, _, _, k in got if not k}
    # the boundary char: cum BEFORE y (rank 4, ties broken y<z) is
    # 39,960/40,000 = 0.999 < 0.9995, so y is kept; before z it is
    # 39,980/40,000 = 0.9995 which is NOT < 0.9995 — z is the tail
    assert kept == {"a", "b", "c", "y"}
    assert dropped == {"z"}


def test_char_coverage_counts_weighted_by_word_freq(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    rows = {r.ch: r for r in cq.char_coverage_alphabet(spark, sf_dir).collect()}
    # 'aaaa' appears 11 times corpus-wide (8 + 3 in doc 0? no: doc 0 has
    # 8 copies, so freq('aaaa') = 8) -> 32 a's from it, plus a's from
    # banana/bandana/abcabc/ab... — replicate exactly
    want = Counter()
    for w, f in _word_freqs(_TEXTS).items():
        for ch in w:
            want[ch] += f
    assert {ch: r.char_count for ch, r in rows.items()} == dict(want)
    # the delimiter-poisoned word contributed nothing
    assert "\x01" not in rows
    total = sum(want.values())
    assert all(r.total_count == total for r in rows.values())


# ---------------------------------------------------------------------------
# bpe_encode_lengths
# ---------------------------------------------------------------------------


def _python_encode(texts, n_merges):
    merges = [(l, r) for _, l, r, _ in _python_bpe(texts, n_merges)]
    out = []
    for doc_id, t in sorted(texts.items()):
        words = [w for w in t.split(" ") if w and "\x01" not in w]
        n_chars = sum(len(w) for w in words)
        n_tokens = 0
        for w in words:
            sym = tuple(w)
            for l, r in merges:
                sym = _apply_merge(sym, l, r)
            n_tokens += len(sym)
        tok_per_kchar = n_tokens * 1000 // n_chars if n_chars > 0 else 0
        out.append((doc_id, len(words), n_chars, n_tokens, tok_per_kchar))
    return out


def test_bpe_encode_lengths_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    got = sorted(
        (r.doc_id, r.n_words, r.n_chars, r.n_tokens, r.tok_per_kchar)
        for r in cq.bpe_encode_lengths(spark, sf_dir).collect()
    )
    want = _python_encode(_TEXTS, cq.BPE_MERGES)
    assert got == want
    by_id = {r[0]: r for r in got}
    # empty doc: present with all-zero counts (no join dropped it)
    assert by_id[2] == (2, 0, 0, 0, 0)
    # the delimiter-poisoned word is excluded exactly as in training:
    # doc 4 counts only 'keepme' (6 chars), not 'ab\x01cd'
    assert by_id[4][2] == 6
    # doc 0 ('aaaa' x8): (a,a) is merge 1, so each word is (aa, aa)
    # under greedy left-to-right — 2 tokens per word unless a later
    # merge fuses (aa, aa); either way tokens < chars proves merges ran
    assert by_id[0][3] < by_id[0][2]


def test_bpe_encode_degenerate_corpus_is_merge_noop(spark, tmp_path):
    """A corpus of single-symbol words learns ZERO merges; the encode
    must degrade to n_tokens == n_chars (missing merges are no-ops),
    not throw INVALID_ARRAY_INDEX (ANSI element_at) or drop every row
    (a cross join against the empty merge table)."""
    from ocr_wrapper_spark import curation_queries as cq

    texts = {0: "x q x", 1: "a b a", 2: ""}
    sf_dir = _write_docs(spark, tmp_path, texts)
    assert cq.bpe_learn_merges(spark, sf_dir).count() == 0
    got = sorted(
        (r.doc_id, r.n_words, r.n_chars, r.n_tokens)
        for r in cq.bpe_encode_lengths(spark, sf_dir).collect()
    )
    assert got == [(0, 3, 3, 3), (1, 3, 3, 3), (2, 0, 0, 0)]
    assert got == [t[:4] for t in _python_encode(texts, cq.BPE_MERGES)]


def test_bpe_encode_plan_is_broadcast_only_on_documents(spark, tmp_path):
    """The encode stage must not shuffle the corpus: the merges arrive
    as a 1-row broadcast (BroadcastNestedLoopJoin) and the token count
    is a narrow map over the scan."""
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    plan = (
        cq.bpe_encode_lengths(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# dedup_minhash_eval
# ---------------------------------------------------------------------------


def test_minhash_eval_grades_the_queries_it_reuses(spark):
    """At sf0.001: every bucket's candidate count is bounded by its pair
    count (candidates within a bucket ARE hits), the candidate total
    equals the LSH query's pair count, and the universe matches the
    exact-Jaccard join's pair count at the >=0.8 buckets."""
    from ocr_wrapper_spark import curation_queries as cq
    from ocr_wrapper_spark import text_queries as tq

    sf_dir = "/root/testdata/sf0.001"
    rows = {r.jacc_bucket: r for r in cq.dedup_minhash_eval(spark, sf_dir).collect()}
    assert rows, "eval produced no buckets"
    for b, r in rows.items():
        if b >= 0:
            assert r.n_candidates <= r.n_pairs, (b, r)
            if r.n_pairs > 0:
                assert r.recall_ppm == r.n_candidates * 1_000_000 // r.n_pairs
        else:
            assert r.n_pairs == 0 and r.recall_ppm == 0
    n_lsh = tq.dedup_minhash_lsh(spark, sf_dir).count()
    assert sum(r.n_candidates for r in rows.values()) == n_lsh
    # pairs at exact Jaccard >= 0.8 are exactly the dedup_ngram_jaccard
    # output; they live in buckets 8..10 of the universe
    n_exact = tq.dedup_ngram_jaccard(spark, sf_dir).count()
    assert sum(r.n_pairs for b, r in rows.items() if b >= 8) == n_exact


def test_minhash_eval_planted_midrange_pair(spark, tmp_path):
    """A crafted corpus with a mid-Jaccard pair and an exact-dup pair:
    the exact duplicates land in bucket 10 (jaccard exactly 1e6) and
    must be LSH candidates; the mid-range pair lands in its exact
    decile with n_candidates <= n_pairs."""
    from ocr_wrapper_spark import curation_queries as cq

    base = [f"w{i}" for i in range(40)]
    half = base[:22] + [f"u{i}" for i in range(18)]  # ~38% shingle overlap
    texts = {
        0: " ".join(base),
        1: " ".join(base),  # exact dup of 0
        2: " ".join(half),
        3: "completely different tokens here nothing shared at all",
    }
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = {r.jacc_bucket: r for r in cq.dedup_minhash_eval(spark, sf_dir).collect()}
    assert 10 in rows and rows[10].n_pairs == 1
    assert rows[10].n_candidates == 1 and rows[10].recall_ppm == 1_000_000
    mid = [b for b in rows if 1 <= b <= 8]
    assert mid, f"expected a mid-range bucket, got {sorted(rows)}"
    for b in mid:
        assert rows[b].n_candidates <= rows[b].n_pairs
