"""Session-8 query guarantees, part 2: the BPE tokenizer-training pair
(bpe_pair_counts, bpe_learn_merges) against a pure-python greedy-BPE
replica on a crafted corpus — including the adjacent-repeat case the
doubled-delimiter encoding exists for — and dedup_canonical_selection's
one-canonical-per-cluster / argmax invariants, plus the scale-shape
plan assertions.
"""

from __future__ import annotations

from collections import Counter


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


# ---------------------------------------------------------------------------
# pure-python greedy BPE replica
# ---------------------------------------------------------------------------


def _word_freqs(texts):
    words = Counter()
    for t in texts.values():
        for w in t.split(" "):
            if w and "\x01" not in w:
                words[w] += 1
    return words


def _pair_counts(reps):
    pairs = Counter()
    for sym, f in reps:
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += f
    return pairs


def _apply_merge(sym, left, right):
    """Greedy left-to-right non-overlapping merge — the semantics the
    engine's doubled-delimiter string replace must reproduce."""
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _python_bpe(texts, n_merges):
    reps = [(tuple(w), f) for w, f in sorted(_word_freqs(texts).items())]
    learned = []
    for it in range(1, n_merges + 1):
        pairs = _pair_counts(reps)
        if not pairs:  # degenerate corpus: fewer learnable merges
            break
        (left, right), cnt = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        learned.append((it, left, right, cnt))
        reps = [(_apply_merge(s, left, right), f) for s, f in reps]
    return learned


# ---------------------------------------------------------------------------
# crafted corpus: adjacent repeats, delimiter-poisoned word, ties,
# multi-char symbols feeding later iterations
# ---------------------------------------------------------------------------

_TEXTS = {
    0: "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",  # (a,a) dominates; greedy
    1: "banana bandana banana",  # left-to-right on repeats
    2: "",  # empty doc dropped
    3: "x q x",  # single-char words: no pairs
    4: "ab\x01cd keepme",  # delimiter word dropped entirely
    5: "abcabc abcabc abcabc abcabc abcabc abcabc",  # multi-char merge chain
}


def test_bpe_pair_counts_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    got = sorted(
        (r.left_sym, r.right_sym, r.pair_count, r.rank)
        for r in cq.bpe_pair_counts(spark, sf_dir).collect()
    )
    pairs = _pair_counts(
        (tuple(w), f) for w, f in _word_freqs(_TEXTS).items()
    )
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    want = sorted(
        (l, r, c, i + 1)
        for i, ((l, r), c) in enumerate(ranked[: cq.BPE_TOP_PAIRS])
    )
    assert got == want
    syms = {(l, r) for l, r, _, _ in got}
    # the \x01-poisoned word contributed nothing: 'cd' appears nowhere else
    assert ("c", "d") not in syms
    # adjacent-repeat counting: 'aaaa' x8 contributes 3 pairs per word
    by_pair = {(l, r): c for l, r, c, _ in got}
    assert by_pair[("a", "a")] == 24


def test_bpe_learn_merges_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    got = sorted(
        (r.iteration, r.left_sym, r.right_sym, r.pair_count)
        for r in cq.bpe_learn_merges(spark, sf_dir).collect()
    )
    want = _python_bpe(_TEXTS, cq.BPE_MERGES)
    assert got == want
    # iteration 1 is the adjacent-repeat merge: greedy left-to-right on
    # 'aaaa' consumes pairs non-overlapping (24 across the corpus)
    assert got[0] == (1, "a", "a", 24)
    # a later iteration works over MERGED (multi-char) symbols — the
    # part a single-char substr count cannot express
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[1:])


def test_bpe_merge_replace_is_greedy_left_to_right(spark, tmp_path):
    """The doubled-delimiter encoding's whole point: 'aaaa' under an
    (a,a) merge must become (aa, aa) — a single-delimiter encoding
    would miss the second occurrence because replace() consumed its
    boundary character."""
    from ocr_wrapper_spark import curation_queries as cq

    texts = {0: "aaaa aaaa aaaa"}
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = sorted(
        (r.iteration, r.left_sym, r.right_sym, r.pair_count)
        for r in cq.bpe_learn_merges(spark, sf_dir).collect()
    )
    # it1: (a,a) 9 pairs; after greedy merge every word is (aa, aa):
    # it2 must see exactly 3 (aa, aa) pairs — 6 would mean overlap leak
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "aa", 3)
    # and after merging (aa,aa) every word is the single symbol 'aaaa':
    # no pairs remain, so iteration 3 (if configured) has no row
    if cq.BPE_MERGES >= 3:
        assert len(got) == 2


def test_bpe_pair_counts_plan_has_group_limit(spark):
    from ocr_wrapper_spark.curation_queries import bpe_pair_counts

    plan = (
        bpe_pair_counts(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the constant-key window turns on the per-partition top-50 cut
    # before the single-partition exchange (corpus_vocabulary idiom)
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


def test_bpe_learn_merges_plan_is_python_free(spark):
    from ocr_wrapper_spark.curation_queries import bpe_learn_merges

    plan = (
        bpe_learn_merges(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # every iteration's argmax rides the group-limit idiom too
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# dedup_canonical_selection
# ---------------------------------------------------------------------------


def test_dedup_canonical_selection_invariants(spark):
    from ocr_wrapper_spark import curation_queries as cq
    from ocr_wrapper_spark import text_queries as tq

    sf_dir = "/root/testdata/sf0.001"
    rows = cq.dedup_canonical_selection(spark, sf_dir).collect()
    assert rows
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        # membership count is consistent on every row
        assert all(r.n_members == len(members) for r in members)
        canons = [r for r in members if r.is_canonical]
        assert len(canons) == 1, f"component {comp}: exactly one canonical"
        # the canonical is the (score desc, doc_id asc) argmax
        best = sorted(members, key=lambda r: (-r.score_ppm, r.doc_id))[0]
        assert canons[0].doc_id == best.doc_id
    # membership is exactly dedup_clusters' output
    clusters = {
        (r.node, r.component)
        for r in tq.dedup_clusters(spark, sf_dir).collect()
    }
    assert {(r.doc_id, r.component) for r in rows} == clusters


def test_dedup_canonical_selection_plan_windows_on_component(spark):
    from ocr_wrapper_spark.curation_queries import dedup_canonical_selection

    plan = (
        dedup_canonical_selection(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rank window is partitioned (by component) — never global
    assert "Window" in plan
    assert "No Partition Defined" not in plan
    assert "BatchEvalPython" not in plan
