"""Session-8 query guarantees: phrase_search (shared-start occurrence
detection, overlap/repeat/boundary semantics), eval_ngram_overlap
(instance-counted contamination ppm, short/empty-doc zeros), and
url_template_traps (the planted session-id trap flags, honest templates
don't) — each against a pure-python replica on a crafted corpus, plus
the scale-shape plan assertions.
"""

from __future__ import annotations


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------


def _python_phrase_search(texts, phrases):
    out = []
    for pid, phrase in phrases:
        words = phrase.split(" ")
        for doc_id, t in sorted(texts.items()):
            if t == "":
                continue
            toks = t.split(" ")
            starts = [
                i + 1  # 1-based, matching the engine's pos convention
                for i in range(len(toks) - len(words) + 1)
                if toks[i : i + len(words)] == words
            ]
            if starts:
                out.append((pid, doc_id, len(starts), starts[0]))
    return sorted(out)


def test_phrase_search_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import text_queries as tq

    texts = {
        0: "table hash table hash table",  # overlapping bigram repeats
        1: "merge order merge order",  # phrase at start AND repeated
        2: "slow hash batch ends here slow hash batch",  # trigram twice
        3: "slow hash nothing",  # partial trigram: slots 0,1 only
        4: "hash table",  # reversed — must NOT match 'table hash'
        5: "",  # empty doc excluded
        6: "x part filter scan",  # trigram mid-doc, 1-based pos = 2
        7: "part filter part filter scan",  # decoy prefix before a hit
    }
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = sorted(
        (r.phrase_id, r.doc_id, r.n_matches, r.first_pos)
        for r in tq.phrase_search(spark, sf_dir).collect()
    )
    assert got == _python_phrase_search(texts, tq.PHRASE_QUERIES)
    by_key = {(p, d): (n, f) for p, d, n, f in got}
    assert by_key[(1, 0)] == (2, 1)  # two 'table hash' occurrences, pos 1
    assert by_key[(3, 2)] == (2, 1)
    assert (3, 3) not in by_key  # partial slot set never completes
    assert (1, 4) not in by_key  # order matters
    assert by_key[(4, 6)] == (1, 2)
    assert by_key[(4, 7)] == (1, 3)  # decoy 'part filter' doesn't shift it


def test_phrase_search_plan_prunes_before_exchange(spark):
    from ocr_wrapper_spark.text_queries import _PHRASE_TERMS, phrase_search

    plan = (
        phrase_search(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phrase table rides a broadcast; the postings stream never SMJs
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the vocabulary filter sits below the first exchange: the generated
    # Filter mentions the phrase terms (isin prunes pre-shuffle)
    assert _PHRASE_TERMS[0] in plan


# ---------------------------------------------------------------------------
# eval_ngram_overlap
# ---------------------------------------------------------------------------


def _python_eval_overlap(texts, k, mod, rem, thresh_ppm):
    def grams(t):
        toks = t.split(" ")
        return [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]

    eval_set = set()
    for d, t in texts.items():
        if d % mod == rem:
            eval_set.update(grams(t))
    out = []
    for d, t in sorted(texts.items()):
        if d % mod == rem:
            continue
        g = grams(t)
        matched = sum(1 for s in g if s in eval_set)
        ppm = matched * 1_000_000 // max(len(g), 1)
        out.append((d, len(g), matched, ppm, 1 if ppm >= thresh_ppm else 0))
    return out


def test_eval_ngram_overlap_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    mod, rem = cq.EVAL_MOD, cq.EVAL_REM
    texts = {
        rem: "a b c d e f",  # eval doc: grams abc bcd cde def
        mod + rem: "z z a b c z z a b c",  # fully planted train grams twice
        0: "a b c",  # exactly one gram, 100% dirty
        1: "c b a",  # reversed — 0 matched
        2: "x y",  # too short: n_grams 0, ppm 0
        5: "",  # empty: n_grams 0 (id 5: never the eval residue)
        4: "q b c d e w",  # bcd cde matched, 2 of 4 -> 500000 ppm
    }
    # exactly two eval docs by residue; nothing else collided
    assert sorted(k for k in texts if k % mod == rem) == [rem, mod + rem]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = sorted(
        (r.doc_id, r.n_grams, r.matched, r.overlap_ppm, r.contaminated)
        for r in cq.eval_ngram_overlap(spark, sf_dir).collect()
    )
    want = _python_eval_overlap(texts, cq.CONTAM_K, mod, rem, cq.CONTAM_PPM)
    assert got == want
    rows = {r[0]: r for r in got}
    assert rows[0] == (0, 1, 1, 1_000_000, 1)
    assert rows[1] == (1, 1, 0, 0, 0)
    assert rows[2] == (2, 0, 0, 0, 0)
    assert rows[5] == (5, 0, 0, 0, 0)
    assert rows[4][3] == 500_000 and rows[4][4] == 1


def test_eval_ngram_overlap_plan_is_join_clean(spark):
    from ocr_wrapper_spark.curation_queries import eval_ngram_overlap

    plan = (
        eval_ngram_overlap(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


# ---------------------------------------------------------------------------
# url_template_traps
# ---------------------------------------------------------------------------


def test_url_template_traps_flags_only_the_session_trap(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    # Enough docs that on EVERY host the session shape (3 URLs/doc)
    # crosses the volume bar AND the calendar shape reaches exactly the
    # bar with unique content — exercising both halves of the AND.
    n = 5 * cq.TRAP_HOSTS * cq.TRAP_MIN_URLS
    texts = {i: f"unique content {i}" for i in range(n)}
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = cq.url_template_traps(spark, sf_dir).collect()

    traps = [r for r in rows if r.is_trap == 1]
    assert len(traps) == cq.TRAP_HOSTS, "the session trap must flag per host"
    assert all("?session=<D>" in r.template for r in traps)
    # the calendar template meets the volume bar with unique content:
    # the ratio half of the AND is what spares it
    cal = [r for r in rows if r.template.endswith("/index.html")]
    assert cal and all(
        r.n_urls >= cq.TRAP_MIN_URLS and r.is_trap == 0 for r in cal
    )
    for r in rows:
        if "?session=<D>" in r.template:
            # 3 URL variants per doc, identical content: ratio 1/3
            assert r.n_urls == 3 * r.n_contents
            assert r.content_ppm == 333_333
            assert r.is_trap == (1 if r.n_urls >= cq.TRAP_MIN_URLS else 0)
        else:
            # honest templates: every URL its own content, never a trap
            assert r.n_urls == r.n_contents
            assert r.content_ppm == 1_000_000
            assert r.is_trap == 0
    # template masking collapsed every doc_id digit run
    assert all("<D>" in r.template for r in rows)
    hosts = {r.host for r in rows}
    assert len(hosts) == min(cq.TRAP_HOSTS, n)


def test_url_template_traps_plan_has_no_join(spark):
    from ocr_wrapper_spark.curation_queries import url_template_traps

    plan = (
        url_template_traps(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pure map + two-level aggregate: no join of any kind
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan
    assert "BatchEvalPython" not in plan
