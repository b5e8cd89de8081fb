"""Session-9 filter-eval guarantees: quality_classifier_eval's bucket
rollup against a composition replica (labels in pure python, scores
from the already-verified doc_quality_classifier query), and
doc_blocklist_filter against a pure-python wordlist replica.
"""

from __future__ import annotations

from collections import defaultdict

from test_bpe_canonical import _write_docs

_STOP = ["the", "and", "of", "to", "a", "in", "is", "that",
         "it", "for", "on", "with", "as", "was"]

# label-term coverage: empty doc; long fluent doc (passes); short doc
# (fails token floor); stopword-free doc (fails stop floor); a doc of
# very long words (fails mean-word-length ceiling)
_TEXTS = {
    0: "",
    1: " ".join((["the", "cats", "sat", "upon", "that", "mat"] * 10)[:60]),
    2: "the quick fox and a dog",  # 6 tokens < 50
    3: " ".join(["zap", "pow", "bam", "wham"] * 15),  # 60 tokens, 0 stops
    4: " ".join(["the", "a"] + ["supercalifragilistic"] * 58),  # mwl > 10
}


def _python_label(text: str, cq) -> bool:
    if text == "":
        return False
    toks = text.split(" ")
    n = len(toks)
    letters = len(text) - (n - 1)
    return (
        cq.QL_MIN_TOKENS <= n <= cq.QL_MAX_TOKENS
        and cq.QL_MIN_MWL * n <= letters <= cq.QL_MAX_MWL * n
        and sum(1 for t in toks if t in _STOP) >= cq.QL_MIN_STOP
    )


def _bucket(score: int) -> int:
    if score == 0:
        return 0
    return len(bin(abs(score))) - 2 if score > 0 else -(len(bin(abs(score))) - 2)


def test_quality_classifier_eval_matches_composition(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq
    from ocr_wrapper_spark import text_queries as tq

    sf_dir = _write_docs(spark, tmp_path, _TEXTS)
    # scores/predictions from the already-verified classifier query
    cls = {
        r.doc_id: (r.score_ppm, r.keep)
        for r in tq.doc_quality_classifier(spark, sf_dir).collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, text in _TEXTS.items():
        score, pred = cls[doc_id]
        label = _python_label(text, cq)
        w = want[_bucket(score)]
        w[0] += 1
        w[1] += pred
        w[2] += label
        w[3] += pred and label
    got = {
        r.score_bucket: (
            r.n_docs,
            r.n_pred_keep,
            r.n_label_keep,
            r.n_both_keep,
            r.label_keep_ppm,
        )
        for r in cq.quality_classifier_eval(spark, sf_dir).collect()
    }
    assert got == {
        b: (n, p, l, pl, l * 1_000_000 // n) for b, (n, p, l, pl) in want.items()
    }
    # each crafted label term actually fired
    labels = {d: _python_label(t, cq) for d, t in _TEXTS.items()}
    assert labels == {0: False, 1: True, 2: False, 3: False, 4: False}
    # empty doc: predicted keep, bucket 0
    assert cls[0] == (0, True) and 0 in got and got[0][1] >= 1


def test_blocklist_filter_matches_pure_python(spark, tmp_path):
    from ocr_wrapper_spark import curation_queries as cq

    texts = {
        0: "",
        1: "spark hash shuffle spark " + "filler " * 6,  # jargon-heavy: block
        2: "customer order " + ("value " * 48),  # sales hits under the bar
        3: "plain words only nothing listed here at all",
    }
    texts = {k: v.strip() for k, v in texts.items()}
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = sorted(
        (r.doc_id, r.infra_jargon_ppm, r.sales_spam_ppm, r.adult_ppm, r.keep)
        for r in cq.doc_blocklist_filter(spark, sf_dir).collect()
    )
    want = []
    for doc_id, t in sorted(texts.items()):
        toks = t.split(" ") if t else []
        n = len(toks)
        ppms = []
        for words in cq.BLOCKLIST.values():
            hits = sum(1 for x in toks if x in words)
            ppms.append(hits * 1_000_000 // n if n else 0)
        want.append(
            (doc_id, *ppms, all(p <= cq.BLOCK_MAX_PPM for p in ppms))
        )
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][4] is True  # empty doc keeps
    assert by_id[1][4] is False and by_id[1][1] > cq.BLOCK_MAX_PPM
    assert by_id[2][4] is True and 0 < by_id[2][2] <= cq.BLOCK_MAX_PPM
    assert by_id[3] == (3, 0, 0, 0, True)
    # the real-world category never hits the synthetic corpus
    assert all(r[3] == 0 for r in got)
