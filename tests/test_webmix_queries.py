"""webmix_queries guarantees against pure-python replicas: site-template
paragraph detection (same-host repeats flagged, cross-host repeats not),
alpha = 0.5 language sampling rates and the Knuth-hash keep decision,
and the lang-ID confusion rollup.
"""

from __future__ import annotations

import numpy as np

from ocr_wrapper_spark import webmix_queries as wq
from ocr_wrapper_spark.graph_queries import PARA_WORDS
from ocr_wrapper_spark.sources.pages import host_for_doc


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _same_host_pair(start: int = 0):
    """Two doc ids on the same Zipf host plus one on a different host."""
    hosts = host_for_doc(np.arange(start, start + 512, dtype=np.int64))
    by_host: dict[int, list[int]] = {}
    for i, h in enumerate(hosts):
        by_host.setdefault(int(h), []).append(start + i)
        if len(by_host[int(h)]) == 2:
            a, b = by_host[int(h)]
            c = next(
                start + j for j, h2 in enumerate(hosts) if int(h2) != int(h)
            )
            return a, b, c
    raise AssertionError("no host pair in range")


def test_host_template_flags_same_host_repeats_only(spark, tmp_path):
    a, b, c = _same_host_pair()
    # one exact PARA_WORDS-word template paragraph (fixed windows start
    # at word 0, so sharing the first window aligns the fingerprint)
    template = " ".join(f"nav{i}" for i in range(PARA_WORDS))
    rows = [
        (a, template + " " + " ".join(f"worda{i}" for i in range(PARA_WORDS)), "en"),
        (b, template + " " + " ".join(f"wordb{i}" for i in range(PARA_WORDS)), "en"),
        (c, template + " " + " ".join(f"wordc{i}" for i in range(PARA_WORDS)), "en"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: r for r in wq.host_template_paragraphs(spark, sf_dir).collect()
    }
    assert got[a].n_template == 1 and got[b].n_template == 1
    assert got[c].n_template == 0  # same paragraph, different host: content
    assert got[a].n_paras == 2
    assert got[a].template_ppm == 500_000 and not got[a].keep
    assert got[c].template_ppm == 0 and got[c].keep
    host = host_for_doc(np.array([a], dtype=np.int64))[0]
    assert got[a].host == f"host{host:02d}.example.com"


def test_host_template_skips_empty_docs(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [(0, "", "en"), (1, "one two", "en")])
    got = wq.host_template_paragraphs(spark, sf_dir).collect()
    assert {r.doc_id for r in got} == {1}


def _knuth_u(doc_id: int) -> float:
    return float((doc_id * 2654435761) % 2**32) / 2.0**32


def test_lang_alpha_sampling_rates_and_keeps(spark, tmp_path):
    rows = [(i, f"text {i}", "en") for i in range(8)] + [
        (100, "texte", "fr"),
        (101, "texto", "es"),
        (102, "mas texto", "es"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r.lang: r for r in wq.lang_alpha_sampling(spark, sf_dir).collect()}
    assert got["en"].rate_ppm == 1_000_000  # largest language kept whole
    # floor(sqrt(n/8) * 1e6), IEEE-exact on both engines
    assert got["fr"].rate_ppm == int(np.sqrt(1 / 8) * 1e6)
    assert got["es"].rate_ppm == int(np.sqrt(2 / 8) * 1e6)
    for lang, ids in (("en", range(8)), ("fr", [100]), ("es", [101, 102])):
        want = sum(
            1 for i in ids if _knuth_u(i) * 1e6 < got[lang].rate_ppm
        )
        assert got[lang].n_sampled == want
    assert got["en"].n_sampled == 8  # rate 1.0 keeps everything


def test_langid_confusion_rollup(spark, tmp_path):
    # 'the and of' trips the en marker list; bare numbers stay 'und'
    rows = [
        (0, "the and of the and of", "en"),
        (1, "the and of", "en"),
        (2, "1 2 3", "en"),
        (3, "the and of", "fr"),  # mislabeled row: predicted en, true fr
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r.lang, r.lang_guess): r
        for r in wq.langid_confusion_eval(spark, sf_dir).collect()
    }
    assert got[("en", "en")].n_docs == 2 and got[("en", "en")].is_correct
    assert got[("en", "und")].n_docs == 1
    assert got[("fr", "en")].n_docs == 1 and not got[("fr", "en")].is_correct
    assert got[("en", "en")].lang_total == 3
    assert got[("en", "en")].share_ppm == 2_000_000 // 3
    # per-language totals partition the corpus
    assert sum(r.n_docs for r in got.values()) == 4
