"""boilerplate_strip_rewrite + crawl_overlap_sketch: planted-template
rewrites (same-host vote, cross-host isolation, order-preserving
reassembly, all-template page), and a python replica of the KMV
Jaccard estimator on a planted paragraph split."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _para(word: str, n: int = 20) -> str:
    return " ".join([word] * n)


def _write_documents(tmp_path, doc_ids, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(doc_ids),
            "source": ["src0"] * len(doc_ids),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _ids_by_host():
    """First ids sharing a Zipf host, plus one on a different host."""
    from ocr_wrapper_spark.sources import pages

    ids = np.arange(64, dtype=np.int64)
    hosts = pages.host_for_doc(ids)
    for i in range(len(ids)):
        same = [int(ids[j]) for j in range(len(ids)) if hosts[j] == hosts[i]]
        if len(same) >= 3:
            other = next(int(ids[j]) for j in range(len(ids)) if hosts[j] != hosts[i])
            return same[:3], other
    raise AssertionError("no host collision in the first 64 ids")


def test_rewrite_strips_same_host_template_only(spark, tmp_path):
    from ocr_wrapper_spark import webmix_queries as wq

    (a, b, c), other = _ids_by_host()
    P1, P2, P3, P4 = _para("tmpl"), _para("bodyb"), _para("bodyc"), _para("bodyd")
    # a and b share P1 on one host (template there); `other` also has P1
    # but is alone on its host (NOT template there); c is all-template.
    sf_dir = _write_documents(
        tmp_path,
        [a, b, c, other],
        [f"{P2} {P1} {P3}", f"{P1} {P4}", P1, f"{P1} {P4}"],
    )
    rows = {r.doc_id: r for r in wq.boilerplate_strip_rewrite(spark, sf_dir).collect()}
    assert rows[a].n_paras == 3 and rows[a].n_kept == 2
    # order-preserving reassembly: P2 (before the template) then P3
    assert rows[a].clean_text == f"{P2} {P3}"
    assert rows[b].clean_text == P4 and rows[b].n_kept == 1
    # an all-template page comes back empty, not dropped
    assert rows[c].clean_text == "" and rows[c].n_kept == 0 and rows[c].n_paras == 1
    # same paragraph on a lone page of ANOTHER host is content there
    assert rows[other].clean_text == f"{P1} {P4}" and rows[other].n_kept == 2


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_overlap_sketch_matches_python_replica(spark, tmp_path):
    from ocr_wrapper_spark import sketch_queries as sq

    # 30 distinct paragraphs; even docs carry 0..19, odd docs 10..29:
    # exact Jaccard = 10/30. One paragraph repeated in both parities
    # must count once per side (DISTINCT).
    paras = [_para(f"w{i}") for i in range(30)]
    docs, texts = [], []
    for i in range(10):  # even ids: paragraphs 2i, 2i+1 from 0..19
        docs.append(2 * i)
        texts.append(f"{paras[2 * i]} {paras[2 * i + 1]}")
    for i in range(10):  # odd ids: paragraphs 10..29
        docs.append(2 * i + 1)
        texts.append(f"{paras[10 + 2 * i]} {paras[10 + 2 * i + 1]}")
    sf_dir = _write_documents(tmp_path, docs, texts)
    row = sq.crawl_overlap_sketch(spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b, row.n_union, row.n_inter) == (20, 20, 30, 10)
    assert row.jaccard_exact_ppm == 10 * 1_000_000 // 30
    # replica of the bottom-k estimator (k > |union| here, so exact)
    hs = sorted((_h60(p), 0 <= i < 20, i >= 10) for i, p in enumerate(paras))
    k = min(sq.OVERLAP_K, len(hs))
    matches = sum(1 for _, ia, ib in hs[:k] if ia and ib)
    assert (row.sketch_k, row.sketch_matches) == (k, matches)
    assert row.jaccard_est_ppm == matches * 1_000_000 // k
    assert row.err_ppm == abs(row.jaccard_est_ppm - row.jaccard_exact_ppm)


def test_overlap_sketch_disjoint_and_identical(spark, tmp_path):
    from ocr_wrapper_spark import sketch_queries as sq

    # identical crawls: Jaccard exactly 1 on both the estimate and truth
    paras = [_para(f"x{i}") for i in range(8)]
    docs = list(range(16))
    texts = [paras[i // 2] for i in range(16)]  # every para in both parities
    sf_dir = _write_documents(tmp_path, docs, texts)
    row = sq.crawl_overlap_sketch(spark, sf_dir).collect()[0]
    assert row.n_inter == row.n_union == 8
    assert row.jaccard_exact_ppm == row.jaccard_est_ppm == 1_000_000
    assert row.err_ppm == 0
