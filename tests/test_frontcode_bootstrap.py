"""CDX front-coding and Poisson-bootstrap tests: full python replicas
built from the parquet bytes (urlkeys rebuilt closed-form from
documents, exactly like the DuckDB oracle but in independent python),
plus byte-accounting and resample-mass invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def _urlkey(doc_id: int, lang: str, host: int) -> str:
    from ocr_wrapper_spark.sources import pages as pages_src

    m = doc_id % pages_src.PDF_MOD
    if m == 3:
        ext = "pdf"
    elif m == pages_src.JSON_REM:
        ext = "json"
    elif m == pages_src.HOCR_REM:
        ext = "hocr"
    elif doc_id % pages_src.TEXTRACT_MOD == pages_src.TEXTRACT_REM:
        ext = "textract"
    else:
        ext = "html"
    return f"com,example,host{host:02d})/{lang}/{doc_id:010d}.{ext}"


def _lcp(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_frontcode_python_replica_smoke(spark):
    from ocr_wrapper_spark.archive_queries import CDX_ZIP_BLOCK, cdx_prefix_compression
    from ocr_wrapper_spark.sources.pages import host_for_doc

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang"])
    hosts = host_for_doc(docs.doc_id.to_numpy(np.int64))
    blocks = {}
    for (doc_id, lang), host in zip(docs[["doc_id", "lang"]].itertuples(index=False), hosts):
        blocks.setdefault((int(host), int(doc_id) // CDX_ZIP_BLOCK), []).append(
            _urlkey(int(doc_id), lang, int(host))
        )
    per_host = {}
    for (host, _blk), keys in blocks.items():
        keys.sort()
        st = per_host.setdefault(host, [0, 0, 0])  # n, raw, lcp
        for i, k in enumerate(keys):
            st[0] += 1
            st[1] += len(k)
            st[2] += _lcp(keys[i - 1], k) if i else 0
    expect = {
        f"host{h:02d}.example.com": (n, raw, raw - lc, lc * 1_000_000 // raw)
        for h, (n, raw, lc) in per_host.items()
    }
    rows = cdx_prefix_compression(spark, SF_SMOKE).collect()
    got = {
        r.host: (r.n_urls, r.raw_bytes, r.coded_bytes, r.savings_ppm) for r in rows
    }
    assert got == expect
    # byte accounting closes; front-coding genuinely saves overall (a
    # tail host whose every block holds one url legitimately saves 0)
    for r in rows:
        assert r.coded_bytes <= r.raw_bytes
    assert sum(r.coded_bytes for r in rows) < sum(r.raw_bytes for r in rows)
    assert max(r.savings_ppm for r in rows) > 500_000  # hot hosts: >half the bytes


def test_bootstrap_python_replica_smoke(spark):
    from ocr_wrapper_spark.sketch_queries import (
        BOOT_B,
        BOOT_CDF,
        BOOT_KEY_MULT,
        bootstrap_token_ci,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    cdf = [float(t) for t in BOOT_CDF]

    def knuth_u(x: int) -> float:
        return ((x % 2**32) * 2654435761 % 2**32) / 2**32

    expect = {}
    for r in range(BOOT_B):
        n_eff = tok = 0
        for row in docs.itertuples():
            n = 0 if row.text == "" else len(row.text.split(" "))
            u = knuth_u((int(row.doc_id) % 2**32) * BOOT_KEY_MULT + r)
            w = next((k for k, t in enumerate(cdf) if u < t), len(cdf))
            n_eff += w
            tok += w * n
        expect[r] = (n_eff, tok, tok * 1000 // n_eff)
    got = {
        r.replicate: (r.n_eff, r.sum_tokens, r.mean_tokens_permil)
        for r in bootstrap_token_ci(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # resample mass concentrates around N (Poisson(1) mean 1 per doc)
    n = len(docs)
    for n_eff, _, _ in expect.values():
        assert abs(n_eff - n) < 5 * n**0.5
    # replicate means vary (the whole point) but stay near the corpus mean
    means = [m for _, _, m in got.values()]
    assert len(set(means)) > 1
