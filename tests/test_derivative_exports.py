"""WET-record export, html text-density profile, CCNet lang buckets."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows, langs=None):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = langs if langs is not None else "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# wet_export_digest
# ---------------------------------------------------------------------------


def test_wet_record_digest_matches_hand_built_record(spark):
    """The md5 must be of the exact WET record bytes: header + target
    URI + Content-Length of the extracted text + blank line + text."""
    from ocr_wrapper_spark.pipeline_queries import wet_export_digest

    out = {
        r["doc_id"]: r
        for r in wet_export_digest(spark, SF_SMOKE).collect()
    }
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    for _, d in docs.head(20).iterrows():
        row = out[d["doc_id"]]
        assert row["content_length"] == len(d["text"])
        record = (
            "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "
            f"{row['url']}\r\nContent-Length: {len(d['text'])}\r\n\r\n{d['text']}"
        )
        assert row["record_md5"] == hashlib.md5(record.encode()).hexdigest()
    assert len(out) == len(docs)


def test_wet_url_embeds_widening_doc_id(spark, tmp_path):
    """Ids past 10 digits widen the url field instead of truncating —
    the DOC_ID_URL_RE contract at 10^12-row scale."""
    from ocr_wrapper_spark.pipeline_queries import wet_export_digest

    big = 10**11 + 5  # 12 digits, doc_id % 5 == 0 -> html branch
    text = " ".join(["alpha", "beta", "gamma"] * 10)  # clears MIN_BLOCK_CHARS
    sf = _write_docs(tmp_path, [(big, text)])
    row = wet_export_digest(spark, sf).collect()[0]
    assert f"/{big}.html" in row["url"]
    assert row["content_length"] == len(text)


# ---------------------------------------------------------------------------
# html_text_density
# ---------------------------------------------------------------------------


def test_text_density_counts_match_direct_payload_parse(spark, tmp_path):
    """The profile parsed by Spark regexes must equal a direct Python
    parse of the generator payload — and the closed-form expectations:
    content_chars = len(text) - (n_paras - 1), anchors = nav + outlink
    'site' x4 + footer."""
    from ocr_wrapper_spark.pipeline_queries import html_text_density
    from ocr_wrapper_spark.sources.pages import build_html

    rows = [
        (0, " ".join(["word"] * 95)),  # 3 paras (tail of 15 stands alone)
        (2, " ".join(["word"] * 41)),  # tail of 1 merges -> 1 para
        (10, ""),  # empty doc: 0 paras, density = anchors/(anchors+ad)
        (12, "solo"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r["doc_id"]: r for r in html_text_density(spark, sf).collect()}
    assert set(out) == {0, 2, 10, 12}
    for doc_id, text in rows:
        page = build_html(doc_id, text, "en").decode()
        paras = re.findall(r"<p>([^<]*)</p>", page)
        anchors = re.findall(r'<a href="[^"]*">([^<]*)</a>', page)
        ad = re.search(r'<aside class="ad">([^<]*)</aside>', page).group(1)
        row = out[doc_id]
        assert row["n_paras"] == len(paras)
        assert row["content_chars"] == sum(len(p) for p in paras)
        if text:
            assert row["content_chars"] == len(text) - (row["n_paras"] - 1)
        assert row["anchor_chars"] == sum(len(a) for a in anchors)
        assert row["ad_chars"] == len(ad)
        total = row["content_chars"] + row["anchor_chars"] + row["ad_chars"]
        assert row["link_density_ppm"] == row["anchor_chars"] * 1000000 // total
    # empty page is pure chrome: density well above any content page
    assert out[10]["link_density_ppm"] > out[0]["link_density_ppm"]


def test_text_density_covers_only_html_slice(spark):
    """PDF/JSON/hOCR/Textract payloads carry no DOM — the profile is
    defined exactly on the html slice."""
    from ocr_wrapper_spark.pipeline_queries import html_text_density

    ids = [r["doc_id"] for r in html_text_density(spark, SF_SMOKE).select("doc_id").collect()]
    assert ids, "html slice empty"
    assert all((i % 5 in (0, 2)) and i % 10 != 7 for i in ids)


# ---------------------------------------------------------------------------
# ccnet_lang_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_are_per_lang_fluency_ordered(spark):
    """Within every language: every head doc scores >= every middle doc
    >= every tail doc, all three buckets are populated at corpus scale,
    and sizes are within one histogram-tie step of |lang|/3."""
    from ocr_wrapper_spark.curation_queries import ccnet_lang_buckets

    rows = ccnet_lang_buckets(spark, SF_SMOKE).collect()
    by_lang: dict[str, dict[str, list[int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["ccnet_bucket"], []).append(
            r["fluency_ppm"]
        )
    assert len(rows) == len(pd.read_parquet(f"{SF_SMOKE}/documents.parquet"))
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, (lang, set(buckets))
        assert min(buckets["head"]) >= max(buckets["middle"])
        assert min(buckets["middle"]) >= max(buckets["tail"])


def test_ccnet_ties_share_a_bucket(spark, tmp_path):
    """Documents with identical scores land in the same bucket (the
    histogram boundary is deterministic under ties)."""
    from ocr_wrapper_spark.curation_queries import ccnet_lang_buckets

    # doc 0 trains the LM; 'a b' bigram is the only mass, so docs made
    # of 'a b' score 1e6 and the 'x y' docs score 0
    rows = [(0, "a b"), (1, "a b"), (2, "x y"), (3, "a b"), (4, "x y"), (5, "x y")]
    sf = _write_docs(tmp_path, rows)
    out = {r["doc_id"]: r for r in ccnet_lang_buckets(spark, sf).collect()}
    fluent = {out[i]["ccnet_bucket"] for i in (0, 1, 3)}
    dull = {out[i]["ccnet_bucket"] for i in (2, 4, 5)}
    assert len(fluent) == 1 and len(dull) == 1
    # two distinct scores over 6 docs: top group's tier = (3*3) div 6 = 1
    # ('middle') — the floor boundary, deterministic under ties
    assert fluent == {"middle"} and dull == {"tail"}
