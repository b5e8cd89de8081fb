"""Extraction-quality eval family: block-verdict trace, closed-form
block accounting, mutation robustness (pipeline_queries
extraction_block_eval / extraction_robustness_matrix)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_wrapper_spark.kernels.html_extract import (
    PAGE_MUTATIONS,
    analyze_blocks,
    extract_main_text,
)
from ocr_wrapper_spark.sources import pages as pages_src

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

tag_soup = st.text(
    alphabet=st.sampled_from(list("<>/&; abcdefgp=\"'x1!-\n\t")), max_size=400
)


@given(tag_soup)
@settings(max_examples=200, deadline=None)
def test_trace_is_the_decision_surface(s):
    """extract_main_text must equal the join of the trace's
    (is_content AND in_main) blocks on ANY input — the eval grades the
    extractor itself, not a parallel reimplementation."""
    trace = analyze_blocks(s)
    joined = " ".join(t for (t, _, _, c, m) in trace if c and m)
    assert joined == extract_main_text(s)


def _html_slice_ids(limit: int = 40):
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT doc_id, text, lang FROM '{SF_CORRECT}/documents.parquet'
            WHERE (doc_id % 5 = 0 OR doc_id % 5 = 2) AND doc_id % 10 <> 7
            ORDER BY doc_id LIMIT {limit}"""
    ).df()
    return list(df.itertuples(index=False, name=None))


def test_block_accounting_matches_generator_closed_form():
    """Per generated page: nonzero-text blocks = 11 + rng%5 + n_paras
    (title, nav wall, 4 outlinks, header, ad, paragraphs, footer) and
    the content verdicts pick exactly the paragraphs."""
    for doc_id, text, lang in _html_slice_ids():
        html = pages_src.build_html(doc_id, text, lang)
        trace = analyze_blocks(html)
        rng = (doc_id * 6364136223846793005 + 1442695040888963407) % (2**63)
        paras = (
            [" ".join(p) for p in pages_src._paragraphs(text.split(" "))]
            if text
            else []
        )
        assert len(trace) == 11 + rng % 5 + len(paras)
        kept = [t for (t, _, _, c, m) in trace if c and m]
        assert kept == paras
        # every non-paragraph block was rejected by exactly the two
        # documented gates: too short or too link-dense
        for t, n, ld, c, _ in trace:
            if t not in paras:
                assert not c and (n < 25 or ld > 0.33)


def test_mutations_preserve_extraction_on_all_carriers():
    """All five mutations keep byte-identity, including the QR-carrier
    (doc_id % 4 == 2) and checkbox-form pages."""
    for doc_id, text, lang in _html_slice_ids():
        page = pages_src.build_html(doc_id, text, lang).decode()
        for name, fn in PAGE_MUTATIONS.items():
            assert extract_main_text(fn(page)) == text, (doc_id, name)


def test_survival_check_is_not_vacuous():
    """A mutation that actually changes extraction semantics (dropping
    </a>, so anchor text stops counting as link chars and long footers
    pass the density gate) must be caught by the same byte-identity
    comparison — i.e. the matrix measures the extractor, not a
    tautology."""
    broken = 0
    for doc_id, text, lang in _html_slice_ids():
        if not text:
            continue
        page = pages_src.build_html(doc_id, text, lang).decode()
        if extract_main_text(page.replace("</a>", "")) != text:
            broken += 1
    assert broken > 0


def test_block_eval_query_reports_perfect_extraction(spark):
    from ocr_wrapper_spark.pipeline_queries import extraction_block_eval

    rows = extraction_block_eval(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.fp == 0 and r.fn == 0
        assert r.n_content == r.n_main == r.tp
        assert r.n_blocks == r.tp + r.tn
        if r.tp > 0:
            assert r.precision_ppm == 1_000_000 and r.recall_ppm == 1_000_000
        else:
            assert r.precision_ppm is None and r.recall_ppm is None


def test_robustness_matrix_query_full_survival(spark):
    from ocr_wrapper_spark.pipeline_queries import extraction_robustness_matrix

    rows = extraction_robustness_matrix(spark, SF_SMOKE).collect()
    assert sorted(r.mutation for r in rows) == sorted(PAGE_MUTATIONS)
    n_pages = {r.n_pages for r in rows}
    assert len(n_pages) == 1 and n_pages.pop() > 0
    for r in rows:
        assert r.n_changed == 0 and r.n_survived == r.n_pages
