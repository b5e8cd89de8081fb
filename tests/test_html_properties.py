"""Property-based robustness of the HTML extractor: never crashes,
deterministic, output is single-space-normalized, and known main content
survives arbitrary boilerplate wrapping."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_wrapper_spark.kernels.extract_doc import extract_document
from ocr_wrapper_spark.kernels.html_extract import extract_main_text

tag_soup = st.text(
    alphabet=st.sampled_from(list("<>/&; abcdefgp=\"'x1!-\n\t")), max_size=400
)


@given(tag_soup)
@settings(max_examples=300, deadline=None)
def test_never_crashes_and_deterministic(s):
    a = extract_main_text(s.encode("utf-8"))
    b = extract_main_text(s.encode("utf-8"))
    assert a == b
    # whitespace-normalized: no runs, no leading/trailing space
    assert a == " ".join(a.split())


@given(tag_soup)
@settings(max_examples=100, deadline=None)
def test_full_pipeline_error_free_on_soup(s):
    res = extract_document(s.encode("utf-8"), "en")
    assert res.error is None or isinstance(res.error, str)
    # extracted text must always re-assemble from the span texts
    assert res.extracted_text == " ".join(res.texts)


words = st.lists(
    st.text(alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x2FF), min_size=3, max_size=10),
    min_size=12,
    max_size=60,
)


@given(words)
@settings(max_examples=60, deadline=None)
def test_main_content_survives_wrapping(ws):
    """Any sufficiently long plain-word content inside a content div must
    come back token-identical regardless of the nav/footer wrapper."""
    text = " ".join(ws)
    html = (
        '<html><body><nav><a href="/x">home</a><a href="/y">about</a></nav>'
        f"<main><div><p>{text}</p></div></main>"
        '<footer><a href="/z">imprint</a></footer></body></html>'
    ).encode("utf-8")
    got = extract_main_text(html)
    if len(text) >= 25:  # MIN_BLOCK_CHARS gate
        assert got == text
    else:
        assert got in ("", text)


def test_cdata_comment_script_noise():
    html = (
        b"<html><head><script>var x = '<p>fake</p>';</script>"
        b"<style>p { color: red }</style><!-- <p>comment content</p> --></head>"
        b"<body><div><p>real content words appear here in the main block of this page</p></div>"
        b"</body></html>"
    )
    got = extract_main_text(html)
    assert got == "real content words appear here in the main block of this page"
    assert "fake" not in got and "comment" not in got and "color" not in got
