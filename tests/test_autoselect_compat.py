"""Autoselect registry matrix (mirrors reference tests/test_autoselect.py)
and v0/v1 compat round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_wrapper_spark.operators import autoselect as asel


def test_default_and_explicit_selection(monkeypatch):
    monkeypatch.delenv(asel.ENV_EXTRACTOR, raising=False)
    monkeypatch.delenv(asel.ENV_OVERRIDE, raising=False)
    assert asel.autoselect_extractor() is asel.name2extractor["single"]
    assert asel.autoselect_extractor("dual") is asel.name2extractor["dual"]
    assert asel.autoselect_extractor("consensus") is asel.name2extractor["consensus"]


def test_env_default(monkeypatch):
    monkeypatch.setenv(asel.ENV_EXTRACTOR, "dual")
    assert asel.autoselect_extractor() is asel.name2extractor["dual"]


def test_unknown_raises(monkeypatch):
    monkeypatch.delenv(asel.ENV_OVERRIDE, raising=False)
    with pytest.raises(asel.InvalidExtractorException):
        asel.autoselect_extractor("no_such_engine")


@pytest.mark.parametrize(
    "override, name, expected",
    [
        ("single=dual", "single", "dual"),
        ("single=dual,consensus=single", "consensus", "single"),
        ("alias=consensus", "alias", "consensus"),
        ("", "single", "single"),
    ],
)
def test_override_matrix(monkeypatch, override, name, expected):
    """Reference autoselect override semantics ('a=b,c=d')."""
    monkeypatch.setenv(asel.ENV_OVERRIDE, override)
    assert asel.autoselect_extractor(name) is asel.name2extractor[expected]


def test_bad_override_entries(monkeypatch):
    monkeypatch.setenv(asel.ENV_OVERRIDE, "justaname")
    with pytest.raises(asel.InvalidExtractorException):
        asel.autoselect_extractor("single")
    monkeypatch.setenv(asel.ENV_OVERRIDE, "a=unknown_target")
    with pytest.raises(asel.InvalidExtractorException):
        asel.autoselect_extractor("single")


def test_compat_round_trip(spark):
    from ocr_wrapper_spark.functions.compat import spans_to_v0, v0_to_spans
    from ocr_wrapper_spark.schema import SPANS_ARRAY
    from pyspark.sql import types as T

    span = {
        "TLx": 0.1, "TLy": 0.2, "TRx": 0.3, "TRy": 0.2,
        "BRx": 0.3, "BRy": 0.25, "BLx": 0.1, "BLy": 0.25,
        "in_pixels": False, "text": "w0", "label": "L", "confidence": 0.75,
    }
    span2 = dict(span, text="w1", confidence=0.5, label=None)
    schema = T.StructType([T.StructField("spans", SPANS_ARRAY)])
    df = spark.createDataFrame([([span, span2],)], schema)

    bboxes, confs = spans_to_v0(F.col("spans"))
    out = df.select(
        F.col("spans").alias("orig"),
        v0_to_spans(bboxes, confs).alias("roundtrip"),
        confs.alias("confidences"),
    ).collect()[0]
    assert out.confidences == [0.75, 0.5]
    assert [r.asDict() for r in out.roundtrip] == [r.asDict() for r in out.orig]


def test_aux_mode_registered(monkeypatch):
    assert asel.autoselect_extractor("aux") is asel.name2extractor["aux"]
    monkeypatch.setenv(asel.ENV_OVERRIDE, "single=aux")
    assert asel.autoselect_extractor("single") is asel.name2extractor["aux"]
