"""WARC connector: record walking by Content-Length (not regex), hostile
tails degrade to skipped records, gzip container, language header."""

from __future__ import annotations

import gzip

from ocr_wrapper_spark.sources.warc import (
    iter_warc_records,
    write_warc_file,
)


def _roundtrip(tmp_path, records):
    p = str(tmp_path / "t.warc")
    write_warc_file(p, records)
    return list(iter_warc_records(open(p, "rb").read()))


def test_warc_roundtrip_and_embedded_magic(tmp_path):
    body = b"<html>contains WARC/1.0\r\n\r\n literal bytes</html>"
    out = _roundtrip(
        tmp_path,
        [
            ("http://a/0000000001.html", "2024-01-01T00:00:00Z", body, "en"),
            ("http://b/0000000002.html", "2024-01-01T00:00:01Z", b"<p>x</p>", None),
        ],
    )
    assert len(out) == 2
    uri, date, got, lang = out[0]
    assert uri == "http://a/0000000001.html" and got == body and lang == "en"
    assert out[1][3] is None


def test_warc_malformed_tail_degrades(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc_file(p, [("http://a/1.html", "2024-01-01T00:00:00Z", b"<p>ok</p>", "en")])
    data = open(p, "rb").read()
    # truncate mid-record of a second copy: first record still parses
    out = list(iter_warc_records(data + data[: len(data) // 2]))
    assert len(out) >= 1 and out[0][2] == b"<p>ok</p>"
    # pure junk yields nothing, never raises
    assert list(iter_warc_records(b"not a warc at all")) == []
    assert list(iter_warc_records(b"")) == []


def test_warc_gzip_container(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc_file(p, [("http://a/1.html", "2024-01-01T00:00:00Z", b"<p>z</p>", None)])
    gz = gzip.compress(open(p, "rb").read())
    out = list(iter_warc_records(gz))
    assert len(out) == 1 and out[0][2] == b"<p>z</p>"
    assert list(iter_warc_records(b"\x1f\x8b broken gzip")) == []
