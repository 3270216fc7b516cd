"""WARC/WET ingest (sources/warc.py): format -> parse round trip,
file-level lineSep record splitting, header edge cases."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from casie_spark.sources.warc import (format_warc, parse_warc_records,
                                      read_warc)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "https://a.org/x", "hello world\n\nsecond paragraph"),
         (2, "https://b.org/y", "single line text"),
         (3, "https://c.org/z", "unicode café — bytes != chars")],
        "doc_id long, url string, text string")


def test_format_parse_roundtrip(spark):
    """Every payload survives parsing — including one with an internal
    blank line — and Content-Length counts utf-8 BYTES."""
    docs = _docs(spark)
    out = {r["doc_id"]: r for r in
           parse_warc_records(format_warc(docs)).collect()}
    src = {r["doc_id"]: r for r in docs.collect()}
    for did, r in out.items():
        assert r["payload"] == src[did]["text"]
        assert r["target_uri"] == src[did]["url"]
        assert r["warc_type"] == "conversion"
        assert r["content_length"] == len(src[did]["text"].encode("utf-8"))
    assert out[3]["content_length"] > len(src[3]["text"])  # multibyte


def test_read_warc_splits_files(spark, tmp_path):
    """An archive FILE (concatenated records, multiple part files)
    reads back one parsed row per record via the text source's
    lineSep splitting — no RDD API involved."""
    docs = _docs(spark)
    recs = [r["record"] for r in format_warc(docs).collect()]
    (tmp_path / "part0.warc").write_text("".join(recs[:2]))
    (tmp_path / "part1.warc").write_text(recs[2])
    got = read_warc(spark, str(tmp_path))
    rows = {r["target_uri"]: r for r in got.collect()}
    want = {r["url"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(want)
    for uri, r in rows.items():
        assert r["payload"] == want[uri]
        assert r["content_length"] == len(want[uri].encode("utf-8"))


def test_parse_missing_headers_are_null(spark):
    """A record without optional headers parses with NULLs, not an
    error (real WET files vary header sets)."""
    rec = ("WARC/1.0\nWARC-Type: warcinfo\n\n"
           "software: test-crawler 1.0\n\n")
    df = spark.createDataFrame([(rec,)], "record string")
    r = parse_warc_records(df).first()
    assert r["warc_type"] == "warcinfo"
    assert r["target_uri"] is None
    assert r["content_length"] is None
    assert r["payload"] == "software: test-crawler 1.0"


def test_read_warc_crlf_archive(spark, tmp_path):
    """A CRLF-framed archive (the on-disk form of real WARC/WET files,
    ISO 28500) parses identically to the LF form."""
    docs = _docs(spark)
    recs = [r["record"] for r in format_warc(docs).collect()]
    crlf = "".join(recs).replace("\n", "\r\n")
    (tmp_path / "crawl.warc").write_text(crlf)
    got = {r["target_uri"]: r["payload"]
           for r in read_warc(spark, str(tmp_path)).collect()}
    want = {r["url"]: r["text"] for r in docs.collect()}
    assert got == want
