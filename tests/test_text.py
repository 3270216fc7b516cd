"""Byte-identical text extraction invariant (BASELINE.json input_hint).

Oracle: the reference semantics ``raw[raw.index('<text>')+7:]``
(reference code/utils.py:6-8) evaluated in plain Python over real
reference source files, compared byte-for-byte with the Spark column
expression.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from casie_spark.functions.text import (
    extract_pubdate_raw,
    extract_text,
    extract_title,
    parse_pubdate,
)


def _py_reference_cut(txt: str) -> str:
    # utils.py:6-8 semantics
    cuthead = txt.index("<text>") + 7
    return txt[cuthead:]


def test_extract_text_byte_identical(spark):
    files = sorted(glob.glob("/root/reference/data/source/*.txt"))[:50]
    rows = []
    for f in files:
        with open(f, encoding="utf-8") as fh:
            rows.append((f, fh.read()))
    df = spark.createDataFrame(rows, "path string, raw string")
    got = {
        r["path"]: r["t"]
        for r in df.select("path", extract_text(F.col("raw")).alias("t")).collect()
    }
    for path, raw in rows:
        assert got[path] == _py_reference_cut(raw), path


def test_extract_text_no_marker(spark):
    df = spark.createDataFrame([("no marker here",)], "raw string")
    assert df.select(extract_text(F.col("raw")).alias("t")).first()["t"] == ""


def test_title_and_date(spark):
    raw = "<title>Big breach</title>\n<source> http://x </source>\n<date> 2018_11_09 </date>\n<text>\nbody"
    df = spark.createDataFrame([(raw,)], "raw string")
    r = df.select(
        extract_title(F.col("raw")).alias("title"),
        parse_pubdate(extract_pubdate_raw(F.col("raw"))).alias("d"),
    ).first()
    assert r["title"] == "Big breach"
    assert str(r["d"]) == "2018-11-09"
