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


def test_html_to_text_rules(spark):
    """Every extraction rule on planted markup: script/style/comment
    removal, block boundaries -> lines, inline tags -> spaces, entity
    decoding, whitespace normalization."""
    from pyspark.sql import functions as F

    from casie_spark.functions.text import html_to_text

    html = (
        "<html><head><script>var x = '<p>not text</p>';</script>"
        "<style>.a{color:red}</style></head>\r\n"
        "<body><h1>Big   Title</h1>"
        "<p>first <b>bold</b> paragraph</p>"
        "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
        "<!-- hidden comment --><div>last line<br>break</div></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(html_to_text(F.col("html")).alias("t")).first()["t"]
    assert got.split("\n") == [
        "Big Title",
        "first bold paragraph",
        'A & B <tag> "q" \'s\' end',
        "last line",
        "break",
    ]
    # empty / tags-only input -> empty string
    empty = spark.createDataFrame([("<p></p><div>  </div>",)], "html string")
    assert empty.select(html_to_text(F.col("html")).alias("t")
                        ).first()["t"] == ""
