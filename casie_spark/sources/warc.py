"""WARC crawl-archive ingest: the raw input format of a web-scale
training-data pipeline (Common Crawl ships WARC/WET).

The reference consumes pre-extracted article text (SURVEY §2.1 S1);
a crawl-scale engine has to start one step earlier, at the archive.
WARC is a plain-text framing — header block, blank line, payload —
so both directions stay JVM-side:

- :func:`read_warc` splits archive files into records with the text
  source's ``lineSep`` option (one row per record, no RDD API, fully
  splittable by Spark's normal file partitioning) and parses headers
  with regexp_extract column ops.
- :func:`format_warc` renders a documents frame INTO record text (the
  round-trip twin, used by tests and by the q48 oracle contract).

Payload caveat, by design: splitting on the record marker assumes the
marker never occurs inside a payload — true for WET (text) extracts,
not guaranteed for raw response bytes; for binary WARC use the
gzip-per-record form where each member is one record (the Common
Crawl layout) and decompress per file.  Documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_MARKER = "WARC/1.0\n"

# header block = everything before the first blank line; payload = the
# rest.  Headers parsed individually so absent ones yield NULL, not a
# parse failure.
_HEADERS = {
    "warc_type": r"WARC-Type: ([^\n]+)",
    "target_uri": r"WARC-Target-URI: ([^\n]+)",
    "warc_date": r"WARC-Date: ([^\n]+)",
    "content_length": r"Content-Length: ([0-9]+)",
}


def format_warc(docs: DataFrame, url_col: str = "url",
                text_col: str = "text", date_col: str | None = None,
                warc_type: str = "conversion") -> DataFrame:
    """Render each document as one WARC record string (column
    ``record``, keyed by the input columns).  ``conversion`` is the
    WET record type for extracted text.  Content-Length counts the
    payload BYTES (utf-8), per the WARC spec."""
    date = (F.col(date_col) if date_col
            else F.lit("2026-01-01T00:00:00Z"))
    rec = F.concat(
        F.lit(RECORD_MARKER),
        F.lit("WARC-Type: " + warc_type + "\n"),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\n"),
        F.lit("WARC-Date: "), date, F.lit("\n"),
        F.lit("Content-Length: "),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("string"),
        F.lit("\n\n"),
        F.col(text_col), F.lit("\n\n"),
    )
    return docs.withColumn("record", rec)


def parse_warc_records(records: DataFrame,
                       col: str = "record") -> DataFrame:
    """Parse raw record strings (header block + blank line + payload)
    into typed columns: warc_type, target_uri, warc_date,
    content_length (long), payload.  Pure column ops — two
    substring_index splits and one regexp_extract per header."""
    raw = F.col(col)
    head = F.substring_index(raw, "\n\n", 1)
    # payload = everything after the first blank line, trailing
    # record-separator blank lines stripped
    payload = F.expr(
        f"rtrim('\n', substring({col}, length(substring_index({col}, "
        f"'\\n\\n', 1)) + 3))")
    out = records
    for name, pat in _HEADERS.items():
        v = F.regexp_extract(head, pat, 1)
        v = F.when(v == "", None).otherwise(v)
        out = out.withColumn(name, v)
    return (out.withColumn("content_length",
                           F.col("content_length").cast("long"))
            .withColumn("payload", payload))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET archive files into one parsed row per record.
    The text source splits on the record marker (``lineSep`` — stays
    in the DataFrame API and keeps normal file splitting); empty
    fragments (e.g. before the first marker) are dropped, and the
    marker is restored so records round-trip through
    :func:`parse_warc_records`."""
    # split on the bare version token (not marker+newline): real WARC
    # frames lines with CRLF (ISO 28500) and locally-rendered records
    # with LF — both then normalize to the LF form the parser reads
    raw = (spark.read.option("lineSep", RECORD_MARKER.rstrip("\n"))
           .text(path)
           .select(F.regexp_replace("value", "\r\n", "\n").alias("value"))
           .select(F.regexp_replace("value", "^\n", "").alias("value"))
           .filter(F.trim("value") != ""))
    recs = raw.select(
        F.concat(F.lit(RECORD_MARKER), F.col("value")).alias("record"))
    return parse_warc_records(recs)
