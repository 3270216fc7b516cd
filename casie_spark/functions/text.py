"""Document header/text extraction — pure column expressions.

The reference strips a pseudo-XML header from each source file and
keeps everything after ``<text>`` + 7 bytes (reference
code/utils.py:6-8 ``cuthead``; same logic in report.py:12-15).  The
per-row invariant from BASELINE.json ``input_hint`` is *byte-identical
extracted text per url* vs that semantics, so the expression below
mirrors it exactly: ``substring(raw, instr(raw, '<text>') + 7)``.
Documents without a ``<text>`` marker yield the empty string (instr=0
-> substring from 7 of something shorter is '' only when raw is short;
we guard explicitly instead).

All functions here are JVM-side column expressions — they stay inside
whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TEXT_MARKER = "<text>"


def extract_text(raw: Column) -> Column:
    """Body after ``<text>`` marker + 7 chars — utils.py:6-8 semantics.

    ``cuthead = raw.index('<text>') + 7`` then ``raw[cuthead:]``: the
    +7 skips the 6-char marker plus the following newline.
    """
    return F.when(
        F.instr(raw, TEXT_MARKER) > 0,
        F.substring(raw, F.instr(raw, TEXT_MARKER) + 7, F.lit(2147483647)),
    ).otherwise(F.lit(""))


def extract_title(raw: Column) -> Column:
    """``<title>...</title>`` contents (data/source/*.txt line 1)."""
    return F.regexp_extract(raw, r"<title>(.*?)</title>", 1)


def extract_source_url(raw: Column) -> Column:
    """``<source> url </source>`` contents, trimmed."""
    return F.trim(F.regexp_extract(raw, r"<source>(.*?)</source>", 1))


def extract_pubdate_raw(raw: Column) -> Column:
    """``<date> YYYY_MM_DD </date>`` raw string (link_coref.py:230-238)."""
    return F.trim(F.regexp_extract(raw, r"<date>(.*?)</date>", 1))


def parse_pubdate(date_raw: Column) -> Column:
    """``2018_11_09`` -> DateType; reference splits on '_'
    (link_coref.py:230-238).  Non-matching strings -> null."""
    return F.to_date(F.regexp_replace(date_raw, "_", "-"), "yyyy-M-d")


def with_extracted_columns(df, raw_col: str = "html_str"):
    """documents(raw) -> + title, source_url, pubdate, text."""
    raw = F.col(raw_col)
    return (
        df.withColumn("title", extract_title(raw))
        .withColumn("source_url", extract_source_url(raw))
        .withColumn("pubdate", parse_pubdate(extract_pubdate_raw(raw)))
        .withColumn("text", extract_text(raw))
    )


def html_to_text(html: Column) -> Column:
    """Real-HTML boilerplate stripping — the crawl-chain step between
    WARC ingest (sources/warc.py) and the hygiene pipeline: drop
    script/style blocks and comments, turn block-element boundaries
    into line breaks, strip remaining tags, decode the common
    entities, and normalize whitespace to trimmed non-empty lines.
    A deterministic regexp chain (RE2/Java-shared syntax, same rule as
    redact/urlnorm) — NOT a DOM parser: no recovery from pathological
    markup, which is the standard trade a crawl pipeline makes for a
    JVM-side, codegen-friendly extractor (trafilatura-class parsing
    would be a per-row Python dependency this container doesn't ship).
    Every step mirrors 1:1 into the DuckDB oracle (q52)."""
    # no backreferences: DuckDB's RE2 twin doesn't support them
    t = F.regexp_replace(
        html, r"(?is)<script\b.*?</script\s*>|<style\b.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines BEFORE tags are stripped
    t = F.regexp_replace(
        t, r"(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote)\s*>|<br\s*/?>",
        "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'")):
        t = F.regexp_replace(t, ent, rep)
    # collapse intra-line whitespace, trim lines, drop empty lines
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    return F.regexp_replace(t, r"^\n|\n$", "")
