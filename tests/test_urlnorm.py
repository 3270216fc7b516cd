"""functions.urlnorm: golden canonicalization cases verified on BOTH
engines (the Spark column chain and its DuckDB RE2 twin must produce
byte-identical canonical strings — same contract as textstats.hash16
and the redaction chain)."""

from __future__ import annotations

import duckdb
import pytest

from casie_spark.functions.urlnorm import (canonical_url, canonical_url_sql,
                                           url_duplicates)

GOLDEN = [
    # fragment stripped
    ("https://a.com/x#sec-2", "https://a.com/x"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://A.COM/Path/X", "https://a.com/Path/X"),
    # default ports stripped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # www. stripped; www2. is a different host and survives
    ("https://www.a.com/x", "https://a.com/x"),
    ("https://www2.a.com/x", "https://www2.a.com/x"),
    # tracking params: leading / mid / trailing / only / adjacent
    ("https://a.com/x?utm_source=f&q=1", "https://a.com/x?q=1"),
    ("https://a.com/x?q=1&utm_medium=m&r=2", "https://a.com/x?q=1&r=2"),
    ("https://a.com/x?q=1&gclid=abc", "https://a.com/x?q=1"),
    ("https://a.com/x?fbclid=zz", "https://a.com/x"),
    ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
    ("https://a.com/x?utm_a=1&q=2&utm_b=3", "https://a.com/x?q=2"),
    # trailing slash stripped (once), root included
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/", "https://a.com"),
    # no path / no query: unchanged
    ("https://a.com", "https://a.com"),
    # everything at once
    ("HTTP://WWW.A.COM:80/Y/?utm_campaign=c#f", "http://a.com/Y"),
]


def test_canonical_url_golden_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in GOLDEN]


def test_canonical_url_golden_duckdb():
    con = duckdb.connect()
    expr = canonical_url_sql("url")
    for u, want in GOLDEN:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        assert got == want, (u, got, want)


def test_canonical_url_idempotent(spark):
    """Canonical forms are fixed points: applying the chain to its own
    output changes nothing (a second normalization pass in a composed
    pipeline must be a no-op)."""
    df = spark.createDataFrame([(want,) for _, want in GOLDEN], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in GOLDEN]


def test_filter_blocked_hosts(spark):
    """Suffix semantics: an entry blocks itself and every subdomain,
    case-insensitively, but NOT a host that merely ends with the same
    string without a dot boundary (notexample-2.com survives)."""
    from casie_spark.functions.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://example-2.com/x"),
         (2, "https://ads.EXAMPLE-2.com/y"),
         (3, "https://notexample-2.com/z"),
         (4, "https://safe.org/ok"),
         (5, "https://a.b.tracker.net/q?id=1")],
        "doc_id long, url string",
    )
    kept = filter_blocked_hosts(df, ["Example-2.com", "tracker.net"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]

    # DataFrame blocklist path (first column = host suffix)
    bl = spark.createDataFrame([("SAFE.org",)], "host string")
    kept2 = filter_blocked_hosts(df, bl)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 2, 3, 5]


def test_url_duplicates_groups(spark):
    df = spark.createDataFrame(
        [(1, "https://www.a.com/x?utm_source=f"),
         (2, "HTTPS://A.COM:443/x"),
         (3, "https://a.com/x#frag"),
         (4, "https://b.com/solo")],
        "doc_id long, url string",
    )
    rows = url_duplicates(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["canonical_url"], r["n_copies"], r["keeper_doc_id"]) == (
        "https://a.com/x", 3, 1)
