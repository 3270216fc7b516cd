"""URL canonicalization — crawl-corpus hygiene: normalize page URLs
so byte-different addresses of the same resource dedup together
(CCNet / RefinedWeb both drop crawl rows whose *normalized* URL was
already seen; the reference's curated 1,000 articles never need it).

Normalization steps, in the order every crawl pipeline applies them:

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme+authority (host names are case-insensitive;
   paths are NOT touched — they are case-sensitive);
3. drop a default port (``:80`` / ``:443``);
4. drop a leading ``www.`` label;
5. remove tracking query parameters (``utm_*``, ``gclid``,
   ``fbclid``) wherever they sit in the query string, cleaning the
   separator that went with them;
6. strip one trailing ``/``.

Everything is `regexp_extract`/`regexp_replace`/`lower` column math
over syntax Java regex and RE2 share (no backreferences in
replacements — the two engines disagree on ``$1`` vs ``\\1``), so the
DuckDB oracle (q37) reproduces the canonical string byte-for-byte.
Map-only: no shuffle until the caller groups by the canonical key,
and that groupBy rides a uniformly-hashed string key exactly like
exact dedup's md5 (dedup.exact_duplicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://authority — everything before the first '/' or '?' after
# the '//' (group 0 extraction only; see module docstring)
_PREFIX_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"
_TRACKING = r"(utm_[a-z]+|gclid|fbclid)"


def canonical_url(col: Column | str) -> Column:
    """The canonical form of a URL column (see module docstring)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*", "")                       # 1. fragment
    prefix = F.regexp_extract(u, _PREFIX_RE, 0)
    rest = F.substring(u, F.length(prefix) + 1, F.lit(1 << 30))
    prefix = F.lower(prefix)                                  # 2. case
    prefix = F.regexp_replace(prefix, r":(80|443)$", "")      # 3. port
    prefix = F.regexp_replace(prefix, r"//www\.", "//")       # 4. www
    # 5. tracking params: first every one FOLLOWED by '&' (separator
    # of the next param absorbs into the match), then a trailing one
    # together with ITS '?'/'&' separator
    rest = F.regexp_replace(rest, _TRACKING + r"=[^&#]*&", "")
    rest = F.regexp_replace(rest, r"[?&]" + _TRACKING + r"=[^&#]*$", "")
    out = F.concat(prefix, rest)
    return F.regexp_replace(out, r"/$", "")                   # 6. slash


def canonical_url_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression (RE2 needs the
    explicit 'g' flag where Spark's regexp_replace is always-global;
    substr/length arithmetic matches F.substring's 1-based contract)."""
    u = f"regexp_replace({expr}, '#.*', '', 'g')"
    prefix = f"coalesce(regexp_extract({u}, '{_PREFIX_RE}', 0), '')"
    rest = f"substr({u}, length({prefix}) + 1)"
    prefix = f"lower({prefix})"
    prefix = f"regexp_replace({prefix}, ':(80|443)$', '', 'g')"
    prefix = f"regexp_replace({prefix}, '//www\\.', '//', 'g')"
    rest = f"regexp_replace({rest}, '{_TRACKING}=[^&#]*&', '', 'g')"
    rest = f"regexp_replace({rest}, '[?&]{_TRACKING}=[^&#]*$', '', 'g')"
    return f"regexp_replace({prefix} || {rest}, '/$', '', 'g')"


def url_host(col: Column | str) -> Column:
    """Lowercased authority without the port (group-1 extract stops at
    '/', ':', '?' or '#')."""
    u = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(u, r"://([^/:?#]+)", 1))


def host_suffixes(host: Column) -> Column:
    """Every dot-suffix of a host name, most-specific first:
    ads.example.com -> [ads.example.com, example.com, com].  Blocklist
    matching is SUFFIX matching (an entry blocks all its subdomains),
    so the join key is the exploded suffix, never a LIKE scan."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: F.array_join(F.slice(labels, i, n), "."))


def filter_blocked_hosts(docs: DataFrame, blocklist: DataFrame | list[str],
                         url_col: str = "url",
                         id_col: str = "doc_id") -> DataFrame:
    """Drop documents whose URL host matches a blocklist entry or any
    of its subdomains (the RefinedWeb/C4 URL-filter step — run before
    reading a byte of body text).

    Scale shape: each doc explodes into at most label-count suffix
    rows (hosts have ~2-5 labels — a bounded fan-out, unlike a
    LIKE-per-entry scan which is O(corpus × blocklist)); the suffix
    rows semi-join the blocklist, which Spark broadcasts (a blocklist
    is millions of rows at worst, far under the broadcast threshold's
    reach with AQE); the surviving ids anti-join back on the id
    column.  The doc body is never shuffled — only (id, suffix)."""
    if isinstance(blocklist, list):
        blocklist = docs.sparkSession.createDataFrame(
            [(h.lower(),) for h in blocklist], "suffix string")
    else:
        blocklist = blocklist.select(
            F.lower(F.col(blocklist.columns[0])).alias("suffix"))
    sufs = host_suffixes(url_host(url_col))
    bad = (
        docs.select(id_col, F.explode(sufs).alias("suffix"))
        .join(F.broadcast(blocklist), "suffix", "left_semi")
        .select(id_col).distinct()
    )
    return docs.join(bad, id_col, "left_anti")


def url_duplicates(docs: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """Groups of URL-equivalent documents: (canonical_url, n_copies,
    keeper_doc_id) with keeper = min id — the URL-level twin of
    dedup.exact_duplicates, run FIRST in a crawl pipeline because it
    needs no text at all (column pruning reaches the scan: only url
    and id are read)."""
    return (
        docs.groupBy(canonical_url(url_col).alias("canonical_url"))
        .agg(F.count("*").alias("n_copies"),
             F.min(id_col).alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
    )
