"""robots.txt evaluation — the crawl-politeness gate of a web-scale
ingest pipeline (pairs with the host blocklist, q38: the blocklist is
the operator's own policy, robots is the site's).

Semantics implemented (documented subset): the original REP prefix
rules plus Google's published tie-break —

- a record (section) is a maximal run of ``User-agent:`` lines and the
  ``Allow:`` / ``Disallow:`` rules that follow; a section governs us
  iff any of its agent lines is ``*`` (a crawler-specific engine would
  parametrize this);
- comments (``#`` to end of line) and blank lines are ignored; an
  empty ``Disallow:`` value is "allow everything" (ignored as a rule);
- a rule matches a URL iff its value is a PATH PREFIX of the URL's
  path; the longest matching rule wins; on equal length ``Allow``
  wins (Google REP); no matching rule -> allowed.  The ``*``/``$``
  wildcard extension is NOT implemented — prefix-only, stated here so
  the gap is a documented contract, not a surprise.

Scale shape: parsing is one posexplode of the robots body + ONE
per-host window pass (section ids are a running sum over line
positions — the same doc_id-partitioned window discipline as the rest
of the engine); the verdict is a join from urls to the governing rule
set on the uniformly-hashed host, then one max_by aggregation per
url.  Rules tables are host-scale (tiny vs the url stream); every
step is expressible in DuckDB SQL, so the whole gate is
oracle-checked end to end (q51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots bodies into the governing rule set: one row per
    ``Allow``/``Disallow`` value inside a ``User-agent: *`` section —
    (host, rule_path, allow).  Empty values and non-star sections drop
    out here, so the downstream join carries only decisive rules."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "_raw"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("ln"),
    )
    low = F.lower(F.col("ln"))
    is_ua = low.startswith("user-agent:")
    w = (Window.partitionBy("host").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    prev_ua = F.lag(is_ua.cast("int"), 1, 0).over(
        Window.partitionBy("host").orderBy("pos"))
    # a section starts at a UA line NOT preceded by a UA line
    # (consecutive UA lines share one record, per the REP grammar)
    sec_start = (is_ua.cast("int") * (1 - prev_ua))
    tagged = lines.select(
        "host", "pos", "ln",
        F.sum(sec_start).over(w).alias("sec"),
    )
    # value = text after the directive's colon (NOT the last colon —
    # rule paths may contain one), whitespace-trimmed
    val = F.trim(F.regexp_replace("ln", r"^[A-Za-z-]+\s*:", ""))
    star_secs = (
        tagged.filter(F.lower(F.col("ln")).startswith("user-agent")
                      & (val == "*"))
        .select("host", "sec").distinct()
    )
    rules = (
        tagged.join(star_secs, ["host", "sec"])
        .filter(F.lower(F.col("ln")).rlike("^(allow|disallow):"))
        .select(
            "host",
            val.alias("rule_path"),
            F.lower(F.col("ln")).startswith("allow:").alias("allow"),
        )
        .filter(F.col("rule_path") != "")
    )
    return rules


def apply_robots(urls: DataFrame, robots: DataFrame,
                 url_col: str = "url", host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Attach ``crawl_allowed`` to every url row: the longest-prefix
    rule of the host's ``User-agent: *`` section decides; ties go to
    Allow; hosts without robots (or without a matching rule) default
    to allowed."""
    rules = robots_rules(robots, host_col, txt_col)
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*", "")
    path = F.when(path == "", "/").otherwise(path)
    u = urls.withColumn("_host", host).withColumn("_path", path)
    matched = (
        u.join(rules, u._host == rules.host, "left")
        .withColumn("_hit",
                    F.col("rule_path").isNotNull()
                    & F.col("_path").startswith(F.col("rule_path")))
    )
    # longest matching rule wins; allow breaks length ties (Google REP)
    verdict = (
        matched.groupBy(url_col)
        .agg(F.max(F.when(
            F.col("_hit"),
            F.struct(F.length("rule_path").alias("l"),
                     F.col("allow").alias("a")))).alias("_best"))
        .select(url_col,
                F.coalesce(F.col("_best.a") == F.lit(False), F.lit(False))
                .alias("_blocked"))
    )
    return (urls.join(verdict, url_col)
            .withColumn("crawl_allowed", ~F.col("_blocked"))
            .drop("_blocked"))
