"""Time normalization (SURVEY §2.8 F5–F7): English number words,
free-text dates, and relative durations resolved against the
publication date.

Faithful reimplementation of the reference semantics —
``txt2int`` (link_coref.py:334-362), ``strtotime`` (:364-410),
``durationtotime`` (:412-478), ``adjust`` (:480-497),
``timedifference`` day-weighting (:499-544) — restructured as pure
functions over token lists plus one vectorized pandas UDF for the
Spark surface.  Quirks preserved on purpose (parity over polish):

- years recognized only in [2000, 2020) (strtotime, :340);
- a weekday name fills the *day-of-month* slot (strtotime returns
  ``[year, month, weekday_index]`` when only a weekday matched, :404);
- ``adjust`` repairs negative day/month by borrowing 31/12 (:487-492);
- mixed-granularity differences weight missing fields 365/30/1
  (:536-543).

The UDF is Arrow-batched (no per-row Python in the plan); each batch is
a plain Python loop over short strings — microseconds per row, never a
shuffle.
"""

from __future__ import annotations

import datetime as _dt
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_UNITS = ["zero", "one", "two", "three", "four", "five", "six", "seven",
          "eight", "nine", "ten", "eleven", "twelve", "thirteen",
          "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
          "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
         "seventy", "eighty", "ninety"]
_SCALES = ["hundred", "thousand", "million", "billion", "trillion"]

_NUMWORDS: dict[str, tuple[int, int]] = {"and": (1, 0)}
for _i, _w in enumerate(_UNITS):
    _NUMWORDS[_w] = (1, _i)
for _i, _w in enumerate(_TENS):
    if _w:
        _NUMWORDS[_w] = (1, _i * 10)
for _i, _w in enumerate(_SCALES):
    _NUMWORDS[_w] = (10 ** (_i * 3 or 2), 0)

# capitalized exactly like the reference's Month/Day dicts
# (link_coref.py:84-86): the raw-token prefix comparison is
# case-SENSITIVE there, so "November"/"Nov." match but "november"
# does not — preserved as-is
_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
         "Saturday", "Sunday"]
_ORDINAL_SUFFIXES = ("th", "rd", "nd", "st")
_ORD_RE = re.compile(r"([0-9]+)([a-zA-Z]*)")


def txt2int(text: str) -> int:
    """English number words -> int ("two hundred and five" -> 205).
    Words outside the vocabulary are skipped, as in the reference."""
    current = result = 0
    for w in text.lower().split():
        if w not in _NUMWORDS:
            continue
        scale, increment = _NUMWORDS[w]
        current = current * scale + increment
        if scale > 100:
            result += current
            current = 0
    return result + current


def strtotime(tokens: list[str]) -> list[int]:
    """Free-text date tokens -> [year, month, day] (0 = missing).
    Reference slot-filling order preserved: year in [2000,2020), then
    day-of-month if a month is already set, else month number; ordinal
    suffix fills day; month/day names match the RAW token's first 3
    letters against the capitalized name (case-sensitive, so
    lowercase "november" deliberately does not set the month —
    link_coref.py:389-401)."""
    month = day_name = year = date = 0
    for x in tokens:
        if x.isdigit():
            v = int(x)
            if 2000 <= v < 2020:
                year = v
                continue
            if 0 < v <= 31 and month != 0:
                date = v
                continue
            if 0 < v <= 12 and month == 0:
                month = v
                continue
        # ordinal day: "21st", "3rd" — prefix regex like the reference
        # (trailing punctuation tolerated: "21st," still matches)
        m = _ORD_RE.match(x)
        if m and 0 < int(m.group(1)) <= 31 and m.group(2) in _ORDINAL_SUFFIXES:
            date = int(m.group(1))
            continue
        matched = False
        for i, m in enumerate(_MONTHS):
            if x[:3] == m[:3]:
                month = i + 1
                matched = True
                break
        if matched:
            continue
        for i, d in enumerate(_DAYS):
            if x[:3] == d[:3]:
                day_name = i + 1
                break
    if date != 0:
        return [year, month, date]
    if day_name != 0:
        return [year, month, day_name]  # weekday-in-day-slot quirk
    return [year, month, date]


def durationtotime(tokens: list[str],
                   pubdate: tuple[int, int, int]) -> tuple[list[int], bool]:
    """Relative expressions ("3 weeks ago", "last year", "today")
    resolved against pubdate.  Returns (date_or_empty, is_plain_text):
    is_plain_text=True means "not a duration — try strtotime"."""
    surface = [x.lower() for x in tokens]
    py, pm, pd_ = pubdate

    def _count(excluded: set[str]) -> int:
        """Reference counting quirk (link_coref.py:424-434 et al.):
        scan stops at the first digit, but if any non-excluded word
        PRECEDED the digit, txt2int over those words OVERRIDES the
        digit — "about 3 years ago" counts as txt2int("about") = 0,
        not 3.  Preserved bit-for-bit."""
        number = 0
        txt = []
        for x in surface:
            if x in excluded:
                continue
            if x.isdigit():
                number = int(x)
                break
            txt.append(x)
        if txt:
            number = txt2int(" ".join(txt))
        return number

    if "this" in surface or "today" in surface or "now" in surface:
        return [py, pm, pd_], False
    if "last" in surface or "ago" in surface or "past" in surface:
        if "year" in surface:
            return [py - 1, pm, pd_], False
        if "years" in surface:
            n = _count({"years", "ago", "past", "last"})
            return [py - n, pm, pd_], False
        if "week" in surface:
            return [py, pm, pd_ - 7], False
        if "weeks" in surface:
            # the reference's weeks branch has NO digit path at all
            # (:438-444): every non-excluded token goes through
            # txt2int, which skips digits — "3 weeks ago" leaves the
            # day unchanged (n = 0).  'last'/'past' are not excluded
            # here but txt2int skips them anyway.
            txt = [x for x in surface if x not in ("weeks", "ago")]
            n = txt2int(" ".join(txt))
            return [py, pm, pd_ - 7 * n], False
        if "days" in surface:
            n = _count({"days", "ago", "past", "last"})
            return [py, pm, pd_ - n], False
        if "month" in surface:
            return [py, pm - 1, pd_], False
        if "months" in surface:
            n = _count({"months", "ago", "last", "past"})
            if pm - n == 0:
                # reference mutates pubdate to (y-1, 1) and STILL
                # subtracts n (:457-460); adjust() later repairs the
                # negative month — preserved bit-for-bit
                return [py - 1, 1 - n, pd_], False
            return [py, pm - n, pd_], False
    return [], True


def adjust(date: list[int], pubdate: tuple[int, int, int]) -> list[int]:
    """Borrow/repair partial dates against pubdate (reference rules:
    year from pubdate when month+day present; day<0 borrows a 31-day
    month; month<0 borrows a year; missing day defaults to 1)."""
    year, month, day = date
    if year == 0 and month != 0 and day != 0:
        year = pubdate[0]
    if day < 0:
        month = month - 1
        day = 31 + day
    if month < 0:
        year = year - 1
        month = 12 + month
    if day == 0 and month != 0 and year != 0:
        day = 1
    if day == 0 and month != 0 and year == 0:
        day = 1
        year = pubdate[0]
    return [year, month, day]


def resolve_time(tokens: list[str],
                 pubdate: tuple[int, int, int]) -> list[int]:
    """Full reference resolution order (timedifference, :520-531):
    duration first, plain-date parse otherwise, then adjust."""
    date, is_text = durationtotime(tokens, pubdate)
    if is_text:
        date = strtotime(tokens)
    if date:
        date = adjust(date, pubdate)
    return date or [0, 0, 0]


def day_difference(d1: list[int], d2: list[int]) -> int:
    """Days between two (possibly partial) dates; complete dates use
    the calendar, partial ones the 365/30/1 field weighting."""
    if 0 not in d1 and 0 not in d2:
        try:
            a = _dt.date(d1[0], d1[1], d1[2])
            b = _dt.date(d2[0], d2[1], d2[2])
            return (a - b).days
        except ValueError:
            pass  # out-of-range borrow artifacts -> weighted path
    diff = 0
    if d1[0] != 0 and d2[0] != 0:
        diff += abs(d1[0] - d2[0]) * 365
    if d1[1] != 0 and d2[1] != 0:
        diff += abs(d1[1] - d2[1]) * 30
    if d1[2] != 0 and d2[2] != 0:
        diff += abs(d1[2] - d2[2])
    return diff


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_RESOLVE_UDF = None


def resolve_time_udf(surface: Column, pubdate: Column) -> Column:
    """Vectorized wrapper: surface string + pubdate 'y_m_d' string ->
    struct(year, month, day, iso).  iso is null for partial dates.
    The pandas_udf is built lazily (its DDL return type needs an
    active SparkSession to parse)."""
    global _RESOLVE_UDF
    if _RESOLVE_UDF is None:
        @pandas_udf("struct<year:int, month:int, day:int, iso:string>")
        def _resolve(surface: pd.Series, pubdate: pd.Series) -> pd.DataFrame:
            years, months, days, isos = [], [], [], []
            for s, p in zip(surface, pubdate):
                try:
                    py, pm, pd_ = (int(v) for v in str(p).split("_"))
                except (ValueError, AttributeError):
                    py, pm, pd_ = 0, 0, 0
                d = resolve_time(str(s).split(), (py, pm, pd_))
                years.append(d[0])
                months.append(d[1])
                days.append(d[2])
                iso = None
                if 0 not in d:
                    try:
                        iso = _dt.date(d[0], d[1], d[2]).isoformat()
                    except ValueError:
                        iso = None
                isos.append(iso)
            return pd.DataFrame({"year": years, "month": months,
                                 "day": days, "iso": isos})

        _RESOLVE_UDF = _resolve
    return _RESOLVE_UDF(surface, pubdate)


def normalize_time_args(triples, documents, doc_id_col: str = "url") -> "pd.DataFrame":
    """Attach normalized time columns to Time-role triples: join the
    document pubdate, resolve obj text against it.  Non-Time rows pass
    through with nulls.

    The pubdate frame is one row PER DOCUMENT, so it must never be
    broadcast — O(n_docs) driver/executor memory at crawl scale.  A
    plain shuffle join on doc_id is correct and scale-safe: triples are
    tiny relative to the token stream, and the (doc_id, pubdate)
    projection prunes the scan to two columns."""
    from .text import extract_pubdate_raw

    pub = documents.select(
        F.col(doc_id_col).alias("doc_id"),
        F.trim(extract_pubdate_raw(F.col("html").cast("string"))).alias("_pubdate"),
    )
    t = triples.join(pub.hint("shuffle_hash"), "doc_id", "left")
    resolved = F.when(
        F.col("pred") == "Time",
        resolve_time_udf(F.col("obj"), F.coalesce("_pubdate", F.lit(""))),
    )
    return (
        t.withColumn("_res", resolved)
        .withColumn("time_year", F.col("_res.year"))
        .withColumn("time_month", F.col("_res.month"))
        .withColumn("time_day", F.col("_res.day"))
        .withColumn("time_iso", F.col("_res.iso"))
        .drop("_res", "_pubdate")
    )
