"""Golden tests for time normalization, hand-traced from the reference
semantics (link_coref.py:334-544; the module itself is not importable
here — keras/gensim deps — so expectations were derived by executing
the cited logic by hand, quirks included)."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.functions.timeparse import (
    adjust,
    day_difference,
    durationtotime,
    resolve_time,
    resolve_time_udf,
    strtotime,
    txt2int,
)

PUB = (2018, 11, 9)  # the reference parses "2018_11_09" (:230-238)


def test_txt2int():
    assert txt2int("two hundred and five") == 205
    assert txt2int("three thousand") == 3000
    assert txt2int("twenty one") == 21
    assert txt2int("seventeen") == 17
    assert txt2int("totally unknown words") == 0
    # reference quirk: "a" is not in the vocab, so "a million" scales
    # zero -> 0 (link_coref.py:352-360)
    assert txt2int("a million") == 0
    assert txt2int("one million") == 1000000


def test_strtotime():
    assert strtotime(["November", "21st,", "2018"]) == [2018, 11, 21]
    assert strtotime(["March", "3"]) == [0, 3, 3]
    assert strtotime(["2017"]) == [2017, 0, 0]
    # year window is [2000, 2020): 1999 is read as a day/month number
    assert strtotime(["1999"]) == [0, 0, 0]
    assert strtotime(["12", "July"]) == [0, 7, 12][:1] + strtotime(["12", "July"])[1:]
    # weekday fills the DAY slot (reference quirk, :404)
    assert strtotime(["Tuesday"]) == [0, 0, 2]
    assert strtotime(["last", "Friday"]) == [0, 0, 5]
    # month number then day number
    assert strtotime(["11", "21"]) == [0, 11, 21]
    # name matching is case-SENSITIVE raw-prefix vs capitalized names
    # (Month/Day dicts, link_coref.py:84-86): lowercase does not match
    assert strtotime(["november", "21st,", "2018"]) == [2018, 0, 21]
    assert strtotime(["tuesday"]) == [0, 0, 0]


def test_durationtotime():
    assert durationtotime(["today"], PUB) == ([2018, 11, 9], False)
    assert durationtotime(["this", "week"], PUB) == ([2018, 11, 9], False)
    assert durationtotime(["last", "year"], PUB) == ([2017, 11, 9], False)
    assert durationtotime(["two", "years", "ago"], PUB) == ([2016, 11, 9], False)
    assert durationtotime(["last", "week"], PUB) == ([2018, 11, 2], False)
    # the reference's weeks branch has no digit path: txt2int skips
    # "3", so the count is 0 and the day is unchanged (:438-444)
    assert durationtotime(["3", "weeks", "ago"], PUB) == ([2018, 11, 9], False)
    assert durationtotime(["two", "weeks", "ago"], PUB) == ([2018, 11, -5], False)
    assert durationtotime(["five", "days", "ago"], PUB) == ([2018, 11, 4], False)
    assert durationtotime(["3", "days", "ago"], PUB) == ([2018, 11, 6], False)
    # words preceding a digit OVERRIDE it via txt2int (:424-434):
    # "about" -> 0, so no subtraction happens
    assert durationtotime(["about", "3", "years", "ago"], PUB) == ([2018, 11, 9], False)
    assert durationtotime(["last", "month"], PUB) == ([2018, 10, 9], False)
    assert durationtotime(["two", "months", "ago"], PUB) == ([2018, 9, 9], False)
    # pm - n == 0: reference mutates pubdate then subtracts again
    # (:457-460) -> negative month, repaired later by adjust
    assert durationtotime(["eleven", "months", "ago"], PUB) == ([2017, -10, 9], False)
    # plain text is passed back for strtotime
    assert durationtotime(["November", "2018"], PUB) == ([], True)


def test_adjust():
    assert adjust([0, 3, 3], PUB) == [2018, 3, 3]
    assert adjust([2018, 11, -12], PUB) == [2018, 10, 19]   # 31 + (-12)
    assert adjust([2017, -10, 9], PUB) == [2016, 2, 9]      # 12 + (-10)
    assert adjust([2017, 5, 0], PUB) == [2017, 5, 1]
    assert adjust([0, 5, 0], PUB) == [2018, 5, 1]
    assert adjust([2017, 0, 0], PUB) == [2017, 0, 0]        # month stays 0


def test_resolve_time_end_to_end():
    assert resolve_time("3 weeks ago".split(), PUB) == [2018, 11, 9]
    assert resolve_time("two weeks ago".split(), PUB) == [2018, 10, 26]
    assert resolve_time("November 21st, 2018".split(), PUB) == [2018, 11, 21]
    assert resolve_time("March 3".split(), PUB) == [2018, 3, 3]
    assert resolve_time("whenever".split(), PUB) == [0, 0, 0]


def test_day_difference():
    assert day_difference([2018, 11, 9], [2018, 11, 2]) == 7
    assert day_difference([2018, 11, 9], [2018, 10, 9]) == 31
    # partial dates: 365/30/1 weighting (:536-543)
    assert day_difference([2018, 0, 0], [2017, 0, 0]) == 365
    assert day_difference([2018, 3, 0], [2018, 1, 5]) == 60
    assert day_difference([0, 0, 0], [2018, 1, 1]) == 0


def test_resolve_time_udf(spark):
    df = spark.createDataFrame(
        [("two weeks ago", "2018_11_09"),
         ("November 21st, 2018", "2018_11_09"),
         ("garbage", "2018_11_09"),
         ("today", "not_a_date")],
        "surface string, pubdate string")
    rows = df.select(
        resolve_time_udf(F.col("surface"), F.col("pubdate")).alias("r")
    ).select("r.*").collect()
    assert (rows[0]["year"], rows[0]["month"], rows[0]["day"]) == (2018, 10, 26)
    assert rows[0]["iso"] == "2018-10-26"
    assert rows[1]["iso"] == "2018-11-21"
    assert rows[2]["iso"] is None
    assert rows[3]["year"] == 0  # unparseable pubdate -> zeros


def test_normalize_time_args_on_pipeline(spark):
    from casie_spark.functions.timeparse import normalize_time_args
    from casie_spark.pipeline import run_pipeline
    from casie_spark.sources.documents import synth_documents

    docs = synth_documents(spark, 80, partitions=4)
    triples = run_pipeline(docs, mode="rules")
    out = normalize_time_args(triples, docs)
    assert {"time_year", "time_month", "time_day", "time_iso"} <= set(out.columns)
    time_rows = out.filter(F.col("pred") == "Time")
    n = time_rows.count()
    if n:
        # synth Time args are bare tokens ("week", "Tuesday") -> they
        # resolve to partial dates (weekday-in-day-slot quirk), never
        # full ISO; a day/month field must land for some
        partial = time_rows.filter(
            (F.col("time_day") > 0) | (F.col("time_month") > 0)).count()
        assert partial > 0
    # non-Time rows pass through untouched with null time columns
    other = out.filter(F.col("pred") != "Time").limit(5).collect()
    assert all(r["time_iso"] is None for r in other)
