"""W3 distance-to-trigger encoding + nearest_trigger surface
(parseJsontoFeatures.py:37 alphabet, :431-433 bucket rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.operators.linking import (
    DISTANCE_SYMBOLS,
    encode_distance,
    nearest_trigger,
)


def test_distance_alphabet_quirk():
    # verbatim reference list: 'x' skipped after 'w', appended after 'aa'
    assert DISTANCE_SYMBOLS[22:27] == ["w", "y", "z", "aa", "x"]
    assert len(DISTANCE_SYMBOLS) == 27


def test_encode_distance_buckets(spark):
    rows = spark.range(1).select(
        encode_distance(F.lit(0)).alias("d0"),
        encode_distance(F.lit(1)).alias("d1"),
        encode_distance(F.lit(23)).alias("d23"),
        encode_distance(F.lit(25)).alias("d25"),
        encode_distance(F.lit(26)).alias("d26"),
        encode_distance(F.lit(400)).alias("d400"),
    ).first()
    assert rows["d0"] == "a" and rows["d1"] == "b"
    assert rows["d23"] == "y"          # the skip-x quirk
    assert rows["d25"] == "aa"
    assert rows["d26"] == "x" and rows["d400"] == "x"  # overflow bucket


def test_nearest_trigger_carries_dist_code(spark):
    tagged = spark.createDataFrame(
        [  # doc, sent, tok, token, begin, trigger_tag
            (1, 0, 0, "attackers", 0, "O"),
            (1, 0, 1, "stole", 10, "B-Databreach"),
            (1, 0, 2, "files", 16, "O"),
            (1, 1, 0, "later", 22, "O"),
        ],
        "doc_id long, sent_id int, token_id int, token string, "
        "begin long, trigger_tag string")
    out = {(r["sent_id"], r["token_id"]): r
           for r in nearest_trigger(tagged).collect()}
    assert out[(0, 0)]["dist_code"] == "b"   # distance 1
    assert out[(0, 1)]["dist_code"] == "a"   # the trigger itself
    assert out[(0, 2)]["trigger_position"] == "before"
    assert out[(1, 0)]["trigger_position"] == "differsentence"
    assert out[(1, 0)]["dist_code"] is None
