"""Unit tests for functions.textstats: token counting, quality
scoring, language-ID, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from casie_spark.functions.textstats import (
    bpe_ish_token_count,
    hash16,
    predict_lang,
    quality_columns,
    split_words,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("the quick-fix costs $4.50 today",)], "text string")
    row = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).first()
    assert row["ws"] == 5
    # the|quick|-|fix|costs|$|4|.|50|today
    assert row["bpe"] == 10


def test_quality_columns(spark):
    df = spark.createDataFrame(
        [(1, "the breach of the server and the leak of the data"),
         (2, "x y z"),
         (3, "!!! ??? ### $$$ %%% ^^^")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in quality_columns(df).collect()}
    assert rows[1]["stopword_ratio"] > 0.3
    assert rows[1]["quality_score"] > rows[3]["quality_score"]
    assert rows[2]["quality_score"] == 0.0          # < 5 tokens gate
    assert rows[3]["alpha_ratio"] == 0.0
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0


def test_predict_lang(spark):
    df = spark.createDataFrame(
        [("en", "the cat is on the roof and it is fine"),
         ("de", "der hund und die katze das ist gut"),
         ("fr", "le chat et les chiens dans une maison pour"),
         ("es", "el perro y los gatos que una casa por con"),
         ("und", "zzz qqq www")],
        "expected string, text string")
    rows = df.select(
        "expected", predict_lang(split_words(F.col("text"))).alias("got")
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], r


def test_hash16_range(spark):
    rows = spark.createDataFrame(
        [(w,) for w in ["a", "b", "hello", "CVE-2019-0708"]], "w string"
    ).select(hash16(F.col("w")).alias("h")).collect()
    assert all(0 <= r["h"] < (1 << 16) for r in rows)
    # stable across calls (md5-derived)
    assert rows[2]["h"] == 23873  # md5("hello")[:4] == 5d41


def test_repetition_columns(spark):
    """Gopher repetition gates: a fully repeated doc spikes, a
    all-distinct doc scores zero."""
    from casie_spark.functions.textstats import repetition_columns

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    m = {r["doc_id"]: r for r in repetition_columns(docs).collect()}
    assert m[1]["dup_bigram_frac"] == 0.8    # 5 bigrams, 1 distinct
    assert m[1]["top_word_frac"] == 1.0
    assert m[2]["dup_bigram_frac"] == 0.0
    assert m[2]["dup_trigram_frac"] == 0.0
    assert m[2]["top_word_frac"] == pytest.approx(1 / 6, abs=1e-3)


def test_redact_pii(spark):
    from casie_spark.functions.redact import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail bob@corp.example.org or call 555-123-4567 via 192.168.0.1"),
         (2, "no pii here at all")],
        "doc_id long, text string")
    m = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert m[1]["n_emails"] == 1 and m[1]["n_ips"] == 1 and m[1]["n_phones"] == 1
    assert m[1]["redacted_text"] == "mail <EMAIL> or call <PHONE> via <IP>"
    assert m[2]["redacted_text"] == "no pii here at all"
    assert m[2]["n_emails"] == 0


def test_unigram_logprob_golden(spark):
    """Hand-computed add-0.5 unigram LM means: corpus a=2 b=2 c=1,
    N=5, V=3, denominator 5 + 0.5*(3+1) = 7."""
    import math

    from casie_spark.functions.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a A b"), (2, "b  c")], "doc_id long, text string")
    m = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    lp_ab = math.log10(2.5 / 7)   # a and b tie at count 2
    lp_c = math.log10(1.5 / 7)
    assert m[1]["n_tokens"] == 3
    assert m[1]["mean_logp10"] == round(lp_ab, 4)  # (2*lp_a + lp_b)/3
    assert m[2]["n_tokens"] == 2
    assert m[2]["mean_logp10"] == round((lp_ab + lp_c) / 2, 4)
    # corpus-typical doc scores higher than the rare-token doc
    assert m[1]["mean_logp10"] > m[2]["mean_logp10"]


def test_c4_clean_lines_planted_cases(spark):
    """Every C4 line rule and page rule exercised on planted lines:
    terminal punctuation, min word count, javascript mention,
    min surviving lines, lorem-ipsum page, curly-brace page."""
    from casie_spark.functions.textstats import c4_clean_lines

    good = "this line has enough words to survive."
    rows = [
        # doc 1: 3 good lines + each line-rule violation interleaved
        (1, "\n".join([
            good,
            "no terminal punctuation so it drops",
            "too few words.",
            "another perfectly fine sentence with seven words?",
            "this mentions JavaScript APIs so it drops.",
            'a quoted ending also counts as terminal punctuation "',
        ])),
        # doc 2: only 2 lines survive -> whole page dropped
        (2, "\n".join([good, good, "short."])),
        # doc 3: page contains Lorem Ipsum -> dropped despite good lines
        (3, "\n".join([good, good, good, "classic Lorem Ipsum filler."])),
        # doc 4: curly brace -> dropped
        (4, "\n".join([good, good, good, "var f = function() {"])),
        # doc 5: clean page, all lines survive
        (5, "\n".join([good] * 4)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean_lines(docs).collect()}

    assert set(out) == {1, 5}
    assert out[1]["n_lines_kept"] == 3
    kept1 = out[1]["text"].split("\n")
    assert kept1 == [
        good,
        "another perfectly fine sentence with seven words?",
        'a quoted ending also counts as terminal punctuation "',
    ]
    assert out[5]["n_lines_kept"] == 4
    assert out[5]["text"] == "\n".join([good] * 4)


def test_kmv_cardinality_estimator_quality(spark):
    """KMV and the production HLL knob (approx_count_distinct) both
    land within their advertised error of the exact count on a
    planted large-vocabulary corpus; small groups report exact;
    partition-invariant."""
    import pyspark.sql.functions as F

    from casie_spark.functions.textstats import kmv_cardinality

    # group A: 3000 distinct tokens; group B: 12 (< k -> exact path)
    rows = [("A", " ".join(f"tok{i}" for i in range(d * 30, d * 30 + 30)))
            for d in range(100)]
    rows += [("B", "a b c d e f g h i j k l")] * 5
    docs = spark.createDataFrame(rows, "source string, text string")

    out = {r["source"]: r for r in
           kmv_cardinality(docs, k=64, ngram=1).collect()}
    assert out["A"]["n_distinct_exact"] == 3000
    # KMV relative error ~ 1/sqrt(k-2) ~ 0.127; allow 3 sigma
    assert abs(out["A"]["kmv_estimate"] - 3000) / 3000 < 0.4
    assert out["B"]["n_distinct_exact"] == 12
    assert out["B"]["kmv_estimate"] == 12.0  # exact path below k

    # partition invariance (register/order-insensitive by construction)
    out2 = {r["source"]: tuple(r) for r in
            kmv_cardinality(docs.repartition(13), k=64, ngram=1).collect()}
    assert out2 == {s: tuple(r) for s, r in out.items()}

    # production HLL knob on the same frame, rsd 0.05 -> 3 sigma 15%
    toks = F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                              lambda x: x != F.lit(""))).alias("term")
    hll = {r["source"]: r["n"] for r in
           docs.select("source", toks)
           .groupBy("source")
           .agg(F.approx_count_distinct("term", 0.05).alias("n"))
           .collect()}
    assert abs(hll["A"] - 3000) / 3000 < 0.15
    assert abs(hll["B"] - 12) <= 2


def test_approx_percentile_gates_against_exact(spark):
    """q61's scale knob: approx_percentile (GK sketch, accuracy 10000)
    lands within its bound of the exact per-group percentiles on a
    skewed planted distribution, and is partition-invariant."""
    import pyspark.sql.functions as F

    rows = [("en", i) for i in range(1, 2001)]          # uniform
    rows += [("de", 2 ** (i % 12)) for i in range(999)]  # log-skewed
    df = spark.createDataFrame(rows, "lang string, nt int")
    exact = {r["lang"]: r["p"] for r in df.groupBy("lang").agg(
        F.expr("percentile(nt, array(0.5D, 0.9D))").alias("p")).collect()}
    approx = {r["lang"]: r["p"] for r in df.groupBy("lang").agg(
        F.expr("approx_percentile(nt, array(0.5D, 0.9D), 10000)")
        .alias("p")).collect()}
    approx2 = {r["lang"]: r["p"] for r in df.repartition(9).groupBy(
        "lang").agg(
        F.expr("approx_percentile(nt, array(0.5D, 0.9D), 10000)")
        .alias("p")).collect()}
    assert approx == approx2
    for lang in exact:
        for e, a in zip(exact[lang], approx[lang]):
            # GK guarantees rank error n/accuracy; with accuracy
            # 10000 >= n the answer is rank-exact (a real data value
            # at the requested rank, vs the interpolated exact)
            assert abs(a - e) <= max(1.0, 0.01 * e), (lang, e, a)
