"""P2 stopword removal + A8 sentence-vector mean (reference
avg_sentence_vector link_coref.py:285-298; .nostop variants
prepare.py:289)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from casie_spark.functions.stopwords import (
    is_stop,
    remove_stopwords,
    strip_stopwords,
)
from casie_spark.operators.similarity import sentence_vectors


def test_remove_stopwords(spark):
    toks = spark.createDataFrame(
        [(1, 0, i, t) for i, t in
         enumerate(["The", "hackers", "stole", "the", "data", "from", "it"])],
        "doc_id long, sent_id int, token_id int, token string")
    kept = [r["token"] for r in
            remove_stopwords(toks).orderBy("token_id").collect()]
    assert kept == ["hackers", "stole", "data"]

    arr = spark.range(1).select(
        strip_stopwords(F.array(*[F.lit(w) for w in
                                  ["The", "breach", "of", "the", "server"]])
                        ).alias("ws")).first()["ws"]
    assert arr == ["breach", "server"]

    row = spark.range(1).select(is_stop(F.lit("The")).alias("a"),
                                is_stop(F.lit("breach")).alias("b")).first()
    assert row["a"] is True and row["b"] is False


def test_sentence_vectors_mean_and_zero(spark):
    """Reference semantics: mean over in-vocab words only; unknown
    words skipped (KeyError path); all-unknown sentences absent from
    the inner join (the caller treats missing as the zero vector,
    like the reference's nwords == 0 branch)."""
    toks = spark.createDataFrame(
        [(1, 0, 0, "alpha"), (1, 0, 1, "beta"), (1, 0, 2, "unknown"),
         (1, 1, 0, "alpha"),
         (2, 0, 0, "nothing_known")],
        "doc_id long, sent_id int, token_id int, token string")
    wv = spark.createDataFrame(
        [("alpha", [1.0, 3.0]), ("beta", [3.0, 5.0])],
        "word string, vector array<double>")
    out = {(r["doc_id"], r["sent_id"]): (r["sent_vec"], r["n_words"])
           for r in sentence_vectors(toks, wv, dim=2).collect()}
    vec, n = out[(1, 0)]
    assert n == 2 and np.allclose(vec, [2.0, 4.0])
    vec1, n1 = out[(1, 1)]
    assert n1 == 1 and np.allclose(vec1, [1.0, 3.0])
    assert (2, 0) not in out  # no known word -> zero-vector case
