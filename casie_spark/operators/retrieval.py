"""Lexical retrieval over the corpus: inverted index + BM25 top-k.

The training-data layer needs lexical search as much as embedding
search (S1-S3 in ``similarity.py``): targeted decontamination probes,
eval-set leak triage, and "find every page mentioning X" corpus
forensics are all term-at-a-time retrieval problems.  This module
builds the classic inverted index as plain DataFrames and scores
matches with BM25 (Robertson & Zaragoza 2009, the Lucene
``k1``/``b`` + non-negative idf variant), end to end in JVM
expressions — no UDFs.

Scale shape (the 100 TB lens):

- the postings build is ONE shuffle keyed on (term, doc_id); the
  Zipf head combines map-side because the pre-aggregation key is the
  (term, doc) pair, never the bare term;
- document lengths and the corpus-wide (N, avgdl) scalars derive from
  the postings frame (no second pass over the text), the scalar pair
  broadcasting as a 1-row frame;
- the query set is broadcast; scoring touches only postings rows whose
  term appears in some query (a broadcast semi-ish join), so the
  per-query candidate set is the union of the query terms' posting
  lists — document bodies are never reshuffled;
- per-query document frequency comes from the full postings frame once
  (term-keyed agg, vocabulary-scale) and broadcasts;
- top-k is a per-query window over candidates with a unique doc_id
  tie-break, never a global sort.

Cross-engine contract (the q35 conventions): scores are rounded to 4
before ranking on both engines, ``ln`` agrees bit-for-bit between
DuckDB and the JVM on these inputs, and per-(query, doc) sums span at
most a handful of terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# both engines split on the same character class (Java and RE2 agree
# on it); lowercase first so the class stays ASCII-simple
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def doc_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """One row per (doc, token occurrence), lowercased word tokens."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(toks).alias("term"))


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf).

    The groupBy key is the (term, doc) pair, so partial aggregation
    eats the Zipf head before the exchange; the bare-term skew never
    reaches a single reducer.
    """
    return (doc_terms(docs, id_col, text_col)
            .groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 top-k retrieval: ``queries`` is a small (query_id, qtext)
    frame; returns (query_id, doc_id, score, rank) with rank <= k.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))  — Lucene's shifted
    form, non-negative even for terms in every document (this corpus'
    regime).  Scoring is a broadcast join of query terms onto the
    postings frame; only matching posting rows flow into the agg.
    """
    from ..util import materialize

    # three consumers (doclen, dfreq, candidate join) — without the
    # barrier Spark re-runs the token-scale scan+explode+agg subtree
    # once per consumer (no common-subplan reuse)
    postings = materialize(build_postings(docs))
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(F.count("*").alias("n_docs"),
                       F.avg("dl").alias("avgdl"))

    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.filter(
            F.split(F.lower(F.col("qtext")), TOKEN_SPLIT_RE),
            lambda x: x != F.lit("")))).alias("term"),
    )
    # document frequencies restricted to the query terms BEFORE the
    # broadcast: the full vocabulary-scale df table does not broadcast
    # at web scale, the <= |query terms| slice always does
    dfreq = (postings.join(F.broadcast(qterms.select("term").distinct()),
                           "term")
             .groupBy("term").agg(F.count("*").alias("df")))

    cand = (postings.join(F.broadcast(qterms), "term")
            .join(F.broadcast(dfreq), "term")
            .join(doclen, "doc_id")
            .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tfn = (F.col("tf") * (k1 + 1.0)
           / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    scored = (cand.withColumn("contrib", idf * tfn)
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum("contrib"), 4).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))
