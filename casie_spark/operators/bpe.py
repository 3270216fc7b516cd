"""Distributed BPE tokenizer training (Sennrich et al. 2016).

A training-data engine that packs token sequences (corpus.pack_
sequences) and budgets shards by token count needs the tokenizer
itself to be trainable from the corpus it serves.  This module learns
a byte-pair-encoding merge table with Spark doing the corpus-scale
work and the driver holding only the argmax of each round:

1. the corpus collapses to a (word, count) vocabulary frame — ONE
   token-scale shuffle for the whole training run; the Zipf head
   combines map-side and every later pass is vocabulary-scale;
2. each merge round counts adjacent symbol pairs (bounded explode of
   the symbol sequences, weighted by word count), aggregates globally,
   and collects exactly one row (the max-frequency pair, ties broken
   lexicographically so reruns and engines agree);
3. the merge applies as a single JVM ``regexp_replace`` over the
   symbol column — left-to-right non-overlapping, the same semantics
   as the reference greedy scan — with a ``localCheckpoint`` barrier
   per round so the iterative plan tree stays flat.

At 100 TB the vocabulary frame is ~10^8 rows (bounded further by
``max_vocab``, taken deterministically by (count desc, word)), so the
per-round cost is a small agg + a map over a compact frame — the
standard shape of distributed BPE.  The known fast-variant
optimization (apply several non-conflicting merges per round) is
deliberately not taken: one merge per round keeps the result
bit-identical to the sequential reference definition, which is what
the differential gate in ``tests/test_bpe.py`` checks.

Symbols are stored as a space-joined string with one-space sentinels
at both ends (`` l o w </w> ``), so every adjacency — including word
edges — matches the same ``(?<= )a b(?= )`` pattern.  ``</w>`` is the
end-of-word symbol; input tokens are lowercased ``[a-z0-9]+`` words,
so symbol text never collides with the regex metacharacters the
``\\Q..\\E`` quoting guards anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import track_persists, truncate

TOKEN_SPLIT_RE = "[^a-z0-9]+"
END_SYMBOL = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text",
               max_vocab: int | None = None) -> DataFrame:
    """(w, cnt) vocabulary frame — the only token-scale pass."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                    lambda x: x != F.lit(""))
    words = (docs.select(F.explode(toks).alias("w"))
             .groupBy("w").agg(F.count("*").alias("cnt")))
    if max_vocab is not None:
        # deterministic head of the Zipf curve; at web scale this
        # bounds every later round independent of corpus size
        words = words.orderBy(F.desc("cnt"), "w").limit(max_vocab)
    return words


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies, weighted by word count."""
    syms = F.split(F.trim(F.col("sym")), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(F.element_at(syms, i + 1).alias("a"),
                           F.element_at(syms, i + 2).alias("b")),
    )
    return (words.filter(F.size(syms) >= 2)
            .select("cnt", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n")))


def learn_bpe(docs: DataFrame, n_merges: int = 30, min_freq: int = 2,
              text_col: str = "text",
              max_vocab: int | None = None) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, freq).

    The driver receives one row per round (the argmax pair); corpus
    text is touched exactly once.  Stops early when the best pair's
    frequency drops below ``min_freq``.
    """
    spark = docs.sparkSession
    with track_persists():
        words = word_vocab(docs, text_col, max_vocab).withColumn(
            "sym",
            F.concat(F.lit(" "),
                     F.regexp_replace("w", "(.)", "$1 "),
                     F.lit(END_SYMBOL + " ")),
        )
        words = truncate(words)
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(n_merges):
            best = (_pair_counts(words)
                    .orderBy(F.desc("n"), "a", "b").limit(1).collect())
            if not best or best[0]["n"] < min_freq:
                break
            a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
            merges.append((rank, a, b, n))
            pat = f"(?<= )\\Q{a} {b}\\E(?= )"
            words = truncate(
                words.withColumn(
                    "sym", F.regexp_replace("sym", pat, a + b)))
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long")


def segment_vocab(docs: DataFrame, merges: list[tuple[str, str]],
                  text_col: str = "text",
                  max_vocab: int | None = None) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary; returns
    (w, cnt, pieces array<string>) — the encoder table a tokenization
    stage broadcasts (the Zipf trick: encode per unique surface,
    scatter by join)."""
    words = word_vocab(docs, text_col, max_vocab).withColumn(
        "sym",
        F.concat(F.lit(" "),
                 F.regexp_replace("w", "(.)", "$1 "),
                 F.lit(END_SYMBOL + " ")),
    )
    col = F.col("sym")
    for a, b in merges:
        col = F.regexp_replace(col, f"(?<= )\\Q{a} {b}\\E(?= )", a + b)
    return words.select(
        "w", "cnt", F.split(F.trim(col), " ").alias("pieces"))
