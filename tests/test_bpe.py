"""Differential + property gates for distributed BPE training
(operators/bpe.py).

The Spark implementation must reproduce the sequential reference
definition (Sennrich et al. 2016) bit-for-bit: same merge sequence,
same tie-breaks, same greedy left-to-right merge application.  The
reference here is an independent pure-Python implementation over the
same (word, count) vocabulary.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from casie_spark.operators.bpe import (END_SYMBOL, learn_bpe,
                                       segment_vocab, word_vocab)

WORD_RE = re.compile(r"[a-z0-9]+")


# --- sequential reference -------------------------------------------------

def _ref_vocab(texts):
    counts = {}
    for t in texts:
        for w in WORD_RE.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_bpe(word_counts, n_merges, min_freq=2):
    """Sennrich's learn loop: count adjacent pairs weighted by word
    frequency, merge the argmax (ties: lexicographic), repeat."""
    vocab = {w: tuple(list(w) + [END_SYMBOL]) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        stats = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((rank, a, b, n))
        new = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        vocab = new
    return merges, vocab


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# --- differential gates ---------------------------------------------------

GOLDEN = [
    "low lower lowest newer newest wide wider widest",
    "low low low lower lower newest",
    "the new new era of wide wide tables",
    "a1 b2 a1 a1 b2 banana bandana",
]


def test_merge_sequence_matches_reference_golden(spark):
    docs = _spark_docs(spark, GOLDEN)
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in learn_bpe(docs, n_merges=25, min_freq=2).collect()]
    want, _ = _ref_bpe(_ref_vocab(GOLDEN), 25, min_freq=2)
    assert got == want
    assert len(got) > 5  # the corpus supports a non-trivial table


def test_merge_sequence_matches_reference_sf0001(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in learn_bpe(docs, n_merges=15, min_freq=2).collect()]
    texts = [r["text"] for r in docs.select("text").collect()]
    want, _ = _ref_bpe(_ref_vocab(texts), 15, min_freq=2)
    assert got == want


def test_segment_vocab_matches_reference_replay(spark):
    docs = _spark_docs(spark, GOLDEN)
    merges = [(r["left"], r["right"])
              for r in learn_bpe(docs, n_merges=25).collect()]
    seg = {r["w"]: tuple(r["pieces"])
           for r in segment_vocab(docs, merges).collect()}
    _, ref_vocab = _ref_bpe(_ref_vocab(GOLDEN), 25)
    assert seg == ref_vocab
    # every word reassembles from its pieces (end symbol stripped)
    for w, pieces in seg.items():
        assert "".join(pieces).removesuffix(END_SYMBOL) == w


@given(st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6),
    min_size=1, max_size=30))
@settings(max_examples=12, deadline=None)
def test_overlap_and_tiebreak_property(spark, words):
    """Adversarial small alphabet: maximal pair overlap ('a a a') and
    constant ties exercise exactly the scan-order and tie-break edge
    cases.  Property: Spark == sequential reference on both the merge
    table and the final segmentation."""
    text = " ".join(words)
    docs = _spark_docs(spark, [text])
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in learn_bpe(docs, n_merges=8, min_freq=1).collect()]
    want, ref_vocab = _ref_bpe(_ref_vocab([text]), 8, min_freq=1)
    assert got == want
    seg = {r["w"]: tuple(r["pieces"])
           for r in segment_vocab(docs, [(a, b) for _, a, b, _ in got])
           .collect()}
    assert seg == ref_vocab


def test_max_vocab_cap_is_deterministic_head(spark):
    docs = _spark_docs(spark, GOLDEN)
    full = {r["w"]: r["cnt"] for r in word_vocab(docs).collect()}
    top = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    capped = {r["w"]: r["cnt"]
              for r in word_vocab(docs, max_vocab=5).collect()}
    assert capped == dict(top)
