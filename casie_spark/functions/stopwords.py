"""P2: stopword removal (the reference's ``.nostop`` pipeline variants;
prepare.py:289 reads annotation data "which stopwords were removed",
link_coref.py:24 imports ``nltk.corpus.stopwords``).

The word list is the standard English stopword inventory (the public
NLTK set's common core); nltk itself is not in this container.  The
filter is a plain predicate, so Catalyst pushes it as far down as the
plan allows — the Spark analog of the reference writing separate
``.nostop`` label files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "should", "now",
]


def is_stop(token: Column) -> Column:
    """Boolean stopword-membership column (lowercased match)."""
    return F.lower(token).isin(ENGLISH_STOPWORDS)


def remove_stopwords(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Drop stopword token rows — the ``.nostop`` variant of a token
    stream, applied before a model stage."""
    return tokens.filter(~is_stop(F.col(token_col)))


def strip_stopwords(words: Column) -> Column:
    """Array form: ``array_except``-style removal for tokenized-array
    columns (order-preserving, duplicates kept unlike array_except)."""
    return F.filter(words, lambda w: ~F.lower(w).isin(ENGLISH_STOPWORDS))
