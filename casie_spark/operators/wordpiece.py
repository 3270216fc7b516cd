"""BERT wordpiece ↔ token as-of alignment (SURVEY §2.3 J9) — the
plumbing for the M3 BERT tagging variant.

The reference aligns wordpiece embeddings to CoreNLP tokens by merging
``##`` pieces and running-averaging their vectors until the
accumulated surface equals the target token, with ``[UNK]`` fallback
(bert_to_pickle.py:118-189).  Reimplemented as a pure positional-merge
function (testable without any model) plus an Arrow wrapper; the BERT
encoder itself is absent in this container, exactly like the other
model weights — a real deployment feeds (tokens, pieces, vectors)
batches from its inference service through the same function.

Reference quirks preserved: running pairwise average ((acc+v)/2) after
the first piece rather than a true mean, and a mismatched accumulation
resets to one [UNK] vector and advances one token.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SPECIAL = {"[CLS]", "[SEP]", "[PAD]"}
UNK = "[UNK]"


def align_wordpieces(tokens: list[str], pieces: list[str],
                     vectors: np.ndarray) -> list[tuple[str, np.ndarray]]:
    """(tokens, pieces, piece vectors) -> one (surface, vector) per
    consumed token position.  surface is the merged piece text, or
    '[UNK]' when the pieces cannot reproduce the token."""
    out: list[tuple[str, np.ndarray]] = []
    dim = vectors.shape[1] if len(vectors) else 0
    acc = np.zeros(dim)
    surface = ""
    j = 0
    for piece, vec in zip(pieces, vectors):
        if j >= len(tokens):
            break
        if piece in SPECIAL:
            continue
        if piece == UNK:
            out.append((UNK, np.asarray(vec, dtype=float)))
            acc, surface = np.zeros(dim), ""
            j += 1
            continue
        stripped = piece[2:] if piece.startswith("##") else piece
        acc = np.asarray(vec, dtype=float) if not surface else (acc + vec) / 2
        surface += stripped
        target = tokens[j].lower()
        if surface == target:
            out.append((surface, acc))
            acc, surface = np.zeros(dim), ""
            j += 1
        elif target.find(surface) != 0:
            # accumulated surface diverged: reference resets to [UNK]
            # and advances (bert_to_pickle.py:178-189)
            out.append((UNK, np.asarray(vec, dtype=float)))
            acc, surface = np.zeros(dim), ""
            j += 1
    return out


PIECE_ALIGN_SCHEMA = (
    "doc_id long, sent_id int, token_id int, surface string, "
    "vector array<double>"
)


def align_wordpieces_df(sentences: DataFrame) -> DataFrame:
    """Arrow wrapper: rows of (doc_id, sent_id, tokens array<string>,
    pieces array<string>, vectors array<array<double>>) -> one aligned
    row per token.  Each Arrow batch holds whole sentences, so the
    merge never crosses a batch boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "sent_id", "token_id", "surface", "vector")}
            for _, r in pdf.iterrows():
                vecs = np.array([np.asarray(v, dtype=float)
                                 for v in r["vectors"]])
                aligned = align_wordpieces(list(r["tokens"]),
                                           list(r["pieces"]), vecs)
                for tid, (surface, vec) in enumerate(aligned):
                    rows["doc_id"].append(r["doc_id"])
                    rows["sent_id"].append(r["sent_id"])
                    rows["token_id"].append(tid)
                    rows["surface"].append(surface)
                    rows["vector"].append(vec.tolist())
            yield pd.DataFrame(rows)

    return sentences.mapInPandas(run, schema=PIECE_ALIGN_SCHEMA)
