"""M3: BERT-variant tagging harness (reference
nug_arg_detection_bert.py:109-182 — 768-d wordpiece embeddings +
BiLSTM-CRF heads; bert_to_pickle.py produces the aligned embeddings).

No transformer runtime or weights exist in this container, so — like
the multimodal decode kernels — the ENCODER IS A DECLARED STUB: a
deterministic seeded projection per piece.  Everything around it is
the real Spark-side contract, exercised by tests:

- sentence batching: one row per (doc, sent) with the token array, so
  an Arrow batch always holds whole sentences (the reference's
  MAX_LENGTH padding unit);
- wordpiece split -> encode -> J9 running-average alignment back to
  tokens (operators/wordpiece.align_wordpieces, quirks included);
- broadcast (768, n_labels) head + argmax decode per token (the CRF
  decode is model-internal; its weights are absent upstream with the
  rest, .MISSING_LARGE_BLOBS).

Swapping ``encoder``/``pieces_fn`` for a real tokenizer+model client
and ``head`` for trained matrices upgrades this to a real BERT tagger
with no DAG changes — the same upgrade contract as TaggerWeights.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .wordpiece import align_wordpieces

BERT_DIM = 768
BERT_LABELS = ["O", "Phishing", "DiscoverVulnerability", "Databreach",
               "PatchVulnerability", "Ransom"]


def fake_wordpieces(token: str, max_piece: int = 6) -> list[str]:
    """STUB tokenizer: greedy fixed-width chunks with '##'
    continuations — shape-compatible with a real WordPiece vocab
    (first piece bare, continuations ##-prefixed), deterministic."""
    low = token.lower()
    if len(low) <= max_piece:
        return [low]
    out = [low[:max_piece]]
    for i in range(max_piece, len(low), max_piece):
        out.append("##" + low[i:i + max_piece])
    return out


def fake_bert_encoder(sent_pieces, dim: int = BERT_DIM) -> np.ndarray:
    """STUB encoder: per-piece seeded standard-normal vector (crc32
    seed) — deterministic across workers/sessions/batch shapes, no
    context mixing (a real encoder is contextual; the harness does not
    care).

    Contract (what a real client implements): input is a list of
    per-sentence piece lists — ONE call per Arrow batch, so the callee
    can pad/batch sentences for the accelerator — output is the flat
    (total_pieces, dim) concatenation in input order.  A flat list of
    piece strings is also accepted (treated as one sentence)."""
    if sent_pieces and isinstance(sent_pieces[0], str):
        sent_pieces = [sent_pieces]
    flat = [p for sp in sent_pieces for p in sp]
    out = np.zeros((len(flat), dim), dtype=np.float32)
    for i, p in enumerate(flat):
        rng = np.random.default_rng(zlib.crc32(p.encode("utf-8")))
        out[i] = rng.standard_normal(dim).astype(np.float32)
    return out


def default_head(n_labels: int = len(BERT_LABELS),
                 dim: int = BERT_DIM) -> np.ndarray:
    """STUB head: fixed-seed projection (768, n_labels)."""
    rng = np.random.default_rng(20260817)
    return rng.standard_normal((dim, n_labels)).astype(np.float32) * 0.01


def bert_tag(tokens: DataFrame,
             head: np.ndarray | None = None,
             encoder: Callable[[list[str]], np.ndarray] = fake_bert_encoder,
             pieces_fn: Callable[[str], list[str]] = fake_wordpieces,
             labels: list[str] | None = None) -> DataFrame:
    """tokens -> (doc_id, sent_id, token_id, token, bert_tag).

    Whole-sentence grouping (rides the doc_id partitioning via the
    clustering subset rule), then BLOCK-WISE inference per Arrow
    batch: all sentences' pieces are flattened into ONE ``encoder``
    call (the callee sees sentence boundaries and can pad/batch for
    an accelerator) and all aligned token vectors into ONE head
    matmul — no per-sentence Python round trips, so a real encoder
    drop-in is batch-efficient.  Per-sentence work is only the J9
    running-average alignment (cheap numpy)."""
    spark = tokens.sparkSession
    head = default_head() if head is None else head
    labels = list(BERT_LABELS) if labels is None else labels
    bc = spark.sparkContext.broadcast((head, labels))

    sents = tokens.groupBy("doc_id", "sent_id").agg(
        F.array_sort(
            F.collect_list(F.struct("token_id", "token"))
        ).alias("_toks")
    )
    id_type = dict(tokens.dtypes)["doc_id"]
    schema = (f"doc_id {id_type}, sent_id int, token_id int, "
              "token string, bert_tag string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, labs = bc.value
        labs = np.array(labs, dtype=object)
        for pdf in batches:
            # phase 1: tokenize every sentence, flatten pieces
            sent_toks, sent_tids, sent_pieces = [], [], []
            bounds = []
            off = 0
            for toks_struct in pdf["_toks"]:
                toks = [t["token"] for t in toks_struct]
                tids = [t["token_id"] for t in toks_struct]
                pieces: list[str] = []
                for t in toks:
                    pieces.extend(pieces_fn(t))
                sent_toks.append(toks)
                sent_tids.append(tids)
                sent_pieces.append(pieces)
                bounds.append((off, off + len(pieces)))
                off += len(pieces)
            rows = {k: [] for k in
                    ("doc_id", "sent_id", "token_id", "token", "bert_tag")}
            if not off:
                yield pd.DataFrame(rows)
                continue
            # phase 2: ONE encoder call for the whole Arrow batch
            vecs = encoder(sent_pieces).astype(np.float32)
            # phase 3: per-sentence J9 alignment, vectors concatenated
            mats, keep = [], []
            for i, (lo, hi) in enumerate(bounds):
                aligned = align_wordpieces(sent_toks[i], sent_pieces[i],
                                           vecs[lo:hi])
                if aligned:
                    mats.append(np.stack([v for _, v in aligned]))
                    keep.append((i, len(aligned)))
            if not mats:
                yield pd.DataFrame(rows)
                continue
            # phase 4: ONE head matmul + argmax for the whole batch
            pred = labs[(np.concatenate(mats).astype(np.float32) @ w)
                        .argmax(axis=1)]
            pos = 0
            doc_col = pdf["doc_id"]
            sent_col = pdf["sent_id"]
            for i, n_aligned in keep:
                toks, tids = sent_toks[i], sent_tids[i]
                n = min(n_aligned, len(toks))
                rows["doc_id"].extend([doc_col.iloc[i]] * n)
                rows["sent_id"].extend([sent_col.iloc[i]] * n)
                rows["token_id"].extend(tids[:n])
                rows["token"].extend(toks[:n])
                rows["bert_tag"].extend(pred[pos:pos + n])
                pos += n_aligned
            yield pd.DataFrame(rows)

    return sents.mapInPandas(run, schema=schema)
