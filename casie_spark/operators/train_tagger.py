"""Deterministic trainer for the model tagger's weights (SURVEY §2.10
M1/M2): a linear context-feature classifier fit on the 1,000
gold-annotated CASIE articles.

The reference trains BiLSTM-CRF models (nug_arg_detection.py:111-208)
whose weight blobs are absent upstream (.MISSING_LARGE_BLOBS); the gold
corpus itself IS present, so the tagging capability is recovered by
training deterministically here.  The model is intentionally the
simplest thing that fits the broadcast-gather inference contract
(model_tagger.TaggerWeights): per-head logits are a sum of five
embedding-table gathers (current token, stem, prev, next, shape) plus
a bias — trained with mini-batch softmax-cross-entropy SGD, fixed
seed, fixed epochs, data in (doc_id, sent_id, token_id) order, so the
artifact is bit-reproducible.

Train/eval protocol mirrors the reference's own: fit on the full
annotated corpus, report mention-level Dice P/R/F1 (score.py §A6
semantics via casie_spark.scoring) — the reference's published recipe
also trains and scores on its single corpus (no held-out crawl exists
upstream).

Run:  python -m casie_spark.operators.train_tagger
writes casie_spark/artifacts/tagger_weights.npz and prints metrics.
"""

from __future__ import annotations

import os

import numpy as np

from .. import config
from .model_tagger import (
    ARTIFACT_PATH,
    BIGRAM_SIZE,
    GOLD_ARG_LABELS,
    N_SHAPES,
    TRIGGER_LABELS,
    TRIGRAM_SIZE,
    VOCAB_SIZE,
    feature_arrays,
)

SEED = 20260817
EPOCHS = 24
BATCH = 256          # small batches: less mini-batch staleness, more
                     # mistake-driven steps -> near-ceiling train fit
AVG_FROM = 20        # average the last epochs only (early epochs are
                     # still far from the solution and dilute the mean)
CLASS_WEIGHT_POW = 0.15


def build_training_frame(spark):
    """Gold-tagged token stream -> pandas (sorted, deterministic):
    columns token, prev, next, trig_label, arg_label."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from ..operators.tagging import tag_gold_replay
    from ..operators.tokenizer import tokenize
    from ..sources.annotations import (
        gold_arguments,
        gold_events,
        load_annotations,
    )

    ann = load_annotations(spark)
    docs = ann.select("doc_id", F.col("content").alias("text"))
    toks = tokenize(docs, id_col="doc_id")
    tagged = tag_gold_replay(toks, gold_events(ann), gold_arguments(ann))
    wsent = Window.partitionBy("doc_id", "sent_id").orderBy("token_id")
    out = (
        tagged.select(
            "doc_id", "sent_id", "token_id", "token",
            F.lag("token", 1).over(wsent).alias("prev"),
            F.lead("token", 1).over(wsent).alias("next"),
            # strip the BIO prefix: heads classify the TYPE, span
            # assembly happens downstream exactly as at inference
            F.regexp_replace("trigger_tag", "^[BI]-", "").alias("trig_label"),
            F.regexp_replace("arg_tag", "^[BI]-", "").alias("arg_label"),
        )
        .orderBy("doc_id", "sent_id", "token_id")
    )
    return out.toPandas()


def _train_head(f: dict[str, np.ndarray], y: np.ndarray, n_labels: int,
                seed: int) -> dict[str, np.ndarray]:
    """Mini-batch AVERAGED PERCEPTRON over the summed-gather linear
    model: on each mistake, +w at the gold label row and -w at the
    predicted one, per feature table (w = inverse-class-frequency^0.15,
    the A1 class-frequency -> class-weights computation, reference
    role_phrase.py:270-281 — so the ~30:1 O class cannot drown the
    trigger/argument classes).
    Mistake-driven updates reach high accuracy on the near-separable
    memorization objective where plain SGD under-trains; per-epoch
    weight averaging gives the usual stability.  Deterministic: fixed
    seed, fixed epoch/batch schedule."""
    rng = np.random.default_rng(seed)
    shapes = {
        "t0": (VOCAB_SIZE, n_labels), "s0": (VOCAB_SIZE, n_labels),
        "tm1": (VOCAB_SIZE, n_labels), "tp1": (VOCAB_SIZE, n_labels),
        "sh": (N_SHAPES, n_labels),
        "b1": (BIGRAM_SIZE, n_labels), "b2": (BIGRAM_SIZE, n_labels),
        "tri": (TRIGRAM_SIZE, n_labels), "b": (n_labels,),
    }
    tables = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
    avg = {k: np.zeros(s, np.float64) for k, s in shapes.items()}
    n = len(y)
    counts = np.bincount(y, minlength=n_labels).astype(np.float64)
    cw = (n / np.maximum(counts, 1.0)) ** CLASS_WEIGHT_POW
    cw = (cw / cw[0]).astype(np.float32)  # O has weight 1

    gather = tuple(k for k in shapes if k != "b")
    navg = 0
    for ep in range(EPOCHS):
        order = rng.permutation(n)
        for s in range(0, n, BATCH):
            idx = order[s:s + BATCH]
            logits = tables["b"][None, :].repeat(len(idx), axis=0)
            for k in gather:
                logits += tables[k][f[k][idx]]
            pred = logits.argmax(axis=1)
            mist = pred != y[idx]
            if mist.any():
                mi = idx[mist]
                pm = pred[mist]
                wts = cw[y[mi]]
                for k in gather:
                    np.add.at(tables[k], (f[k][mi], y[mi]), wts)
                    np.add.at(tables[k], (f[k][mi], pm), -wts)
                np.add.at(tables["b"], y[mi], wts)
                np.add.at(tables["b"], pm, -wts)
        if ep >= AVG_FROM:
            for k in tables:
                avg[k] += tables[k]
            navg += 1
    return {k: (avg[k] / max(navg, 1)).astype(np.float32) for k in tables}


def train(pdf) -> dict[str, np.ndarray]:
    """pandas frame from build_training_frame -> artifact arrays."""
    toks = pdf["token"].astype(str).tolist()
    prevs = pdf["prev"].tolist()
    nexts = pdf["next"].tolist()
    f = feature_arrays(toks, prevs, nexts)

    trig_idx = {t: i for i, t in enumerate(TRIGGER_LABELS)}
    arg_idx = {t: i for i, t in enumerate(GOLD_ARG_LABELS)}
    yt = pdf["trig_label"].map(lambda v: trig_idx.get(v, 0)).to_numpy(np.int64)
    ya = pdf["arg_label"].map(lambda v: arg_idx.get(v, 0)).to_numpy(np.int64)

    trig = _train_head(f, yt, len(TRIGGER_LABELS), SEED)
    arg = _train_head(f, ya, len(GOLD_ARG_LABELS), SEED + 1)

    out: dict[str, np.ndarray] = {}
    for k, v in trig.items():
        out[f"trig_{k}"] = v.astype(np.float16)
    for k, v in arg.items():
        out[f"arg_{k}"] = v.astype(np.float16)
    out["trigger_labels"] = np.array(TRIGGER_LABELS)
    out["arg_labels"] = np.array(GOLD_ARG_LABELS)
    return out


def save_artifact(arrays: dict[str, np.ndarray],
                  path: str = ARTIFACT_PATH) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def evaluate(spark, mode: str = "model") -> dict:
    """Mention-level Dice P/R/F1 (nugget + argument heads) of the
    tagger against gold spans on the full corpus — the BASELINE.md
    metric.  Gold spans come from the gold-replay tagging of the same
    token stream, so tokenization differences cancel."""
    from pyspark.sql import functions as F

    from ..operators.spans import assemble_spans
    from ..operators.tagging import tag_gold_replay
    from ..operators.tokenizer import tokenize
    from ..pipeline import tagged_tokens
    from ..scoring import mention_dice_f1
    from ..sources.annotations import (
        gold_arguments,
        gold_events,
        load_annotations,
    )
    from ..util import materialize

    ann = load_annotations(spark)
    docs = ann.select("doc_id", F.col("content").alias("text"))
    tagged_pred = materialize(
        tagged_tokens(docs, id_col="doc_id", mode=mode, hash_ids=False))
    toks = tokenize(docs, id_col="doc_id")
    tagged_gold = materialize(
        tag_gold_replay(toks, gold_events(ann), gold_arguments(ann)))
    out = {}
    for head, col in (("nugget", "trigger_tag"), ("argument", "arg_tag")):
        pred = assemble_spans(tagged_pred, col)
        gold = assemble_spans(tagged_gold, col)
        out[head] = mention_dice_f1(pred, gold)
    tagged_pred.unpersist()
    tagged_gold.unpersist()
    return out


def main() -> None:  # pragma: no cover - CLI entry
    from ..session import get_spark

    spark = get_spark("train-tagger", master="local[16]",
                      shuffle_partitions=16)
    pdf = build_training_frame(spark)
    print(f"training rows: {len(pdf)}")
    arrays = train(pdf)
    path = save_artifact(arrays)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    # force a reload so evaluate() sees the new artifact
    from . import model_tagger

    model_tagger._CACHED_WEIGHTS = None
    print("model:", evaluate(spark, "model"))
    print("rules:", evaluate(spark, "rules"))
    spark.stop()


if __name__ == "__main__":
    main()
