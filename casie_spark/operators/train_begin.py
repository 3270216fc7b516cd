"""Deterministic trainer for the argument BEGIN-REPAIR head.

Motivation (measured, r3): the trained tagger finds an overlapping
same-type span for 0.859 of gold arguments but places the exact BEGIN
for only 0.766 — and the triple key (scoring.triple_prf) is
exact-begin.  The misplacement is almost entirely a 1-2 token boundary
disagreement at the span's left edge (dropped leading determiner:
"the ", "a "; or an extra leading token), and it is highly predictable
from surface context: a majority table over (arg_type, previous token,
first token) reaches 0.982 begin accuracy vs the 0.919 keep-as-is
baseline on aligned pred<->gold pairs.

This trains that capability the same way as the other recovered heads
(train_roles.py / train_realis.py — the reference's equivalent
capacity lives inside its BiLSTM-CRF span decoder, whose blobs are
absent upstream): a summed-gather linear model over hashed surface
features of the span's first token and its sentence neighbors,
mini-batch averaged perceptron, fixed seed/schedule, bit-reproducible
artifact.  Classes are token shifts {-2, -1, 0, +1} applied to the
predicted span begin (begin_repair.SHIFTS).  TWO heads share the
recipe: argument spans (keyed by arg_type) and trigger spans (keyed
by subtype — measured exact-begin trigger recall 0.864 vs 0.942
overlap, the same left-edge profile), stored in one artifact under
arg_* / trig_* keys.

Training pairs: model-tag the corpus, align each predicted argument
span to its best-overlapping same-type gold span, label = the token
shift that moves the predicted begin onto the gold begin (pairs whose
gold begin is outside the {-2..+1} token window are dropped — they are
span-detection errors, not boundary errors).

Run:  python -m casie_spark.operators.train_begin
writes casie_spark/artifacts/begin_weights.npz and prints begin
accuracy (keep-as-is is the baseline) plus end-to-end triple P/R/F1.
"""

from __future__ import annotations

import os

import numpy as np

from .model_tagger import N_SHAPES, VOCAB_SIZE, shape_id, token_id

SEED = 20260819
EPOCHS = 24
BATCH = 256
AVG_FROM = 20

# gather-table keys: unigram surface forms, pairwise and triple
# interactions (the measured majority-table keys), prev-token shape
_KEYS = ("at", "t0", "p1", "p2", "nx", "at_t0", "at_p1", "p1_t0",
         "at_p1_t0", "sh_p1")


def _h(*parts: str) -> int:
    return token_id("\x1f".join(parts))


def begin_features(arg_types: list, toks: list, p1s: list, p2s: list,
                   nxs: list) -> dict[str, np.ndarray]:
    """Shared train/inference featurizer.  Null neighbors (sentence
    edge) arrive as None/NaN and hash as the empty string."""
    def s(x) -> str:
        return x if isinstance(x, str) else ""

    n = len(toks)
    cols = {k: np.zeros(n, np.int64) for k in _KEYS}
    for i, (a, t, p1, p2, nx) in enumerate(
            zip(arg_types, toks, p1s, p2s, nxs)):
        a, t, p1, p2, nx = s(a), s(t), s(p1), s(p2), s(nx)
        cols["at"][i] = _h("a", a)
        cols["t0"][i] = _h("t", t)
        cols["p1"][i] = _h("1", p1)
        cols["p2"][i] = _h("2", p2)
        cols["nx"][i] = _h("n", nx)
        cols["at_t0"][i] = _h("A", a, t)
        cols["at_p1"][i] = _h("B", a, p1)
        cols["p1_t0"][i] = _h("C", p1, t)
        cols["at_p1_t0"][i] = _h("D", a, p1, t)
        cols["sh_p1"][i] = shape_id(p1)
    return cols


def _logits(tables: dict[str, np.ndarray], f: dict[str, np.ndarray]
            ) -> np.ndarray:
    # float64 accumulation in _KEYS order: float32 table rows upcast
    # exactly, and left-to-right float64 addition is what the deployed
    # scorer (begin_repair._with_shifts_jvm: JVM crc32/shape ids + one
    # int-only pandas_udf doing the same gathers) computes — the two
    # paths are bit-identical, incl. argmax ties (test_begin_repair)
    out = tables["b"][None, :].astype(np.float64).repeat(
        len(f["t0"]), axis=0)
    for k in _KEYS:
        out += tables[k][f[k]]
    return out


def train_begin_head(f: dict[str, np.ndarray], y: np.ndarray,
                     n_labels: int) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(SEED)
    shapes = {k: ((N_SHAPES if k == "sh_p1" else VOCAB_SIZE), n_labels)
              for k in _KEYS}
    shapes["b"] = (n_labels,)
    tables = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
    avg = {k: np.zeros(s, np.float64) for k, s in shapes.items()}
    n = len(y)
    navg = 0
    for ep in range(EPOCHS):
        order = rng.permutation(n)
        for s0 in range(0, n, BATCH):
            idx = order[s0:s0 + BATCH]
            logits = tables["b"][None, :].repeat(len(idx), axis=0)
            for k in _KEYS:
                logits += tables[k][f[k][idx]]
            pred = logits.argmax(axis=1)
            mist = pred != y[idx]
            if mist.any():
                mi = idx[mist]
                pm = pred[mist]
                for k in _KEYS:
                    np.add.at(tables[k], (f[k][mi], y[mi]), 1.0)
                    np.add.at(tables[k], (f[k][mi], pm), -1.0)
                np.add.at(tables["b"], y[mi], 1.0)
                np.add.at(tables["b"], pm, -1.0)
        if ep >= AVG_FROM:
            for k in tables:
                avg[k] += tables[k]
            navg += 1
    return {k: (avg[k] / max(navg, 1)).astype(np.float32) for k in tables}


def build_training_frame(spark, doc_ids=None, tagger_weights=None,
                         head: str = "arg", edge: str = "begin",
                         begin_weights=None):
    """Aligned (predicted span, gold edge-shift class) pairs from the
    model-tagged corpus — one frame per span kind (``head``: "arg"
    aligns argument spans to gold arguments by arg_type, "trig"
    aligns trigger spans to gold nuggets by subtype) and span edge
    (``edge``: "begin" labels SHIFTS classes against the gold begin,
    "end" labels END_SHIFTS classes against the gold end — the end
    frames are built AFTER applying ``begin_weights`` so the end head
    trains on the spans it will see at inference).  ``doc_ids``
    restricts to a document subset and ``tagger_weights`` overrides
    the committed tagger artifact — the held-out protocol passes
    both.  Output columns: label, _tok, _p1, _p2, _nx, cls — for
    edge="end" the context mapping is mirrored exactly like
    repair_ends (t0=last token, p1=outside+1, p2=outside+2,
    nx=inside-1)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..pipeline import tagged_tokens
    from ..sources.annotations import (
        gold_arguments,
        gold_events,
        load_annotations,
    )
    from ..util import materialize, truncate
    from .begin_repair import (
        END_SHIFTS,
        SHIFTS,
        arguments_with_context,
        events_with_context,
        repair_begins,
    )

    ann = load_annotations(spark)
    if doc_ids is not None:
        ann = ann.filter(F.col("doc_id").isin(list(doc_ids)))
    ann = ann.cache()
    docs = ann.select("doc_id", F.col("content").alias("text"))
    tagged = materialize(
        tagged_tokens(docs, id_col="doc_id", mode="model", hash_ids=False,
                      tagger_weights=tagger_weights))
    if head == "arg":
        spans = arguments_with_context(tagged)
        label, sid = "arg_type", "arg_id"
        gold = gold_arguments(ann).select(
            F.col("doc_id").alias("g_doc"), F.col("begin").alias("g_begin"),
            F.col("end").alias("g_end"),
            F.col("arg_type").alias("g_label")).distinct()
    else:
        spans = events_with_context(tagged)
        label, sid = "subtype", "event_id"
        gold = gold_events(ann).select(
            F.col("doc_id").alias("g_doc"),
            F.col("nugget_begin").alias("g_begin"),
            F.col("nugget_end").alias("g_end"),
            F.col("subtype").alias("g_label")).distinct()
    if edge == "end" and begin_weights:
        # end training pairs come from begin-repaired spans (the
        # inference-time input); keep the end-context columns intact
        spans = repair_begins(spans, begin_weights.get(
            "trig" if head == "trig" else "arg"), label_col=label)
    spans = truncate(spans)
    j = spans.join(
        gold, (spans.doc_id == gold.g_doc) & (spans.begin < gold.g_end)
        & (spans.end > gold.g_begin) & (spans[label] == gold.g_label),
        "inner",
    ).withColumn("ov", F.least(spans.end, gold.g_end)
                 - F.greatest(spans.begin, gold.g_begin))
    w = Window.partitionBy("doc_id", sid).orderBy(F.desc("ov"), "g_begin")
    if edge == "begin":
        cls = (F.when(F.col("g_begin") == F.col("begin"), SHIFTS.index(0))
               .when(F.col("g_begin") == F.col("_p1b"), SHIFTS.index(-1))
               .when(F.col("g_begin") == F.col("_p2b"), SHIFTS.index(-2))
               .when(F.col("g_begin") == F.col("_nxb"), SHIFTS.index(1)))
        ctx = [F.col("_tok"), F.col("_p1"), F.col("_p2"), F.col("_nx")]
    else:
        n1_end = F.col("_ln1b") + F.length("_ln1")
        n2_end = F.col("_ln2b") + F.length("_ln2")
        lp1_end = F.col("_lp1b") + F.length("_lp1")
        cls = (F.when(F.col("g_end") == F.col("end"), END_SHIFTS.index(0))
               .when(F.col("g_end") == n1_end, END_SHIFTS.index(1))
               .when(F.col("g_end") == n2_end, END_SHIFTS.index(2))
               .when((F.col("g_end") == lp1_end) & (F.col("n_tokens") > 1),
                     END_SHIFTS.index(-1)))
        # mirrored context mapping (see repair_ends)
        ctx = [F.col("_ltok").alias("_tok"), F.col("_ln1").alias("_p1"),
               F.col("_ln2").alias("_p2"), F.col("_lp1").alias("_nx")]
    pairs = (
        j.withColumn("_rk", F.row_number().over(w)).filter("_rk = 1")
        .withColumn("cls", cls)
        .filter(F.col("cls").isNotNull())
        .select("doc_id", F.col(sid).alias("span_id"),
                F.col(label).alias("label"), *ctx, "cls")
        .orderBy("doc_id", "span_id")
    )
    pdf = pairs.toPandas()
    tagged.unpersist()
    return pdf


def train(pdf) -> dict[str, np.ndarray]:
    """One head's aligned-pair frame -> unprefixed float16 tables."""
    from .begin_repair import SHIFTS

    f = begin_features(pdf["label"].tolist(), pdf["_tok"].tolist(),
                       pdf["_p1"].tolist(), pdf["_p2"].tolist(),
                       pdf["_nx"].tolist())
    y = pdf["cls"].to_numpy(np.int64)
    tables = train_begin_head(f, y, len(SHIFTS))
    return {k: v.astype(np.float16) for k, v in tables.items()}


# artifact key prefix -> (head, edge); mirrors begin_repair._HEAD_KEYS
_TRAIN_HEADS = (("arg", "arg", "begin"), ("trig", "trig", "begin"),
                ("aend", "arg", "end"), ("tend", "trig", "end"))


def train_arrays(spark, doc_ids=None, tagger_weights=None
                 ) -> dict[str, np.ndarray]:
    """All four edge heads -> one artifact array dict (arg_* / trig_*
    begin heads, aend_* / tend_* end heads).  The end heads train on
    begin-repaired spans from the begin heads fit in the same call —
    matching the inference cascade."""
    from .begin_repair import _HEAD_KEYS  # noqa: F401 (contract doc)

    out: dict[str, np.ndarray] = {}
    begin_w = None
    for prefix, head, edge in _TRAIN_HEADS:
        if edge == "end" and begin_w is None:
            begin_w = arrays_to_weights(out)
        pdf = build_training_frame(spark, doc_ids=doc_ids,
                                   tagger_weights=tagger_weights,
                                   head=head, edge=edge,
                                   begin_weights=begin_w)
        for k, v in train(pdf).items():
            out[f"{prefix}_{k}"] = v
    return out


def arrays_to_weights(arrays):
    """train_arrays() dict -> the {"arg": tables, "trig": tables,
    "arg_end": tables, "trig_end": tables} structure
    load_begin_weights returns."""
    from .begin_repair import _HEAD_KEYS

    out = {}
    for prefix, head in _HEAD_KEYS.items():
        tables = {k[len(prefix) + 1:]: arrays[k].astype(np.float32)
                  for k in arrays if k.startswith(prefix + "_")}
        if tables:
            out[head] = tables
    return out or None


def save_artifact(arrays, path: str | None = None) -> str:
    from .begin_repair import BEGIN_ARTIFACT

    p = path or BEGIN_ARTIFACT
    os.makedirs(os.path.dirname(p), exist_ok=True)
    np.savez_compressed(p, **arrays)
    return p


EDGE_AUDIT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "edge_audit.json")


def exact_span_audit(spark, tagger_weights=None) -> dict:
    """Exact-edge span P/R audit (r4 VERDICT next #5): model-tagged
    mention spans vs gold on (doc, label, begin) AND (doc, label,
    begin, end) keys, under three repair configurations — none,
    begin-only, begin+end — so the END head's contribution shows up
    in its own metric instead of only through Dice.  Writes
    artifacts/edge_audit.json (gated by tests/test_begin_repair.py)."""
    from pyspark.sql import functions as F

    from ..pipeline import tagged_tokens
    from ..scoring import span_exact_prf
    from ..sources.annotations import (
        gold_arguments,
        gold_events,
        load_annotations,
    )
    from ..util import materialize
    from .begin_repair import (
        arguments_with_context,
        events_with_context,
        load_begin_weights,
        repair_edges,
    )

    ann = load_annotations(spark).cache()
    docs = ann.select("doc_id", F.col("content").alias("text"))
    tagged = materialize(tagged_tokens(docs, id_col="doc_id",
                                       mode="model", hash_ids=False,
                                       tagger_weights=tagger_weights))
    w = load_begin_weights() or {}
    gold = {
        "nugget": gold_events(ann).select(
            "doc_id", F.col("subtype").alias("label"),
            F.col("nugget_begin").alias("begin"),
            F.col("nugget_end").alias("end")),
        "argument": gold_arguments(ann).select(
            "doc_id", F.col("arg_type").alias("label"), "begin", "end"),
    }
    out: dict = {}
    for head, ctx_fn, bkey, ekey, lab in (
        ("nugget", events_with_context, "trig", "trig_end", "subtype"),
        ("argument", arguments_with_context, "arg", "arg_end", "arg_type"),
    ):
        out[head] = {}
        for cfg, bw, ew, guard in (
            ("none", None, None, False),
            ("begin", w.get(bkey), None, False),
            ("begin+end", w.get(bkey), w.get(ekey), False),
            # the overlap guard (r4 VERDICT next #6) measured head-on
            ("begin+end+guard", w.get(bkey), w.get(ekey), True),
        ):
            spans = repair_edges(ctx_fn(tagged, guard=guard), bw, ew,
                                 label_col=lab, overlap_guard=guard) \
                .select("doc_id", F.col(lab).alias("label"), "begin", "end")
            out[head][cfg] = {
                "begin_only": span_exact_prf(spans, gold[head],
                                             with_end=False),
                "begin_end": span_exact_prf(spans, gold[head],
                                            with_end=True),
            }
            b, be = out[head][cfg]["begin_only"], out[head][cfg]["begin_end"]
            print(f"{head:8s} {cfg:10s} begin-only P {b['precision']:.3f} "
                  f"R {b['recall']:.3f} F1 {b['f1']:.3f} | (begin,end) "
                  f"P {be['precision']:.3f} R {be['recall']:.3f} "
                  f"F1 {be['f1']:.3f}")
    tagged.unpersist()
    ann.unpersist()
    return out


def audit_main() -> None:  # pragma: no cover - CLI entry
    import json

    from ..session import get_spark

    spark = get_spark("edge-audit", master="local[16]",
                      shuffle_partitions=16)
    out = exact_span_audit(spark)
    with open(EDGE_AUDIT_PATH, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(f"wrote {EDGE_AUDIT_PATH}")
    spark.stop()


def main() -> None:  # pragma: no cover - CLI entry
    from ..session import get_spark
    from .begin_repair import END_SHIFTS, SHIFTS

    spark = get_spark("train-begin", master="local[16]",
                      shuffle_partitions=16)
    arrays: dict[str, np.ndarray] = {}
    begin_w = None
    for prefix, head, edge in _TRAIN_HEADS:
        if edge == "end" and begin_w is None:
            begin_w = arrays_to_weights(arrays)
        pdf = build_training_frame(spark, head=head, edge=edge,
                                   begin_weights=begin_w)
        print(f"{prefix} ({head} {edge}): aligned pairs: {len(pdf)}")
        tables16 = train(pdf)
        for k, v in tables16.items():
            arrays[f"{prefix}_{k}"] = v
        tables = {k: v.astype(np.float32) for k, v in tables16.items()}
        f = begin_features(pdf["label"].tolist(), pdf["_tok"].tolist(),
                           pdf["_p1"].tolist(), pdf["_p2"].tolist(),
                           pdf["_nx"].tolist())
        y = pdf["cls"].to_numpy(np.int64)
        pred = _logits(tables, f).argmax(axis=1)
        keep = SHIFTS.index(0) if edge == "begin" else END_SHIFTS.index(0)
        base = float((y == keep).mean())
        acc = float((pred == y).mean())
        print(f"{prefix}: {edge} accuracy {acc:.4f} "
              f"(keep-as-is baseline {base:.4f})")
    path = save_artifact(arrays)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    # end-to-end triple quality with the repair head active
    from pyspark.sql import functions as F

    from ..pipeline import run_pipeline
    from ..scoring import triple_prf
    from ..sources.annotations import gold_triples, load_annotations
    from . import begin_repair

    begin_repair._BEGIN_CACHE.clear()
    ann = load_annotations(spark).cache()
    docs = ann.select("doc_id", F.col("content").alias("text"))
    pred_df = run_pipeline(docs, id_col="doc_id", mode="model")
    print("triples:", triple_prf(pred_df, gold_triples(ann)))
    spark.stop()


if __name__ == "__main__":
    import sys

    if "--audit" in sys.argv:
        audit_main()
    else:
        main()
