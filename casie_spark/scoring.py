"""Evaluation: triple-set P/R and mention-level Dice F1.

- ``triple_prf``: order-insensitive set comparison of predicted vs
  gold triples on (doc_id, event_begin, pred, arg_begin) keys — the
  BASELINE.json parity gate (P/R >= 0.95).
- ``mention_dice_f1``: span-level scoring faithful to the reference
  scorer (score.py:154-250): per gold span, best-overlapping predicted
  span of the same label in the same (doc, sent); Dice = 2*tp/(tg+ts)
  micro-averaged (:144, :227).  The reference's greedy matching removes
  a predicted span once matched (:214-217); reproduced with a
  row_number over (gold order) and anti-reuse via one-to-one matching
  on sorted overlap.

Both are pure DataFrame aggregations — the scorer itself distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triple_prf(pred: DataFrame, gold: DataFrame) -> dict:
    """P/R/F1 over distinct triple keys.

    pred: (doc_id, event_begin, pred, arg_begin) columns expected.
    gold: (doc_id, nugget_begin, pred, begin).
    """
    p = pred.select(
        "doc_id",
        F.col("event_begin").cast("long").alias("k1"),
        F.col("pred").alias("k2"),
        F.col("arg_begin").cast("long").alias("k3"),
    ).distinct()
    g = gold.select(
        "doc_id",
        F.col("nugget_begin").cast("long").alias("k1"),
        F.col("pred").alias("k2"),
        F.col("begin").cast("long").alias("k3"),
    ).distinct()
    np, ng = p.count(), g.count()
    tp = p.join(g, ["doc_id", "k1", "k2", "k3"], "inner").count()
    precision = tp / np if np else 0.0
    recall = tp / ng if ng else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    return {"tp": tp, "n_pred": np, "n_gold": ng,
            "precision": precision, "recall": recall, "f1": f1}


def mention_dice_f1(pred_spans: DataFrame, gold_spans: DataFrame) -> dict:
    """Micro Dice-F1 between predicted and gold spans.

    Expects both sides with (doc_id, sent_id, label, begin, end,
    n_tokens).  Matching: per (doc, sent, label), order gold by begin;
    each gold greedily takes the unmatched predicted span with the
    largest token overlap (ties -> smallest begin) — the score.py
    :214-217 greedy-removal semantics via one-to-one rank pairing.
    """
    g = gold_spans.select(
        "doc_id", "sent_id", "label",
        F.col("begin").alias("g_begin"), F.col("end").alias("g_end"),
        F.col("n_tokens").alias("g_n"),
    )
    p = pred_spans.select(
        "doc_id", "sent_id", "label",
        F.col("begin").alias("p_begin"), F.col("end").alias("p_end"),
        F.col("n_tokens").alias("p_n"),
    )
    j = g.join(p, ["doc_id", "sent_id", "label"], "inner").withColumn(
        "overlap",
        F.greatest(
            F.lit(0),
            F.least("g_end", "p_end") - F.greatest("g_begin", "p_begin"),
        ),
    ).filter(F.col("overlap") > 0)
    # one-to-one: best pred per gold, then dedup preds keeping best gold
    wg = Window.partitionBy("doc_id", "sent_id", "label", "g_begin").orderBy(
        F.desc("overlap"), "p_begin"
    )
    best = j.withColumn("rk", F.row_number().over(wg)).filter("rk = 1")
    wp = Window.partitionBy("doc_id", "sent_id", "label", "p_begin").orderBy(
        F.desc("overlap"), "g_begin"
    )
    matched = best.withColumn("rk2", F.row_number().over(wp)).filter("rk2 = 1")

    agg = matched.agg(
        F.sum(
            2.0 * F.least("g_n", "p_n") / (F.col("g_n") + F.col("p_n"))
        ).alias("dice_sum")
    ).first()
    dice = agg["dice_sum"] or 0.0
    n_gold = gold_spans.count()
    n_pred = pred_spans.count()
    precision = dice / n_pred if n_pred else 0.0
    recall = dice / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    return {"dice_sum": dice, "n_gold": n_gold, "n_pred": n_pred,
            "precision": precision, "recall": recall, "f1": f1}


def span_exact_prf(pred_spans: DataFrame, gold_spans: DataFrame,
                   with_end: bool = True) -> dict:
    """Exact-edge span P/R/F1 (r4 VERDICT next #5 — the end-edge
    audit): set comparison of (doc_id, label, begin[, end]) keys.
    ``with_end=False`` scores the begin-only key the triple gate uses;
    the delta between the two is exactly the right-edge error the
    Dice scorer smooths over."""
    keys = ["doc_id", "label", "k_begin"] + (["k_end"] if with_end else [])

    def _k(df):
        cols = [
            "doc_id", "label",
            F.col("begin").cast("long").alias("k_begin"),
        ]
        if with_end:
            cols.append(F.col("end").cast("long").alias("k_end"))
        return df.select(*cols).distinct()

    p, g = _k(pred_spans), _k(gold_spans)
    np_, ng = p.count(), g.count()
    tp = p.join(g, keys, "inner").count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = (2 * precision * recall / (precision + recall)) \
        if precision + recall else 0.0
    return {"tp": tp, "n_pred": np_, "n_gold": ng,
            "precision": precision, "recall": recall, "f1": f1}


def bag_intersect(words1: list[str], words2: list[str]) -> int:
    """F15 exact: the reference's ``intersect`` multiset overlap
    (score.py:72-103) — scan the longer list, removing each matched
    word from a copy of the shorter; the count is how many were
    removed.  Ports the exact remove-first semantics (duplicates
    consume one occurrence each)."""
    if len(words1) >= len(words2):
        longer, shorter = words1, list(words2)
    else:
        longer, shorter = words2, list(words1)
    oldlen = len(shorter)
    for x in longer:
        if x in shorter:
            shorter.remove(x)
    return oldlen - len(shorter)


def mention_dice_f1_exact(pred_spans: DataFrame,
                          gold_spans: DataFrame) -> dict:
    """A6/F15 exact form: the reference's sequential greedy matching
    (score.py:198-217) — per gold span in order, the same-label
    predicted span of that (doc, sent) with MAXIMUM multiset overlap
    (first index on ties, strict ``>``) is consumed and removed from
    the pool — with ``bag_intersect`` overlap, replayed bit-for-bit.

    Distribution note: the matching is inherently sequential but only
    WITHIN a (doc, sent, label) group, which holds a handful of spans;
    ``applyInPandas`` over those groups keeps the scorer distributed
    while the loop stays bounded.  ``mention_dice_f1`` is the
    window-only approximation (one-to-one rank pairing) for when a
    pure-JVM plan matters more than tie-order fidelity."""
    import pandas as pd

    g = gold_spans.select(
        "doc_id", "sent_id", "label", "begin",
        F.col("text").alias("g_text"), F.lit("g").alias("side"))
    p = pred_spans.select(
        "doc_id", "sent_id", "label", "begin",
        F.col("text").alias("g_text"), F.lit("p").alias("side"))
    both = g.unionByName(p)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        golds = pdf[pdf["side"] == "g"].sort_values("begin")
        preds = list(pdf[pdf["side"] == "p"].sort_values("begin")["g_text"])
        dices = []
        for gt in golds["g_text"]:
            gw = str(gt).split()
            maxred, redidx = -1, 0
            for idx, pt in enumerate(preds):
                red = bag_intersect(str(pt).split(), gw)
                if red > maxred:
                    maxred, redidx = red, idx
            if maxred > 0:
                ts = len(str(preds[redidx]).split())
                del preds[redidx]
                dices.append(2.0 * maxred / (len(gw) + ts))
        return pd.DataFrame({"dice": dices}) if dices else \
            pd.DataFrame({"dice": pd.Series(dtype="float64")})

    matched = both.groupBy("doc_id", "sent_id", "label").applyInPandas(
        match, schema="dice double")
    dice = (matched.agg(F.sum("dice").alias("s")).first()["s"]) or 0.0
    n_gold = gold_spans.count()
    n_pred = pred_spans.count()
    precision = dice / n_pred if n_pred else 0.0
    recall = dice / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    return {"dice_sum": dice, "n_gold": n_gold, "n_pred": n_pred,
            "precision": precision, "recall": recall, "f1": f1}


def confusion_matrix(tagged: DataFrame, gold_col: str = "gold_tag",
                     pred_col: str = "pred_tag",
                     mode: str = "label") -> DataFrame:
    """Token-level confusion counts, reference semantics
    (score.py:253-341):

    - ``mode="label"`` (confusion_label :253-295): only tokens whose
      gold tag is ``O`` or begins a span (``B-``) are counted — the
      span-begin confusion view; gold ``I-`` continuations are skipped.
    - ``mode="token"`` (confusion_token :299-341): every token.

    Both axes strip the BIO prefix (``B-X``/``I-X`` -> ``X``; ``O``
    stays ``O``), exactly as the reference prints its matrix.  Returns
    long-format (gold_label, pred_label, n) — at most L² rows, so the
    pivot/print is a trivial driver-side step while the count itself is
    one map-side-combinable aggregation."""
    if mode not in ("label", "token"):
        raise ValueError(f"mode must be 'label' or 'token', got {mode!r}")
    g, p = F.col(gold_col), F.col(pred_col)
    df = tagged
    if mode == "label":
        df = df.filter(g.startswith("B-") | (g == "O"))
    strip = lambda c: F.regexp_replace(c, "^[BI]-", "")  # noqa: E731
    return (
        df.groupBy(
            strip(g).alias("gold_label"), strip(p).alias("pred_label"))
        .agg(F.count("*").alias("n"))
        .orderBy("gold_label", "pred_label")
    )


def per_class_report(tagged: DataFrame, gold_col: str = "gold_tag",
                     pred_col: str = "pred_tag",
                     exclude: tuple = ("O", "-PAD-", "-OOV-")) -> DataFrame:
    """Per-class token-level precision/recall/F1/support — the
    reference's ``classification_report`` printout (report.py:17-41;
    labels are the raw BIO tags, ``O``/``-PAD-``/``-OOV-`` excluded,
    sorted by name :26,:37).

    One aggregation: each token contributes a (gold-label, tp?) row and
    a (pred-label, predicted) row; the groupBy on label gives tp /
    n_gold / n_pred per class, from which P = tp/n_pred, R = tp/n_gold.
    Returns (label, precision, recall, f1, support) — bounded at the
    label inventory, shuffle on a ~50-value key."""
    g, p = F.col(gold_col), F.col(pred_col)
    pairs = tagged.select(
        F.explode(F.array(
            F.struct(
                g.alias("label"), F.lit(1).alias("n_gold"),
                F.when(p == g, 1).otherwise(0).alias("tp"),
                F.lit(0).alias("n_pred"),
            ),
            F.struct(
                p.alias("label"), F.lit(0).alias("n_gold"),
                F.lit(0).alias("tp"), F.lit(1).alias("n_pred"),
            ),
        )).alias("s")
    ).select("s.*")
    agg = (
        pairs.groupBy("label")
        .agg(F.sum("n_gold").alias("support"), F.sum("tp").alias("tp"),
             F.sum("n_pred").alias("n_pred"))
        .filter(~F.col("label").isin(*exclude))
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0)
    out = agg.select(
        "label", prec.alias("precision"), rec.alias("recall"), "support",
    ).withColumn(
        "f1",
        F.when(F.col("precision") + F.col("recall") > 0,
               2 * F.col("precision") * F.col("recall")
               / (F.col("precision") + F.col("recall"))).otherwise(0.0),
    ).select("label", "precision", "recall", "f1", "support")
    return out.orderBy("label")


def report_summary(report: DataFrame) -> dict:
    """Macro/weighted averages over a ``per_class_report`` frame — the
    classification_report footer rows.  Driver-side over ≤ L rows."""
    rows = report.collect()
    n = len(rows)
    tot = sum(r["support"] for r in rows) or 1
    if not n:
        return {"macro_precision": 0.0, "macro_recall": 0.0, "macro_f1": 0.0,
                "weighted_f1": 0.0, "n_classes": 0}
    return {
        "macro_precision": sum(r["precision"] for r in rows) / n,
        "macro_recall": sum(r["recall"] for r in rows) / n,
        "macro_f1": sum(r["f1"] for r in rows) / n,
        "weighted_f1": sum(r["f1"] * r["support"] for r in rows) / tot,
        "n_classes": n,
    }


def b_cubed_f1(pred_clusters: DataFrame, gold_clusters: DataFrame) -> dict:
    """B-cubed coreference P/R/F1 (Bagga & Baldwin 1998): per mention,
    precision = |pred-cluster ∩ gold-cluster| / |pred-cluster| and
    recall = the same over the gold cluster, averaged over mentions.

    Inputs: (doc_id, event_id, cluster_id) and (doc_id, event_id,
    hopper_id) — only events present on BOTH sides are scored (the
    standard system-mention alignment).  Pure DataFrame aggregation:
    one join + two count windows, no driver loop."""
    p = pred_clusters.select("doc_id", "event_id",
                             F.col("cluster_id").alias("_c"))
    g = gold_clusters.select("doc_id", "event_id",
                             F.col("hopper_id").alias("_h"))
    m = p.join(g, ["doc_id", "event_id"], "inner")
    wc = Window.partitionBy("doc_id", "_c")
    wh = Window.partitionBy("doc_id", "_h")
    wch = Window.partitionBy("doc_id", "_c", "_h")
    per_mention = m.select(
        (F.count("*").over(wch) / F.count("*").over(wc)).alias("_p"),
        (F.count("*").over(wch) / F.count("*").over(wh)).alias("_r"),
    )
    agg = per_mention.agg(F.avg("_p").alias("p"), F.avg("_r").alias("r"),
                          F.count("*").alias("n")).first()
    precision, recall, n = agg["p"] or 0.0, agg["r"] or 0.0, agg["n"]
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "n_mentions": n}
