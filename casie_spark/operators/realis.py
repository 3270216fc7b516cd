"""Realis classification (SURVEY §2.10 M4): label each event nugget
Actual / Generic / Other.

Reference shape (rebuilt, not ported): realis is decided over the
nugget plus a ±7-token context window (prepare.features_realis_sentence,
prepare.py:261-285 — W2 in SURVEY §2.5) in TWO binary passes —
Generic-vs-NotGeneric, then Actual-vs-Other on the remainder
(realis_identify.py:44-57 label folding; two-pass orchestration
link_coref.py:2017-2026) — and the predictions are joined back onto
events by their character offset (realisassign link_coref.py:1459-1483,
J6 in SURVEY §2.3).

Here:

- ``realis_context`` materializes the W2 window as an ordered token
  array per event (a range join events×tokens on the doc-partitioned
  stream + one groupBy — events are ~100x smaller than tokens);
- ``classify_realis_rules`` is the model-free provider: deterministic
  lexical cues for the two passes (modal/conditional cues -> Other,
  habitual/generic cues or plural trigger without specifics ->
  Generic, else Actual).  The reference's dense-softmax weights are
  absent upstream (.MISSING_LARGE_BLOBS); a trained model slots in
  behind the same (doc_id, event_id -> realis) contract exactly like
  operators.model_tagger does for tagging;
- ``with_realis`` composes both and joins the prediction back (J6).

All JVM column expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTEXT_WIDTH = 7  # prepare.py:261-285: lower/upper = y ± 7

# pass-1 cues: habitual/generic statements
GENERIC_CUES = ["often", "usually", "typically", "generally", "commonly",
                "common", "many", "most", "increasingly", "rising"]
# pass-2 cues: hypothetical / future / conditional
OTHER_CUES = ["could", "would", "may", "might", "can", "should", "will",
              "if", "unless", "potential", "potentially", "possible",
              "planned", "risk", "wants", "trying", "attempt"]


def realis_context(events: DataFrame, tagged: DataFrame,
                   width: int = CONTEXT_WIDTH) -> DataFrame:
    """events + tokens -> (doc_id, event_id, ctx) with ctx = the
    lowercased tokens within ±width of the nugget's first token, in
    sentence order (the W2 window)."""
    ev = events.select(
        F.col("doc_id").alias("_e_doc"), "event_id",
        F.col("sent_id").alias("_e_sent"),
        F.col("first_token_id").alias("_e_tid"),
    )
    toks = tagged.select(
        "doc_id", "sent_id", "token_id", F.lower("token").alias("_w")
    )
    j = toks.join(
        ev,
        (F.col("doc_id") == F.col("_e_doc"))
        & (F.col("sent_id") == F.col("_e_sent"))
        & (F.col("token_id") >= F.col("_e_tid") - width)
        & (F.col("token_id") <= F.col("_e_tid") + width),
        "inner",
    )
    return (
        j.groupBy("doc_id", "event_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("token_id", "_w"))
            ).alias("_ord"),
        )
        .select(
            "doc_id", "event_id",
            F.transform("_ord", lambda s: s["_w"]).alias("ctx"),
        )
    )


def _has_any(ctx, words):
    return F.size(F.array_intersect(ctx, F.array(*[F.lit(w) for w in words]))) > 0


def classify_realis_rules(ctx_df: DataFrame, events: DataFrame) -> DataFrame:
    """(doc_id, event_id, realis) via the two-pass cue rules.

    Pass 1 Generic-vs-NotGeneric: habitual cues, or a plural trigger
    with no number/date anywhere in the window (a generic plural claim
    has no specifics).  Pass 2 Actual-vs-Other on the remainder:
    modal/conditional cues -> Other, else Actual."""
    ev = events.select(
        "doc_id", "event_id", F.lower(F.col("text")).alias("_trig"),
    )
    df = ctx_df.join(ev, ["doc_id", "event_id"], "inner")
    has_digit = F.exists("ctx", lambda w: w.rlike(r"\d"))
    plural_trig = F.col("_trig").rlike(r"[^s]s$")
    generic = _has_any(F.col("ctx"), GENERIC_CUES) | (plural_trig & ~has_digit)
    other = _has_any(F.col("ctx"), OTHER_CUES)
    return df.select(
        "doc_id", "event_id",
        F.when(generic, "Generic")
        .when(other, "Other")
        .otherwise("Actual")
        .alias("realis"),
    )


def with_realis(events: DataFrame, tagged: DataFrame,
                provider=classify_realis_rules) -> DataFrame:
    """events -> + realis (J6 assignment join).  ``provider`` is the
    classification stage; swap in a broadcast-weight model provider
    with the same signature for trained inference."""
    preds = provider(realis_context(events, tagged), events)
    out = events.join(preds, ["doc_id", "event_id"], "left")
    return out.withColumn("realis", F.coalesce("realis", F.lit("Actual")))
