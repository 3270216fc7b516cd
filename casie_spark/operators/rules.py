"""Rule post-processing sweeps R1-R7 (SURVEY.md section 2.11).

Reference semantics and their disposition here:

- R1 must-have-argument => force trigger (recheck, reference
  code/link_coref.py:1027-1126): a sentence containing
  Money+PaymentMethod / Patch / Vulnerability(without Patch) /
  Data-or-PII arguments but no Ransom / PatchVulnerability /
  DiscoverVulnerability / Databreach trigger gets one recovered.  The
  reference places it via the dependency-tree governor / nearest-verb
  search (findtrigger :788-896) over CoreNLP parses; v1 has no parser,
  so the DETERMINISTIC APPROXIMATION is: nearest verb-shaped token
  (suffix heuristic) to the anchoring argument, preferring the token
  before it; fallback: the token immediately preceding the argument.
  A trained tagger or parser slots in behind the same column contract.
- R2 trigger recovery via similarity/general nouns (:898-1025): the
  general-noun + per-doc histogram branch is implemented in
  operators.tagging.tag_rules (dominant-type general nouns); the
  dep-tree verb branch is part of the R1 approximation above.
- R3 free-argument recovery (findargument :751-786): Money/Time/
  general-noun arguments are tagged unconditionally by tag_rules, which
  subsumes the recovery (the reference only needed it because its
  model tagger could miss them).
- R4 trigger/argument conflict -> argument wins (:613-614): applied in
  both taggers.
- R5 compatibility sweep (compatible :1128-1187): a sentence whose
  +/-1-sentence neighborhood contains NO trigger of any type has all
  its argument tags cleared.
- R6 combine (:1189-1221): recovered triggers merge into trigger_tag
  only where it is 'O' (precedence handled by rule priority), and the
  I-without-B repair lives in the shared span assembler.
- R7 roleassign: operators.roles.

Execution shape (the 100 TB consideration): both sweeps are pure
WINDOW computations over the token stream — sentence sets via
``collect_set`` windows, the trigger-position choice via a packed-key
``min`` window, the ±1-sentence coverage via ``rangeBetween(-1, 1)``
on sent_id.  No self-joins, no aggregation+join-back, no repeated
references to the input: the whole R1+R5 pass is ONE pass over data
already hash-partitioned by doc_id (HashPartitioning(doc_id) satisfies
the (doc_id, sent_id) window clustering — subset rule — so Catalyst
inserts sorts, never a shuffle).  An earlier join-based formulation
re-executed the upstream tagging DAG per reference and quadrupled
driver plan analysis; this version is both faster and scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (priority, forced event type, anchor argument types, require-all,
#  excluded argument type) — order mirrors recheck link_coref.py:1036-1068
FORCED_RULES = [
    (0, "Ransom", ["Money", "PaymentMethod"], True, None),
    (1, "PatchVulnerability", ["Patch"], True, None),
    (2, "DiscoverVulnerability", ["Vulnerability"], True, "Patch"),
    (3, "Databreach", ["Data", "PII"], False, None),
]

_VERBISH = r"(ed|ing|es|ize|ise|ack|eal)$"

# packed candidate sort key: (not-verbish, |dist|, after-anchor, tid)
# lexicographic via bit fields; token_id < 2^19 per sentence is safe
_TID_BITS = 19
_AFTER_SHIFT = _TID_BITS
_DIST_SHIFT = _TID_BITS + 1
_NV_SHIFT = _DIST_SHIFT + 20


def apply_forced_triggers(tagged: DataFrame) -> DataFrame:
    """R1+R6: recover a trigger in sentences holding must-have args.
    Single window pass per sentence; see module docstring."""
    w_sent = Window.partitionBy("doc_id", "sent_id")

    lab = F.when(F.col("arg_tag") == "O", None).otherwise(
        F.substring("arg_tag", 3, 1000)
    )
    trg = F.when(F.col("trigger_tag") == "O", None).otherwise(
        F.substring("trigger_tag", 3, 1000)
    )
    df = tagged.withColumn("_alab", lab).withColumn("_tlab", trg)
    df = df.withColumn("_argset", F.collect_set("_alab").over(w_sent))
    df = df.withColumn("_trigset", F.collect_set("_tlab").over(w_sent))

    # candidate trigger tokens: free ('O'/'O') word-like; packed order
    # key (verbish first, nearest to anchor, before-anchor on ties)
    free = (F.col("arg_tag") == "O") & (F.col("trigger_tag") == "O") \
        & F.col("token").rlike(r"^\w")
    verbish = F.lower("token").rlike(_VERBISH)

    pick_cols = []
    for prio, etype, anchors, require_all, excluded in FORCED_RULES:
        if require_all:
            need = F.lit(True)
            for a in anchors:
                need = need & F.array_contains("_argset", a)
        else:
            need = F.lit(False)
            for a in anchors:
                need = need | F.array_contains("_argset", a)
        if excluded:
            need = need & ~F.array_contains("_argset", excluded)
        need = need & ~F.array_contains("_trigset", etype)

        # anchor position: first token carrying an anchor label
        # (reference takes the first such token, link_coref.py:1038-1042)
        is_anchor = F.col("_alab").isin(anchors)
        anchor_pos = F.min(F.when(is_anchor, F.col("token_id"))).over(w_sent)

        # clamp both bit fields so a pathological unsplit "sentence"
        # (>524k tokens) saturates its field instead of corrupting the
        # higher-order ones; ordering within such a page degrades to
        # ties, which the min() still breaks deterministically
        tid = F.least(F.col("token_id").cast("long"),
                      F.lit((1 << _TID_BITS) - 1))
        dist = F.least(F.abs(F.col("token_id") - anchor_pos).cast("long"),
                       F.lit((1 << 20) - 1))
        key = (
            (~verbish).cast("long") * (1 << _NV_SHIFT)
            + dist * (1 << _DIST_SHIFT)
            + (F.col("token_id") > anchor_pos).cast("long") * (1 << _AFTER_SHIFT)
            + tid
        )
        best = F.min(F.when(free & need, key)).over(w_sent)
        pick_cols.append(
            (F.when(need, best % (1 << _TID_BITS))).alias(f"_pick{prio}")
        )

    df = df.select("*", *pick_cols)

    # R6 merge: lowest-priority rule whose pick lands on this token
    # wins; only where both tags are 'O' (combine, :1196-1206)
    forced = F.lit(None).cast("string")
    for prio, etype, _, _, _ in reversed(FORCED_RULES):
        forced = F.when(
            F.col(f"_pick{prio}") == F.col("token_id"), F.lit(etype)
        ).otherwise(forced)
    df = df.withColumn(
        "trigger_tag",
        F.when(
            (F.col("trigger_tag") == "O") & (F.col("arg_tag") == "O")
            & forced.isNotNull(),
            F.concat(F.lit("B-"), forced),
        ).otherwise(F.col("trigger_tag")),
    )
    return df.drop("_alab", "_tlab", "_argset", "_trigset",
                   *[f"_pick{p}" for p, *_ in FORCED_RULES])


def sentence_event_scores(tagged: DataFrame) -> DataFrame:
    """A3: per-sentence event-type score from argument compatibility
    (``score``, reference link_coref.py:925-939): for each event type,
    the number of argument mentions in the sentence whose entity type
    the Pair table admits; plus ``needs_noun`` — True when no
    Person/Organization argument is present (the reference's NeedVerb
    check deciding whether noun triggers are acceptable).

    Returns (doc_id, sent_id, eventtype, score, needs_noun), one row
    per event type with score > 0 (the reference keeps only those in
    ``event_w_score_arg``).  Shape: span assembly (windows on the
    existing doc_id partitioning) + a ~100-row broadcast Pair join +
    one sentence-level aggregation."""
    from .. import config
    from .spans import assemble_spans

    spark = tagged.sparkSession
    spans = assemble_spans(tagged, "arg_tag").select(
        "doc_id", "sent_id", "label")
    pair = spark.createDataFrame(
        [(sub, a) for sub, args_ in config.PAIR.items()
         for a in sorted(set(args_))],
        "eventtype string, label string",
    )
    scores = (
        spans.join(F.broadcast(pair), "label")
        .groupBy("doc_id", "sent_id", "eventtype")
        .agg(F.count("*").alias("score"))
    )
    need = spans.groupBy("doc_id", "sent_id").agg(
        (~F.max(F.col("label").isin("Person", "Organization")))
        .alias("needs_noun")
    )
    return scores.join(need, ["doc_id", "sent_id"])


def apply_compatibility_sweep(tagged: DataFrame) -> DataFrame:
    """R5 (compatible, link_coref.py:1128-1187): clear argument tags of
    sentences whose +/-1-sentence neighborhood holds no trigger.
    Implemented as a range window on sent_id — no self-join."""
    w_sent = Window.partitionBy("doc_id", "sent_id")
    w_range = (
        Window.partitionBy("doc_id").orderBy("sent_id").rangeBetween(-1, 1)
    )
    out = tagged.withColumn(
        "_has_trig", F.max((F.col("trigger_tag") != "O").cast("int")).over(w_sent)
    )
    out = out.withColumn("_covered", F.max("_has_trig").over(w_range) == 1)
    out = out.withColumn(
        "arg_tag",
        F.when(~F.col("_covered"), F.lit("O")).otherwise(F.col("arg_tag")),
    )
    if "role" in tagged.columns:
        out = out.withColumn(
            "role",
            F.when(~F.col("_covered"), F.lit(None).cast("string"))
            .otherwise(F.col("role")),
        )
    return out.drop("_covered", "_has_trig")


def apply_rules(tagged: DataFrame) -> DataFrame:
    """R1 -> R5 in reference order (recheck then compatible,
    link_coref.py:1987-1990).  Both sweeps are window passes over the
    same doc_id partitioning — composing them stays one narrow plan,
    no stage barrier needed."""
    return apply_compatibility_sweep(apply_forced_triggers(tagged))
