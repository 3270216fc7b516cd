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


def apply_forced_triggers(tagged: DataFrame) -> DataFrame:
    """R1+R6: recover a trigger in sentences holding must-have args."""
    lab = F.when(F.col("arg_tag") == "O", None).otherwise(
        F.substring("arg_tag", 3, 1000)
    )
    trg = F.when(F.col("trigger_tag") == "O", None).otherwise(
        F.substring("trigger_tag", 3, 1000)
    )
    toks = tagged.withColumn("_alab", lab).withColumn("_tlab", trg)

    sent = toks.groupBy("doc_id", "sent_id").agg(
        F.collect_set("_alab").alias("argset"),
        F.collect_set("_tlab").alias("trigset"),
    )

    needed = None
    for prio, etype, anchors, require_all, excluded in FORCED_RULES:
        cond = F.lit(True)
        for a in anchors:
            c = F.array_contains("argset", a)
            cond = (cond & c) if require_all else cond
        if not require_all:
            any_c = F.lit(False)
            for a in anchors:
                any_c = any_c | F.array_contains("argset", a)
            cond = any_c
        if excluded:
            cond = cond & ~F.array_contains("argset", excluded)
        cond = cond & ~F.array_contains("trigset", etype)
        piece = sent.filter(cond).select(
            "doc_id", "sent_id",
            F.lit(prio).alias("prio"),
            F.lit(etype).alias("etype"),
            F.lit(anchors[0]).alias("anchor1"),
            F.lit(anchors[1] if len(anchors) > 1 else anchors[0]).alias("anchor2"),
        )
        needed = piece if needed is None else needed.unionByName(piece)

    # anchor position: first token whose arg label matches (reference
    # takes the first Money/Patch/... token, link_coref.py:1038-1042)
    anchors = (
        toks.join(
            needed.select(
                F.col("doc_id").alias("_r_doc"), F.col("sent_id").alias("_r_sent"),
                "prio", "etype", "anchor1", "anchor2",
            ),
            (F.col("doc_id") == F.col("_r_doc"))
            & (F.col("sent_id") == F.col("_r_sent"))
            & ((F.col("_alab") == F.col("anchor1")) | (F.col("_alab") == F.col("anchor2"))),
            "inner",
        )
        .groupBy("doc_id", "sent_id", "prio", "etype")
        .agg(F.min("token_id").alias("anchor_pos"))
    )

    # candidate trigger positions: free tokens ('O'/'O') in the same
    # sentence; prefer verb-shaped, nearest to the anchor, before it on
    # ties; fallback to the nearest free token.
    free = toks.filter((F.col("arg_tag") == "O") & (F.col("trigger_tag") == "O")).select(
        F.col("doc_id").alias("_f_doc"), F.col("sent_id").alias("_f_sent"),
        F.col("token_id").alias("_f_tid"),
        F.lower("token").rlike(_VERBISH).alias("_f_verbish"),
        F.col("token").rlike(r"^\w").alias("_f_wordlike"),
    )
    pick = (
        anchors.join(
            free,
            (F.col("doc_id") == F.col("_f_doc"))
            & (F.col("sent_id") == F.col("_f_sent")),
            "inner",
        )
        .filter(F.col("_f_wordlike"))
        .groupBy("doc_id", "sent_id", "prio", "etype")
        .agg(
            F.min_by(
                F.col("_f_tid"),
                F.struct(
                    (~F.col("_f_verbish")).cast("int").alias("nv"),
                    F.abs(F.col("_f_tid") - F.col("anchor_pos")).alias("d"),
                    (F.col("_f_tid") > F.col("anchor_pos")).cast("int").alias("after"),
                    F.col("_f_tid").alias("t"),
                ),
            ).alias("trig_pos"),
        )
    )
    # one forced trigger per token: lowest rule priority wins
    wtok = Window.partitionBy("doc_id", "sent_id", "trig_pos").orderBy("prio")
    pick = (
        pick.withColumn("_rk", F.row_number().over(wtok)).filter("_rk=1")
        .select(
            F.col("doc_id").alias("_p_doc"), F.col("sent_id").alias("_p_sent"),
            F.col("trig_pos"), F.col("etype").alias("_p_etype"),
        )
    )

    out = tagged.join(
        pick,
        (F.col("doc_id") == F.col("_p_doc"))
        & (F.col("sent_id") == F.col("_p_sent"))
        & (F.col("token_id") == F.col("trig_pos")),
        "left",
    ).drop("_p_doc", "_p_sent", "trig_pos")
    # R6: merge only where the model/lexicon left 'O' (combine
    # link_coref.py:1196-1206)
    return out.withColumn(
        "trigger_tag",
        F.when(
            (F.col("trigger_tag") == "O") & F.col("_p_etype").isNotNull()
            & (F.col("arg_tag") == "O"),
            F.concat(F.lit("B-"), F.col("_p_etype")),
        ).otherwise(F.col("trigger_tag")),
    ).drop("_p_etype")


def apply_compatibility_sweep(tagged: DataFrame) -> DataFrame:
    """R5 (compatible, link_coref.py:1128-1187): clear argument tags of
    sentences whose +/-1-sentence neighborhood holds no trigger."""
    trig_sents = (
        tagged.filter(F.col("trigger_tag") != "O")
        .select("doc_id", "sent_id")
        .distinct()
    )
    # sentences with a trigger at s-1, s, s+1
    cover = None
    for d in (-1, 0, 1):
        piece = trig_sents.select(
            "doc_id", (F.col("sent_id") + d).alias("sent_id")
        )
        cover = piece if cover is None else cover.unionByName(piece)
    cover = cover.distinct().withColumn("_has_trig", F.lit(True))

    out = tagged.join(cover, ["doc_id", "sent_id"], "left")
    out = out.withColumn(
        "arg_tag",
        F.when(F.col("_has_trig").isNull(), F.lit("O")).otherwise(F.col("arg_tag")),
    )
    if "role" in tagged.columns:
        out = out.withColumn(
            "role",
            F.when(F.col("_has_trig").isNull(), F.lit(None).cast("string"))
            .otherwise(F.col("role")),
        )
    return out.drop("_has_trig")


def apply_rules(tagged: DataFrame) -> DataFrame:
    """R1 -> R5 in reference order (recheck then compatible,
    link_coref.py:1987-1990)."""
    return apply_compatibility_sweep(apply_forced_triggers(tagged))
