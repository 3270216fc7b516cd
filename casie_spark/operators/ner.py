"""Derived NER column + BIO encoding + look-back propagation
(SURVEY §2.2 P3, §2.3 J3/J8).

The reference receives token-level NER from Stanford CoreNLP and then
runs three passes over it:

1. ``combineNe_st`` (parseJsontoFeatures.py:167-198): whitelist filter
   against ``selectedNER`` (:164-165), BIO encoding with title-cased
   types, and the version-number context rules (a version-shaped token
   after a Software/System entity or a capitalized unknown becomes
   ``B-Version`` and may retro-tag its predecessor ``B-Software``);
2. ``findNNPNN`` (:899-948): collects common-noun chunks with no NER;
3. ``combineNNNer``/``findnearbyner`` (:951-985): a noun whose class
   gazetteer (org/person/syssoft/device/gpe, :879-884) admits an
   entity type inherits the nearest preceding entity's full BIO tag —
   scanning sentences backwards, each sentence left-to-right.

CoreNLP is not in this container, so ``raw_ner`` derives the initial
types from the same gazetteers/regexes the rule tagger uses (documented
divergence: real deployments can substitute any token-level NER by
providing the raw column).  The three passes are then faithful window
formulations — everything partitions by doc_id, so the whole stage
rides the pipeline's single token-stream exchange.

Reference quirks preserved deliberately:

- in the version rules, ``tokens[x-1]`` at x=0 wraps to the LAST token
  of the sentence (Python negative indexing in the reference);
- look-back assignment requires ``originalText == nn`` where plural
  (NNS) nouns were singularized first — so plural nouns look up a
  type but never receive it; only singular nouns inherit;
- gazetteer membership is case-sensitive on the raw token, and the
  inherited value keeps the source's B-/I- prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..functions.regex import is_cve_token
from ..functions.singular import singular_noun

# (doc, sentence) ordering windows shared by every pass; (doc_id,
# sent_id) partitions satisfy clustering under HashPartitioning(doc_id).
# Built lazily — Window specs need an active SparkSession.
def _w_sent():
    return Window.partitionBy("doc_id", "sent_id").orderBy("token_id")


def _w_sent_all():
    return _w_sent().rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)

# look-back compatibility groups, in the reference's if/elif order
# (combineNNNer, :968-978): first matching gazetteer wins
_COMPAT_GROUPS: list[tuple[str, list[str], list[str]]] = [
    ("org", config.NER_ORG_NOUNS, ["Organization"]),
    ("per", config.NER_PERSON_NOUNS, ["Person"]),
    ("sys", config.NER_SYSSOFT_NOUNS, ["System", "Software"]),
    ("dev", config.NER_DEVICE_NOUNS, ["Device"]),
    ("gpe", config.NER_GPE_NOUNS, ["GPE"]),
]


def _title(t: str) -> str:
    return t[0] + t[1:].lower()


def raw_ner(tokens: DataFrame) -> DataFrame:
    """+ ``_ner_raw``: Stanford-style uppercase entity type or 'O',
    derived from the rule gazetteers/regexes (the CoreNLP substitute).
    Swap this stage for real NER output to reproduce J3's external
    joins exactly."""
    from .tagging import (
        _MONTHS,
        _PERSON_GAZ,
        _VENDOR_GAZ,
        _SYSTEM_GAZ,
    )

    tok = F.col("token")
    low = F.lower(tok)
    weekdays = ["monday", "tuesday", "wednesday", "thursday", "friday",
                "saturday", "sunday"]
    raw = (
        F.when(is_cve_token(tok), "CVE")
        .when(tok.rlike(r"^https?://") | tok.rlike(r"^www\."), "URL")
        .when(tok.rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"), "EMAIL")
        .when(tok.rlike(r"^\$\d"), "MONEY")
        .when(low.isin(_MONTHS + weekdays) | tok.rlike(r"^(19|20)\d\d$"),
              "DATE")
        .when(tok.rlike(r"^\d[\d,]*$"), "NUMBER")
        .when(low.isin(_VENDOR_GAZ), "ORGANIZATION")
        .when(low.isin(_SYSTEM_GAZ), "SOFTWARE")
        .when(low.isin(_PERSON_GAZ), "PERSON")
        .otherwise(F.lit("O"))
    )
    return tokens.withColumn("_ner_raw", raw)


def encode_ner(tokens: DataFrame, raw_col: str = "_ner_raw") -> DataFrame:
    """``combineNe_st`` as window expressions: whitelist filter (P3),
    BIO encoding, and the version context rules -> ``ner`` column."""
    raw = F.col(raw_col)

    # pass 1 — whitelist + BIO.  The reference compares the current
    # RAW type against the previous token's already-encoded tag
    # stripped of its prefix; since encoding happens in order, that is
    # exactly "previous raw type equal (case-insensitive) and kept by
    # the whitelist".  First token of a sentence is always B-.
    kept = raw != "O"
    for_wl = kept & raw.isin(config.NER_WHITELIST)
    title = F.concat(F.upper(F.substring(raw, 1, 1)),
                     F.lower(F.substring(raw, 2, 1000)))
    prev_raw = F.lag(raw, 1).over(_w_sent())
    prev_kept = prev_raw.isNotNull() & (prev_raw != "O") \
        & prev_raw.isin(config.NER_WHITELIST)
    cont = prev_kept & (F.lower(prev_raw) == F.lower(raw))
    pass1 = (
        F.when(for_wl & cont, F.concat(F.lit("I-"), title))
        .when(for_wl, F.concat(F.lit("B-"), title))
        .otherwise(F.lit("O"))
    )
    df = tokens.withColumn("_ner1", pass1)

    # pass 2 — version context rules (:185-198).  tokens[x-1] at x=0
    # wraps to the sentence's LAST token (reference negative-indexing
    # quirk), so "previous" is lag-or-wraparound.
    def prev_of(col: Column, last_expr: Column) -> Column:
        return F.coalesce(F.lag(col, 1).over(_w_sent()), last_expr)

    tok = F.col("token")
    is_ver = tok.rlike(r"^v*\d+\.\d+")  # re.match = anchored prefix
    ner1_type = F.lower(F.substring(F.col("_ner1"), 3, 1000))
    last_tok = F.last(tok).over(_w_sent_all())
    last_ner1 = F.last(F.col("_ner1")).over(_w_sent_all())
    prev_tok = prev_of(tok, last_tok)
    prev_ner1 = prev_of(F.col("_ner1"), last_ner1)
    prev_type = F.lower(F.substring(prev_ner1, 3, 1000))

    a_prev = prev_type.isin("software", "system")
    b_prev = F.lower(prev_tok).startswith("ver")
    c_prev = (prev_ner1 == "O") & F.substring(prev_tok, 1, 1).rlike("[A-Z]")
    self2 = (
        F.when(is_ver & a_prev, "B-Version")
        .when(is_ver & b_prev, "I-Version")
        .when(is_ver & c_prev, "B-Version")
    )

    # retro writes: the NEXT token's rule (b)/(c) firing rewrites THIS
    # token; last write wins over this token's own pass-2 value
    nxt_is_ver = F.lead(is_ver, 1, False).over(_w_sent())
    a_self = ner1_type.isin("software", "system")
    b_self = F.lower(tok).startswith("ver")
    c_self = (F.col("_ner1") == "O") & F.substring(tok, 1, 1).rlike("[A-Z]")
    retro = (
        F.when(nxt_is_ver & ~a_self & b_self, "B-Version")
        .when(nxt_is_ver & ~a_self & ~b_self & c_self, "B-Software")
    )

    # number-after-software fix (:197-198); runs after the elif chain,
    # so it beats self2 but loses to a retro write from the next token
    numfix = F.when(a_prev & (ner1_type == "number"), "B-Version")

    df = df.withColumn("ner", F.coalesce(retro, numfix, self2, F.col("_ner1")))
    return df.drop("_ner1")


def lookback_ner(tokens: DataFrame, ner_col: str = "ner") -> DataFrame:
    """J8: common nouns inherit the nearest preceding compatible
    entity's BIO tag (``combineNNNer``/``findnearbyner``).

    The reference scans sentences from the current one back to the
    document start, each sentence left-to-right, and returns the first
    token whose type is in the noun's compatibility set.  Window form:
    per compatibility group, a packed key (sent_id major, inverted
    token_id, entity code minor) maximized over a range frame ordered
    by sent_id — the range frame includes the whole current sentence,
    exactly like the reference's full-sentence scan.

    Only singular nouns inherit (plural NNS nouns are singularized
    before the ``originalText == nn`` guard, which therefore fails —
    reference quirk preserved; see module docstring)."""
    ner = F.col(ner_col)
    ner_type = F.substring(ner, 3, 1000)  # strip B-/I-

    # entity codes pack the exact BIO string of a potential source
    # token into the key's low bits: (type index)*2 + is_I
    types = sorted({t for _, _, ts in _COMPAT_GROUPS for t in ts})
    type_code = F.lit(None).cast("long")
    for i, t in enumerate(types):
        type_code = F.when(ner_type == t, F.lit(i)).otherwise(type_code)
    is_i = F.when(ner.startswith("I-"), F.lit(1)).otherwise(F.lit(0))
    code = type_code * 2 + is_i  # null when not a compat-typed entity

    # token_id clamped to its 20-bit field — a pathological unsplit
    # page saturates (position ties) instead of corrupting the
    # sent-major bits; sent major
    wr = Window.partitionBy("doc_id").orderBy("sent_id") \
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    tid = F.least(F.col("token_id").cast("long"), F.lit((1 << 20) - 1))
    pos_key = (F.col("sent_id").cast("long") * (1 << 27)
               + ((1 << 20) - 1 - tid) * (1 << 7))

    # noun classification first: case-sensitive raw-token membership,
    # first matching gazetteer wins (if/elif order).  Each noun list
    # appears in the plan exactly ONCE — membership flags land in their
    # own projection and CollapseProject does not inline non-cheap
    # expressions, which keeps the logical-plan string linear in the
    # gazetteer size instead of quadratic (plan-growth guard).
    tok = F.col("token")
    grp = None
    for gname, nouns, _ in _COMPAT_GROUPS:
        c = tok.isin(sorted(set(nouns)))
        grp = F.when(c, gname) if grp is None else grp.when(c, gname)
    # Spark-side "is plural" must agree with singular_noun(); the
    # gazetteers are finite, so enumerate their plural forms instead of
    # re-implementing the rules in SQL
    plural_forms = sorted({
        w for _, nouns, _ in _COMPAT_GROUPS for w in nouns
        if singular_noun(w) is not False
    })
    plural = tok.isin(plural_forms) if plural_forms else F.lit(False)
    df = tokens.withColumn("_nngrp", grp).withColumn("_nnplural", plural)

    # one max-window per compatibility group, materialized as real
    # columns so later expressions reference attributes, not copies
    for gname, _nouns, group_types in _COMPAT_GROUPS:
        in_group = ner_type.isin(group_types)
        key = F.when(code.isNotNull() & in_group, pos_key + code)
        df = df.withColumn(f"_best_{gname}", F.max(key).over(wr))

    # decode a packed key back to the full BIO string
    def decode(best: Column) -> Column:
        c = best % (1 << 7)
        t_idx = (c / 2).cast("int")
        prefix = F.when(c % 2 == 1, "I-").otherwise("B-")
        t_name = F.lit(None).cast("string")
        for i, t in enumerate(types):
            t_name = F.when(t_idx == i, F.lit(t)).otherwise(t_name)
        return F.concat(prefix, t_name)

    inherited = F.lit(None).cast("string")
    for gname, _nouns, _ in _COMPAT_GROUPS:
        best = F.col(f"_best_{gname}")
        inherited = F.when(
            (F.col("_nngrp") == gname) & best.isNotNull(), decode(best)
        ).otherwise(inherited)

    out = F.when(
        (ner == "O") & ~F.col("_nnplural") & inherited.isNotNull(), inherited
    ).otherwise(ner)
    return df.withColumn(ner_col, out).drop(
        "_nngrp", "_nnplural", *[f"_best_{g}" for g, _, _ in _COMPAT_GROUPS]
    )


def with_ner(tokens: DataFrame) -> DataFrame:
    """Full derived-NER stage: raw types -> whitelist/BIO/version
    encoding -> look-back propagation.  Adds ``ner``; drops the raw
    intermediate."""
    return lookback_ner(encode_ner(raw_ner(tokens))).drop("_ner_raw")
