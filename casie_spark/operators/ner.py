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
    # every regex is gated behind a cheap scalar test (startswith /
    # contains / translate char-scan) so the typical all-letters token
    # evaluates ZERO regexes — ungated, this chain ran ~8 regex
    # matches on every one of the stream's tokens and cost ~40%
    # pipeline throughput (gates don't change semantics: each gate is
    # implied by its regex)
    has_digit = tok != F.translate(tok, "0123456789", "")
    raw = (
        F.when(tok.startswith("CVE-") & is_cve_token(tok), "CVE")
        .when((tok.startswith("http") & tok.rlike(r"^https?://"))
              | tok.startswith("www."), "URL")
        .when(tok.contains("@")
              & tok.rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"), "EMAIL")
        .when(tok.startswith("$") & tok.rlike(r"^\$\d"), "MONEY")
        .when(low.isin(_MONTHS + weekdays)
              | (has_digit & tok.rlike(r"^(19|20)\d\d$")), "DATE")
        .when(has_digit & tok.rlike(r"^\d[\d,]*$"), "NUMBER")
        .when(low.isin(_VENDOR_GAZ), "ORGANIZATION")
        .when(low.isin(_SYSTEM_GAZ), "SOFTWARE")
        .when(low.isin(_PERSON_GAZ), "PERSON")
        .otherwise(F.lit("O"))
    )
    return tokens.withColumn("_ner_raw", raw)


def encode_ner(tokens: DataFrame, raw_col: str = "_ner_raw") -> DataFrame:
    """``combineNe_st`` as window expressions: whitelist filter (P3),
    BIO encoding, and the version context rules -> ``ner`` column.

    Perf shape: every non-trivial per-row expression (whitelist
    membership, title case, version regex, capitalization tests) is
    materialized as a cheap boolean/string COLUMN in a codegen'd
    projection first; the window pass then only lags/leads those
    columns.  WindowExec evaluates its input expressions interpreted,
    per row, per expression — feeding it the raw string machinery
    directly cost ~2x this stage's runtime."""
    raw = F.col(raw_col)
    tok = F.col("token")

    def _is_upper(first_char: Column) -> Column:
        return (first_char >= "A") & (first_char <= "Z")

    # pass 1 — whitelist + BIO.  The reference compares the current
    # RAW type against the previous token's already-encoded tag
    # stripped of its prefix; since encoding happens in order, that is
    # exactly "previous raw type equal (case-insensitive) and kept by
    # the whitelist".  First token of a sentence is always B-.
    _has_digit = tok != F.translate(tok, "0123456789", "")
    df = (
        tokens
        .withColumn("_wl", (raw != "O") & raw.isin(config.NER_WHITELIST))
        .withColumn("_title", F.concat(F.upper(F.substring(raw, 1, 1)),
                                       F.lower(F.substring(raw, 2, 1000))))
        .withColumn("_rawlow", F.lower(raw))
        # pass-2 inputs, precomputed here so the same projection
        # carries them (regex gated behind a digit char-scan;
        # re.match = anchored prefix)
        .withColumn("_isver", _has_digit & tok.rlike(r"^v*\d+\.\d+"))
        .withColumn("_bv", F.lower(tok).startswith("ver"))
        .withColumn("_cap", _is_upper(F.substring(tok, 1, 1)))
    )
    prev_wl = F.lag("_wl", 1, False).over(_w_sent())
    prev_rawlow = F.lag("_rawlow", 1).over(_w_sent())
    cont = prev_wl & prev_rawlow.eqNullSafe(F.col("_rawlow"))
    pass1 = (
        F.when(F.col("_wl") & cont, F.concat(F.lit("I-"), F.col("_title")))
        .when(F.col("_wl"), F.concat(F.lit("B-"), F.col("_title")))
        .otherwise(F.lit("O"))
    )
    # _wl/_title/_rawlow are consumed by pass1; drop them here so they
    # don't flow through the pass-2 window buffers
    df = df.withColumn("_ner1", pass1).drop("_wl", "_title", "_rawlow")

    # pass-2 self predicates over the encoded tag, again as columns
    df = (
        df.withColumn("_nt", F.lower(F.substring(F.col("_ner1"), 3, 1000)))
        .withColumn("_av", F.col("_nt").isin("software", "system"))
        .withColumn("_cv", (F.col("_ner1") == "O") & F.col("_cap"))
        .drop("_cap")
    )

    # pass 2 — version context rules (:185-198).  tokens[x-1] at x=0
    # wraps to the sentence's LAST token (reference negative-indexing
    # quirk), so "previous" is lag-or-wraparound.
    def prev_of(name: str) -> Column:
        return F.coalesce(F.lag(name, 1).over(_w_sent()),
                          F.last(name).over(_w_sent_all()))

    is_ver = F.col("_isver")
    a_prev = prev_of("_av")
    b_prev = prev_of("_bv")
    c_prev = prev_of("_cv")
    self2 = (
        F.when(is_ver & a_prev, "B-Version")
        .when(is_ver & b_prev, "I-Version")
        .when(is_ver & c_prev, "B-Version")
    )

    # retro writes: the NEXT token's rule (b)/(c) firing rewrites THIS
    # token; last write wins over this token's own pass-2 value
    nxt_is_ver = F.lead("_isver", 1, False).over(_w_sent())
    retro = (
        F.when(nxt_is_ver & ~F.col("_av") & F.col("_bv"), "B-Version")
        .when(nxt_is_ver & ~F.col("_av") & ~F.col("_bv") & F.col("_cv"),
              "B-Software")
    )

    # number-after-software fix (:197-198); runs after the elif chain,
    # so it beats self2 but loses to a retro write from the next token
    numfix = F.when(a_prev & (F.col("_nt") == "number"), "B-Version")

    df = df.withColumn("ner", F.coalesce(retro, numfix, self2, F.col("_ner1")))
    return df.drop("_ner1", "_isver", "_bv", "_nt", "_av", "_cv")


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

    # one pre-window projection computing ONE packed LONG key per
    # compatibility group (null off-group), then one Window node with
    # the five running maxes over those longs.  Two perf rules at
    # work: (a) WindowExec evaluates its input expressions interpreted
    # per row, so keys must be precomputed codegen-side; (b) WindowExec
    # buffers whole partitions, so every byte flowing THROUGH it costs
    # memory bandwidth — the noun-classification columns are computed
    # AFTER the windows (they don't feed them), and the key columns are
    # dropped right above.  The first formulation (strings + per-key
    # machinery through the buffer) cost ~2x this stage.
    tok = F.col("token")
    df = tokens
    for gname, _nouns, group_types in _COMPAT_GROUPS:
        df = df.withColumn(
            f"_k_{gname}",
            F.when(code.isNotNull() & ner_type.isin(group_types),
                   pos_key + code),
        )
    for gname, _nouns, _t in _COMPAT_GROUPS:
        df = df.withColumn(f"_best_{gname}",
                           F.max(f"_k_{gname}").over(wr))
    df = df.drop(*[f"_k_{g}" for g, _, _ in _COMPAT_GROUPS])

    # noun classification (post-window): case-sensitive raw-token
    # membership, first matching gazetteer wins (if/elif order).  Each
    # noun list appears in the plan exactly ONCE — membership flags
    # land in their own projection and CollapseProject does not inline
    # non-cheap expressions (plan-growth guard).
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
    df = df.withColumn("_nngrp", grp).withColumn("_nnplural", plural)

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
        "_nngrp", "_nnplural", "_lb_code", "_lb_pos", "_lb_nt",
        *[f"_best_{g}" for g, _, _ in _COMPAT_GROUPS]
    )


def combine_external_ner(tokens: DataFrame,
                         wk1: DataFrame | None = None,
                         wk2: DataFrame | None = None,
                         casie: DataFrame | None = None,
                         dbp: DataFrame | None = None) -> DataFrame:
    """J3: external-KB NER columns (``combineExtNe``,
    parseJsontoFeatures.py:232-256).  Each source is an annotation
    table (doc_id, begin, token, ne) matched on exact character offset
    AND surface — a plain equi-join on (doc_id, begin, token); AQE
    broadcasts curated doc-scale tables and shuffle-joins crawl-scale
    ones.

    Column mapping preserves the reference's naming (wk1->``finerner``,
    wk2->``finerner2``, casie->``wk_ner``, dbp->``db_ner``) and its
    default quirk: finerner/wk_ner/db_ner default to 'O' but
    ``finerner2`` is only set on a match (null otherwise — the
    reference never initializes that key)."""
    specs = [("finerner", wk1, "O"), ("finerner2", wk2, None),
             ("wk_ner", casie, "O"), ("db_ner", dbp, "O")]
    df = tokens
    for name, kb, default in specs:
        if kb is None:
            df = df.withColumn(name, F.lit(default).cast("string"))
            continue
        k = kb.select(
            F.col("doc_id").alias("_k_doc"),
            F.col("begin").alias("_k_begin"),
            F.col("token").alias("_k_tok"),
            F.col("ne").alias(f"_k_{name}"),
        ).dropDuplicates(["_k_doc", "_k_begin", "_k_tok"])
        df = df.join(
            k,
            (F.col("doc_id") == F.col("_k_doc"))
            & (F.col("begin") == F.col("_k_begin"))
            & (F.col("token") == F.col("_k_tok")),
            "left",
        ).drop("_k_doc", "_k_begin", "_k_tok")
        col = F.col(f"_k_{name}")
        df = df.withColumn(
            name, col if default is None else F.coalesce(col, F.lit(default))
        ).drop(f"_k_{name}")
    return df


def with_ner(tokens: DataFrame) -> DataFrame:
    """Full derived-NER stage: raw types -> whitelist/BIO/version
    encoding -> look-back propagation.  Adds ``ner``; drops the raw
    intermediate."""
    return lookback_ner(encode_ner(raw_ner(tokens))).drop("_ner_raw")
