"""Model-inference tagging stage: Arrow-batched ``mapInPandas`` with
broadcast numpy weights — the distributed-inference harness for the
reference's BiLSTM-CRF stages (SURVEY.md §2.10).

The reference loads Keras models once and loops documents sequentially
(link_coref.py:89-119, :1960-1968, :1978).  Here the same contract is a
DataFrame stage:

- weights live in a ``SparkContext.broadcast`` — deserialized once per
  Python worker, reused across all Arrow batches (the reference's
  "load model once" optimization, S5 in SURVEY §2.1);
- inference is numpy matmul over whole Arrow batches (the analog of the
  reference's batched ``model.predict``, nug_arg_detection.py:320),
  followed by ``argmax`` (P5) inside the UDF;
- tokens are dictionary-encoded with a hashed vocab, OOV=1 / PAD=0
  reserved exactly like x2index.py:20-26 (F11);
- the emitted columns are the same tagging contract as ``tag_rules``
  (trigger_tag / arg_tag), so the downstream linking DAG is untouched —
  real BiLSTM-CRF weights slot in by swapping ``TaggerWeights`` and the
  ``_score`` matmul, nothing else.

Because the reference's trained blobs are absent upstream
(.MISSING_LARGE_BLOBS), the shipped weights are *distilled from the
rule tagger*: a linear model whose hashed-unigram weights reproduce the
lexicon/gazetteer decisions.  That keeps the whole path deterministic
and lets tests measure model-vs-rules triple parity end to end.

Scale notes: the stage is embarrassingly parallel over the salted
doc_id partitioning; Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py) so
`batch × dim` activations stay in worker memory regardless of input
size.  BIO continuation is repaired JVM-side afterwards (shared window
logic), so batch boundaries never split a decision.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config

PAD_ID = 0   # x2index.py:20-26 reserves 0/1
OOV_ID = 1
VOCAB_BITS = 16
VOCAB_SIZE = 1 << VOCAB_BITS

TRIGGER_LABELS = ["O"] + list(config.EVENT_SUBTYPES)
ARG_LABELS = ["O", "CVE", "Version", "Money", "Time", "Malware", "PII",
              "Data", "Organization", "System", "Person", "Number",
              "Vulnerability", "Patch"]


def token_id(tok: str) -> int:
    """Hashed dictionary encoding (stable across workers/sessions):
    crc32 of the lowercased token into [2, VOCAB_SIZE)."""
    return 2 + (zlib.crc32(tok.lower().encode("utf-8")) % (VOCAB_SIZE - 2))


@dataclass
class TaggerWeights:
    """Linear scorer per head: logits = W[token_id].  Swap in trained
    matrices (and a richer _score) for real models."""
    w_trigger: np.ndarray  # (VOCAB_SIZE, len(TRIGGER_LABELS)) float32
    w_arg: np.ndarray      # (VOCAB_SIZE, len(ARG_LABELS)) float32
    trigger_labels: list[str] = field(default_factory=lambda: list(TRIGGER_LABELS))
    arg_labels: list[str] = field(default_factory=lambda: list(ARG_LABELS))


def _stemmed_forms(w: str) -> set[str]:
    """Both the raw and stem form — lookups stem the query token, so
    the stem form is the one that matters; the raw form is kept for
    terms whose stem differs (defensive, harmless)."""
    from .tagging import _py_stem

    return {w, _py_stem(w)}


def distill_rule_weights() -> TaggerWeights:
    """Deterministic 'training': write the rule lexicons into the
    weight matrices.  Precedence becomes weight magnitude, mirroring
    the combine() ordering (link_coref.py:1196-1219): lexicon triggers
    outrank general-noun triggers; the argument gazetteer order of
    tag_rules becomes descending magnitudes."""
    wt = np.zeros((VOCAB_SIZE, len(TRIGGER_LABELS)), dtype=np.float32)
    wa = np.zeros((VOCAB_SIZE, len(ARG_LABELS)), dtype=np.float32)
    wt[:, 0] = 1.0  # O bias
    wa[:, 0] = 1.0

    # triggers: earlier EVENT_SUBTYPES win ties, exactly like the
    # prio ordering in tag_rules
    for prio, etype in enumerate(config.EVENT_SUBTYPES):
        col = TRIGGER_LABELS.index(etype)
        score = 100.0 - prio
        for term in sorted(config.WORDSET[etype]):
            for form in _stemmed_forms(term):
                i = token_id(form)
                if wt[i].max() < score:
                    wt[i, 1:] = 0.0
                    wt[i, col] = score
    for etype, nouns in config.GENERAL_NOUNS.items():
        if etype == "general":
            continue
        col = TRIGGER_LABELS.index(etype)
        for term in nouns:
            for form in _stemmed_forms(term):
                i = token_id(form)
                if wt[i].max() < 50.0:
                    wt[i, 1:] = 0.0
                    wt[i, col] = 50.0

    from .tagging import (
        _DATA_GAZ,
        _MALWARE_GAZ,
        _PERSON_GAZ,
        _PII_GAZ,
        _SYSTEM_GAZ,
        _TIME_WORDS,
        _VENDOR_GAZ,
    )

    gaz_by_label = [
        ("Time", _TIME_WORDS), ("Malware", _MALWARE_GAZ), ("PII", _PII_GAZ),
        ("Data", _DATA_GAZ), ("Organization", _VENDOR_GAZ),
        ("System", _SYSTEM_GAZ), ("Person", _PERSON_GAZ),
        ("Vulnerability", config.GENERAL_ARG["Vulnerability"]),
        ("Patch", config.GENERAL_ARG["Patch"]),
    ]
    for rank, (label, terms) in enumerate(gaz_by_label):
        col = ARG_LABELS.index(label)
        score = 90.0 - rank
        for term in terms:
            i = token_id(term)
            if wa[i].max() < score:
                wa[i, 1:] = 0.0
                wa[i, col] = score
    return TaggerWeights(wt, wa)


def tag_model(tokens: DataFrame, weights: TaggerWeights | None = None) -> DataFrame:
    """tokens -> + trigger_tag, arg_tag via broadcast-weight batched
    inference.  Regex/shape argument classes (CVE, Version, Money,
    Number, year) stay JVM-side — a linear unigram model cannot carry a
    regex, and the reference likewise backstops models with rules
    (findargument, link_coref.py:751-786)."""
    spark = tokens.sparkSession
    if weights is None:
        weights = distill_rule_weights()
    bc = spark.sparkContext.broadcast(weights)

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in tokens.dtypes
    ) + ", _m_trig string, _m_arg string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc.value  # one deserialization per worker, reused per batch
        trig_labels = np.array(w.trigger_labels, dtype=object)
        arg_labels = np.array(w.arg_labels, dtype=object)
        from .tagging import _py_stem

        for pdf in batches:
            toks = [t.lower() for t in pdf["token"].astype(str)]
            # trigger head: stem-normalized ids (tag_rules matches the
            # trigger lexicon on exact OR stem form — the reference
            # reaches inflections via w2v similarity,
            # link_coref.py:254-283); argument head: raw ids (the
            # gazetteers match exact lowercase only)
            ids_stem = np.fromiter(
                (token_id(_py_stem(t)) for t in toks),
                dtype=np.int64, count=len(toks),
            )
            ids_raw = np.fromiter(
                (token_id(t) for t in toks), dtype=np.int64, count=len(toks),
            )
            trig_logits = w.w_trigger[ids_stem]     # (batch, L) gather
            arg_logits = w.w_arg[ids_raw]
            trig = trig_labels[trig_logits.argmax(axis=1)]  # P5 argmax
            arg = arg_labels[arg_logits.argmax(axis=1)]
            out = pdf.copy()
            out["_m_trig"] = trig
            out["_m_arg"] = arg
            yield out

    df = tokens.mapInPandas(run, schema=out_schema)
    # mapInPandas emits fresh attribute ids, so any partitioning below
    # it is invisible to Catalyst — the ONE explicit doc_id exchange of
    # the token stream therefore goes ABOVE the (narrow, per-row)
    # inference stage; every window downstream rides it via the
    # clustering subset rule.  Callers must NOT pre-repartition.
    df = df.repartition(F.col("doc_id"))

    # JVM-side shape/regex argument classes + BIO assembly (shared
    # window semantics with tag_rules)
    from ..functions.regex import is_cve_token, is_version_token

    low = F.lower(F.col("token"))
    w = Window.partitionBy("doc_id").orderBy("sent_id", "token_id")
    same_sent = F.lag("sent_id", 1, -1).over(w) == F.col("sent_id")
    prev = F.when(same_sent, F.lag(low, 1, "").over(w)).otherwise(F.lit(""))
    is_money = F.col("token").rlike(r"^\$\d") | (
        low.isin("million", "billion", "thousand")
        & same_sent
        & F.lag(F.col("token"), 1, "").over(w).rlike(r"^\$?\d")
    )
    is_number = F.col("token").rlike(r"^\d[\d,]*$") & ~prev.rlike(r"^(cve|v)$")
    is_year = F.col("token").rlike(r"^(19|20)\d\d$")

    arg_type = (
        F.when(is_cve_token(F.col("token")), "CVE")
        .when(is_version_token(F.col("token")) & ~F.col("token").rlike(r"^\d+$"),
              "Version")
        .when(is_money, "Money")
        .when(is_year, "Time")
        .when(F.col("_m_arg") != "O", F.col("_m_arg"))
        .when(is_number, "Number")
        .otherwise(F.lit(None))
    )
    df = df.withColumn("_arg", arg_type)

    # general-noun fallback by per-doc dominant trigger type — the
    # reference applies this RULE after model predictions too
    # (generalnountrigger/scoreH, link_coref.py:898-920, :941-945),
    # so it belongs to both tagging providers.  Packed-key window over
    # the existing doc_id partitioning (shared with tag_rules) — no
    # per-doc frame is ever built or broadcast.
    from .tagging import with_dominant_trigger

    df = df.withColumn(
        "_trig_t", F.when(F.col("_m_trig") != "O", F.col("_m_trig"))
    )
    df = with_dominant_trigger(df, "_trig_t").drop("_trig_t")
    df = df.withColumn(
        "trigger_tag",
        F.when(F.col("_arg").isNotNull(), F.lit("O"))
        .when(F.col("_m_trig") != "O", F.concat(F.lit("B-"), F.col("_m_trig")))
        .when(low.isin(config.GENERAL_NOUNS["general"])
              & F.col("_dominant").isNotNull(),
              F.concat(F.lit("B-"), F.col("_dominant")))
        .otherwise(F.lit("O")),
    ).drop("_dominant")
    prev_arg = F.when(same_sent, F.lag("_arg", 1).over(w))
    df = df.withColumn(
        "arg_tag",
        F.when(F.col("_arg").isNull(), F.lit("O"))
        .when(prev_arg.eqNullSafe(F.col("_arg")), F.concat(F.lit("I-"), F.col("_arg")))
        .otherwise(F.concat(F.lit("B-"), F.col("_arg"))),
    )
    return df.drop("_m_trig", "_m_arg", "_arg")
