"""End-to-end DAG: documents -> tokens -> tags -> spans -> events/args
-> roles -> triples.

The reference runs this as a sequential per-document Python loop
(link_coref.py:1954-2056); here it is one DataFrame plan.  The
per-document loop becomes partition parallelism: documents are
salt-repartitioned by url hash before the tokenizer (the only Arrow
stage) so Zipf-skewed domains cannot produce straggler partitions at
web scale (BASELINE.json north_rule "salted-key repartitioned").
Everything after tokenization partitions naturally by doc_id through
the window/join operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import materialize
from .operators.linking import extract_arguments, extract_events, link
from .operators.roles import assign_roles
from .operators.rules import apply_rules
from .operators.tagging import tag_gold_replay, tag_rules
from .operators.tokenizer import tokenize

TRIPLE_COLUMNS = [
    "doc_id", "subj", "pred", "obj", "event_subtype", "realis",
    "event_id", "event_begin", "arg_begin", "confidence",
]


def salt_repartition(df: DataFrame, key: str = "url", n: int | None = None) -> DataFrame:
    """Hash-salted repartition defusing hot-domain skew (SURVEY.md
    section 4 item 1).  xxhash64 of the full key spreads rows of one
    domain uniformly; n defaults to spark.sql.shuffle.partitions."""
    if n:
        return df.repartition(n, F.xxhash64(F.col(key)))
    return df.repartition(F.xxhash64(F.col(key)))


def tagged_tokens(documents: DataFrame, id_col: str = "url",
                  mode: str = "rules", gold=None) -> DataFrame:
    """documents -> tagged token table (the model-stage column contract).

    One explicit hash repartition on doc_id right after tokenization is
    the ONLY full shuffle of the token stream: every downstream window,
    groupBy and join is keyed on doc_id (+ finer sort keys), and
    HashPartitioning(doc_id) satisfies clustering on any superset of
    keys, so Catalyst reuses this exchange for the whole linking DAG
    (sorts instead of shuffles).
    """
    docs = salt_repartition(documents, id_col)
    toks = tokenize(docs, id_col=id_col).repartition(F.col("doc_id"))
    # The token table is referenced by several downstream branches
    # (histogram, spans x2, nearest-trigger, tie-break).  Spark does NOT
    # dedupe common subplans, so without materialization the tokenizer
    # subtree re-executes once per reference (measured: 16 copies, 125
    # exchanges).  persist() collapses them; at production scale this is
    # a parquet/Iceberg stage table instead (SURVEY.md section 4 item 4).
    # Eager materialization: independent downstream stages would race to
    # fill a lazy cache, and repeated references re-execute the subtree.
    toks = materialize(toks)
    if mode == "rules":
        tagged = apply_rules(tag_rules(toks))
    elif mode == "model":
        # broadcast-weight mapInPandas inference stage (SURVEY §2.10);
        # same downstream rule sweeps as the reference applies after
        # its model predictions (recheck/compatible/combine)
        from .operators.model_tagger import tag_model

        tagged = apply_rules(tag_model(toks))
    elif mode == "gold":
        ev, ar = gold
        tagged = tag_gold_replay(toks, ev, ar)
    else:
        raise ValueError(f"unknown tagging mode: {mode}")
    return materialize(tagged)


def triples_from_tagged(tagged: DataFrame) -> DataFrame:
    """tagged tokens -> (subj, pred, obj) triples."""
    # events/args are each referenced more than once inside link();
    # they are tiny relative to tokens — persist to stop subtree
    # re-execution (Spark has no common-subplan reuse)
    events = materialize(extract_events(tagged, carry=["realis"]))
    args = materialize(extract_arguments(tagged, carry=["role"]))
    linked = link(events, args, tagged)
    rolled = assign_roles(linked)

    realis = (
        F.col("realis") if "realis" in rolled.columns else F.lit(None).cast("string")
    )
    return rolled.select(
        "doc_id",
        F.col("event_text").alias("subj"),
        F.coalesce("role", F.lit("has_argument")).alias("pred"),
        F.col("arg_text").alias("obj"),
        F.col("subtype").alias("event_subtype"),
        F.coalesce(realis, F.lit("Actual")).alias("realis"),
        "event_id",
        "event_begin",
        "arg_begin",
        F.lit(1.0).alias("confidence"),
    )


def run_pipeline(documents: DataFrame, id_col: str = "url",
                 mode: str = "rules", gold=None,
                 english_only: bool = True) -> DataFrame:
    """documents(url, warc_ts, html, text, lang) -> triples."""
    if english_only and "lang" in documents.columns:
        documents = documents.filter(F.col("lang") == "en")
    tagged = tagged_tokens(documents, id_col=id_col, mode=mode, gold=gold)
    return triples_from_tagged(tagged)
