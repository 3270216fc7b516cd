"""Event <-> argument linking (J4, SURVEY.md section 2.3) as joins.

Reimplements the semantics of ``link`` (reference
code/link_coref.py:1228-1406) declaratively:

1.  Nugget spans -> events, argument spans -> arguments, ids assigned
    in reading order (row_number over (sent_id, first_token_id) per
    doc — matching the reference's sequential eventid/argumentid
    counters at :1230, :1296).
2.  select_sent per argument sentence (:1299-1309): the argument looks
    at its own sentence first — if ANY event exists there it is the
    only pool considered (even if none is compatible) — else at the
    previous sentence, else the argument is dropped.
3.  Candidate events = events of select_sent whose subtype legally
    accepts the argument's entity type (Pair, :1369-1373).
4.  Exactly one candidate -> attach (:1375-1378).  More than one ->
    the nearest-trigger tie-break (:1380-1406): walk the argument's
    tokens in order; the first token whose nearest trigger + relative
    position matches a candidate (nugget token-list containment +
    offset direction) decides, candidates probed in event-id order.

Physical plan: two span assemblies (window ops), one broadcast-able
distinct sentence lookup, one compat theta-join (events per doc-
sentence are tiny; skew handled by AQE), and a row_number top-1 for
the tie-break.  No Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..util import truncate
from .spans import assemble_spans


def _compat(ev_label, arg_label):
    """arg entity type legal for event subtype (Pair, link_coref.py:38-42)."""
    c = F.lit(False)
    for sub, args in config.PAIR.items():
        c = c | ((ev_label == sub) & arg_label.isin(args))
    return c


def extract_events(tagged: DataFrame, carry: list[str] | None = None,
                   carry_last: dict[str, str] | None = None) -> DataFrame:
    """Trigger spans -> events(doc_id, event_id, sent_id, subtype, text,
    begin, end, first_token_id [, carried cols])."""
    carry = [c for c in (carry or []) if c in tagged.columns]
    spans = assemble_spans(tagged, "trigger_tag", carry_first=carry,
                           carry_last=carry_last)
    w = Window.partitionBy("doc_id").orderBy("sent_id", "first_token_id")
    return (
        spans.withColumn("event_id", F.row_number().over(w) - 1)
        .withColumnRenamed("label", "subtype")
        .drop("span_id")
    )


def extract_arguments(tagged: DataFrame, carry: list[str] | None = None,
                      carry_last: dict[str, str] | None = None) -> DataFrame:
    carry = [c for c in (carry or []) if c in tagged.columns]
    spans = assemble_spans(tagged, "arg_tag", carry_first=carry,
                           carry_last=carry_last)
    w = Window.partitionBy("doc_id").orderBy("sent_id", "first_token_id")
    return (
        spans.withColumn("arg_id", F.row_number().over(w) - 1)
        .withColumnRenamed("label", "arg_type")
        .drop("span_id")
    )


def link(events: DataFrame, arguments: DataFrame, tagged: DataFrame) -> DataFrame:
    """Attach arguments to events; returns one row per attached pair:

    (doc_id, event_id, subtype, event_text, event_begin, event_sent,
     realis?, arg_id, arg_type, arg_text, arg_begin, arg_sent, role?)
    """
    ev = events.select(
        F.col("doc_id").alias("_e_doc"),
        F.col("event_id"),
        F.col("sent_id").alias("ev_sent"),
        F.col("subtype"),
        F.col("text").alias("event_text"),
        F.col("begin").alias("event_begin"),
        *(["realis"] if "realis" in events.columns else []),
    )
    ar = arguments.select(
        "doc_id",
        F.col("arg_id"),
        F.col("sent_id").alias("arg_sent"),
        F.col("arg_type"),
        F.col("text").alias("arg_text"),
        F.col("begin").alias("arg_begin"),
        F.col("end").alias("arg_end"),
        *(["role"] if "role" in arguments.columns else []),
    )

    # --- select_sent (link_coref.py:1299-1309) ---
    ev_sents = ev.select(F.col("_e_doc").alias("doc_id"), F.col("ev_sent").alias("s")).distinct()
    same = ev_sents.withColumnRenamed("s", "arg_sent").withColumn("_same", F.lit(True))
    prev = ev_sents.withColumn("arg_sent", F.col("s") + 1).drop("s").withColumn(
        "_prev", F.lit(True)
    )
    ar = (
        ar.join(same, ["doc_id", "arg_sent"], "left")
        .join(prev, ["doc_id", "arg_sent"], "left")
        .withColumn(
            "select_sent",
            F.when(F.col("_same"), F.col("arg_sent"))
            .when(F.col("_prev"), F.col("arg_sent") - 1),
        )
        .drop("_same", "_prev")
        .filter(F.col("select_sent").isNotNull())
    )

    # --- candidates: events of select_sent, Pair-compatible ---
    cand = ar.join(
        ev,
        (F.col("doc_id") == F.col("_e_doc"))
        & (F.col("select_sent") == F.col("ev_sent")),
        "inner",
    ).drop("_e_doc")
    cand = cand.filter(_compat(F.col("subtype"), F.col("arg_type")))

    # candidate-pair scale (tiny): truncate cuts the plan subtree so
    # the three downstream references render a leaf, not the whole
    # span-assembly lineage (see triples_from_tagged barrier note)
    warg = Window.partitionBy("doc_id", "arg_id")
    cand = truncate(cand.withColumn("n_cand", F.count("*").over(warg)))

    # --- tie-break info, computed ONLY for tokens inside the spans of
    # multi-candidate arguments (a tiny fraction of the token stream;
    # computing nearest-trigger over everything was the dominant cost)
    multi_spans = (
        cand.filter(F.col("n_cand") > 1)
        .select("doc_id", "arg_id", "arg_sent", "arg_begin", "arg_end")
        .distinct()
    )
    span_toks = tagged.select(
        "doc_id", F.col("sent_id"), "token_id", "begin"
    ).join(
        multi_spans.select(
            F.col("doc_id").alias("_m_doc"), "arg_id",
            F.col("arg_sent").alias("_m_sent"), "arg_begin", "arg_end",
        ),
        (F.col("doc_id") == F.col("_m_doc"))
        & (F.col("sent_id") == F.col("_m_sent"))
        & (F.col("begin") >= F.col("arg_begin"))
        & (F.col("begin") < F.col("arg_end")),
        "inner",
    ).select("doc_id", "arg_id", "sent_id", "token_id", "begin")

    near = _nearest_trigger_for(span_toks, tagged).select(
        F.col("doc_id").alias("_n_doc"),
        F.col("arg_id").alias("_n_arg"),
        F.col("token_id"),
        F.col("begin"),
        "near_trigger", "trigger_position",
    )

    # --- unified pick (link_coref.py:1375-1406): a single-candidate
    # argument attaches directly; a multi-candidate one attaches to the
    # first (token order, then event order) candidate matching the
    # nearest-trigger containment + direction rule.
    j = cand.join(
        near,
        (F.col("doc_id") == F.col("_n_doc"))
        & (F.col("arg_id") == F.col("_n_arg"))
        & (F.col("n_cand") > 1),
        "left",
    ).drop("_n_doc", "_n_arg")

    ev_tokens = F.split(F.col("event_text"), " ")
    contains = F.array_contains(ev_tokens, F.col("near_trigger"))
    ok = (
        (F.col("trigger_position").isin("before", "differsentence")
         & contains & (F.col("event_begin") <= F.col("begin")))
        | ((F.col("trigger_position") == "after")
           & contains & (F.col("event_begin") >= F.col("begin")))
    )
    valid = (F.col("n_cand") == 1) | F.coalesce(ok, F.lit(False))
    wpick = Window.partitionBy("doc_id", "arg_id").orderBy(
        F.when(valid, 0).otherwise(1), "token_id", "event_id"
    )
    out = (
        j.withColumn("_valid", valid)
        .withColumn("_rk", F.row_number().over(wpick))
        .filter("_rk = 1 AND _valid")
        .drop("_rk", "_valid", "n_cand", "token_id", "begin",
              "near_trigger", "trigger_position")
    )
    return out.drop("select_sent", "arg_end", "ev_sent")


# W3 symbol alphabet, verbatim parseJsontoFeatures.py:37 — note the
# quirky order: 'x' is skipped after 'w' and appended after 'aa', so
# bucket 23 is 'y' and the >=26 overflow bucket is 'x'
DISTANCE_SYMBOLS = ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j",
                    "k", "l", "m", "n", "o", "p", "q", "r", "s", "t",
                    "u", "v", "w", "y", "z", "aa", "x"]


def encode_distance(d):
    """W3: 26-bucket distance symbol ``encoded[min(d, 26)]``
    (parseJsontoFeatures.py:431-433,486)."""
    syms = F.array(*[F.lit(s) for s in DISTANCE_SYMBOLS])
    return F.element_at(syms, F.least(d, F.lit(26)).cast("int") + 1)


def nearest_trigger(tagged: DataFrame) -> DataFrame:
    """Per token: nearest trigger surface + relative position +
    26-bucket distance symbol (W3), for the whole token stream (see
    _nearest_trigger_for for the restricted variant the linker uses).
    ``dist_code`` is null for the differsentence case, where the
    reference encodes no same-sentence token distance."""
    toks = tagged.select(
        "doc_id", F.lit(0).alias("arg_id"), "sent_id", "token_id", "begin"
    ).filter(F.col("begin").isNotNull())
    out = _nearest_trigger_for(toks, tagged).drop("arg_id")
    return out.withColumn(
        "dist_code",
        F.when(F.col("trigger_position") != "differsentence",
               encode_distance(F.abs(F.col("near_tid") - F.col("token_id"))))
    ).drop("near_tid")


def _nearest_trigger_for(toks: DataFrame, tagged: DataFrame) -> DataFrame:
    """Nearest trigger per (doc_id, arg_id, token).

    Deterministic analog of combineNearTrggr
    (parseJsontoFeatures.py:360-503): nearest same-sentence trigger by
    token distance (tie -> earlier trigger); if none, a trigger in the
    previous/next sentence -> 'differsentence'.

    toks: (doc_id, arg_id, sent_id, token_id, begin).
    Returns + (near_trigger, trigger_position).
    """
    trig = tagged.filter(F.col("trigger_tag") != "O").select(
        F.col("doc_id").alias("_t_doc"),
        F.col("sent_id").alias("t_sent"),
        F.col("token_id").alias("t_tid"),
        F.col("token").alias("t_tok"),
    )

    # min_by over a doc-clustered groupBy instead of a per-token window:
    # HashPartitioning(doc_id) satisfies clustering on (doc_id, sent_id,
    # token_id), so neither aggregation re-shuffles.  samesent feeds
    # BOTH union branches below — truncate stops the subtree executing
    # twice AND keeps the rendered plan a leaf (in the linker, toks is
    # restricted to multi-candidate argument spans, so this is tiny).
    samesent = truncate(
        toks.join(
            trig,
            (F.col("doc_id") == F.col("_t_doc")) & (F.col("sent_id") == F.col("t_sent")),
            "left",
        )
        .drop("_t_doc")
        .groupBy("doc_id", "arg_id", "sent_id", "token_id")
        .agg(
            F.first("begin").alias("begin"),
            # guard: a null ordering value is skipped by min_by, but a
            # struct OF nulls would sort first — so wrap in when()
            F.min_by(
                F.struct("t_tok", "t_tid"),
                F.when(
                    F.col("t_tid").isNotNull(),
                    F.struct(F.abs(F.col("t_tid") - F.col("token_id")).alias("d"),
                             F.col("t_tid").alias("t")),
                ),
            ).alias("_best"),
        )
    )
    same_hit = samesent.filter(F.col("_best.t_tid").isNotNull()).select(
        "doc_id", "arg_id", "sent_id", "token_id", "begin",
        F.col("_best.t_tok").alias("near_trigger"),
        F.when(F.col("_best.t_tid") < F.col("token_id"), "before")
        .otherwise("after")
        .alias("trigger_position"),
        F.col("_best.t_tid").alias("near_tid"),
    )

    # tokens with no same-sentence trigger: look at sent +/- 1
    miss = samesent.filter(F.col("_best.t_tid").isNull()).select(
        "doc_id", "arg_id", "sent_id", "token_id", "begin"
    )
    adj_hit = (
        miss.join(
            trig,
            (F.col("doc_id") == F.col("_t_doc"))
            & (F.abs(F.col("t_sent") - F.col("sent_id")) == 1),
            "inner",
        )
        .drop("_t_doc")
        .groupBy("doc_id", "arg_id", "sent_id", "token_id")
        .agg(
            F.first("begin").alias("begin"),
            F.min_by(
                F.col("t_tok"),
                F.struct(F.col("t_sent").alias("s"), F.col("t_tid").alias("t")),
            ).alias("near_trigger"),
        )
        .withColumn("trigger_position", F.lit("differsentence"))
        .withColumn("near_tid", F.lit(None).cast("int"))
    )
    return same_hit.unionByName(adj_hit)
