"""Quality gate for the trained tagger (VERDICT r1 #1, r2 #4):
mention-level Dice F1 on the full 1,000-article CASIE corpus must beat
the rule floor decisively, and — since the r3 Viterbi decode — hold
the precision side too.  Round-1 model-free floor: nugget F1 0.243;
r2 argmax artifact: nugget P .611/F1 .744; r3 Viterbi artifact
(λ=2.5 transitions): nugget P .711/R .888/F1 .790, argument P .793/
F1 .809 (BASELINE.md)."""

from __future__ import annotations

import numpy as np

from casie_spark.operators.model_tagger import (
    ARTIFACT_PATH,
    _CTX_KEYS,
    load_weights,
)


def test_artifact_present_and_well_formed():
    w = load_weights(ARTIFACT_PATH)
    assert w.trig_ctx is not None, "trained artifact missing"
    # r4 key sets (train_tagger.train): the trigger head carries the
    # lexical/shape/affix gather set; word-class tables are excluded
    # from BOTH heads (measured capacity dilution, r4), the r5 char
    # n-gram bag likewise (measured dilution, BASELINE.md r5), and the
    # argument head additionally omits the affixes but carries the
    # decode-time "sev" table (cross-fitted predicted sentence flags)
    rejected = {"c0f", "c0c", "cm1c", "cp1c", "cng"}
    for k in (set(_CTX_KEYS) - {"sev"} - rejected):
        assert k in w.trig_ctx, k
        assert np.isfinite(w.trig_ctx[k]).all()
    for k in (set(_CTX_KEYS) - {"pf3", "sf3", "sf4"} - rejected):
        assert k in w.arg_ctx, k
        assert np.isfinite(w.arg_ctx[k]).all()
    # the rejected features must NOT be in the deployed artifact
    assert not (rejected & set(w.trig_ctx)) and not (rejected & set(w.arg_ctx))
    assert w.arg_ctx["sev"].shape[0] == 2
    assert w.trigger_labels[0] == "O" and w.arg_labels[0] == "O"
    assert len(w.arg_labels) == 22  # full gold argument inventory


def test_trained_tagger_beats_rule_floor(spark):
    from casie_spark.operators.train_tagger import evaluate

    m = evaluate(spark, "model")
    # r4 artifact (sev arg head): nugget P .709/R .922/F1 .802,
    # argument P .800/R .890/F1 .843
    assert m["nugget"]["precision"] >= 0.70, m["nugget"]
    assert m["nugget"]["f1"] >= 0.79, m["nugget"]
    assert m["argument"]["f1"] >= 0.83, m["argument"]
    # recall must not collapse under the transition term
    assert m["nugget"]["recall"] >= 0.85, m["nugget"]
    # the model must over-predict mentions by at most ~1.5x gold
    assert m["nugget"]["n_pred"] <= 1.5 * m["nugget"]["n_gold"], m["nugget"]


def test_score_deterministic_across_calls():
    """Same inputs -> identical label indices (broadcast replay)."""
    w = load_weights(ARTIFACT_PATH)
    toks = ["Hackers", "stole", "records", "from", "Equifax", "."]
    prevs = [None] + toks[:-1]
    nexts = toks[1:] + [None]
    a = w.score(toks, prevs, nexts)
    b = w.score(toks, prevs, nexts)
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_end_to_end_triple_quality_gate(spark):
    """The full trained stack (tagger + link ranker + role-phrase +
    realis) must hold the corpus-level exact-four-tuple triple quality
    (r3: Viterbi artifact .505 -> union-pool link ranker .541 ->
    route-all roles + gold-vocabulary canon P .644 / R .624 / F1 .634;
    r2 argmax: F1 .494; rules floor .022)."""
    from pyspark.sql import functions as F

    from casie_spark.pipeline import run_pipeline
    from casie_spark.scoring import triple_prf
    from casie_spark.sources.annotations import gold_triples, load_annotations

    ann = load_annotations(spark).cache()
    docs = ann.select("doc_id", F.col("content").alias("text"))
    pred = run_pipeline(docs, id_col="doc_id", mode="model")
    m = triple_prf(pred, gold_triples(ann))
    ann.unpersist()
    # measured r4 (sev arg head + four-edge span repair + widened-pool
    # linker): P 0.727 / R 0.771 / F1 0.748 (r3: 0.739/0.718/0.729)
    assert m["f1"] >= 0.73, m
    assert m["precision"] >= 0.71, m
    assert m["recall"] >= 0.75, m
