"""End-to-end triple parity on the CASIE reference corpus.

Two gates:

1. **Differential parity (the hard gate, P/R >= 0.99)** — the
   distributed Spark pipeline (gold-replay tags -> span assembly ->
   linking -> roles -> triples) must emit the same triple set as the
   sequential pure-Python oracle in oracle_ref.py, which implements
   the reference linking semantics (link_coref.py:1228-1457) directly
   from the gold JSON.  This is the "matches the reference's emitted
   triples" check with the absent model weights replaced by gold tags
   on both sides (SURVEY.md section 7, risk 4).

2. **Gold ceiling (informational, P/R >= 0.85)** — pipeline triples vs
   triples read directly off the gold annotation.  The reference's own
   linker attaches an argument only to a same/previous-sentence event
   (link_coref.py:1299-1309), so ~4% of gold arguments are
   structurally unreachable and ~3% attach to a different same-type
   event than the annotator chose; the reference itself cannot exceed
   this ceiling on its corpus.
"""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from casie_spark.operators.tagging import tag_gold_replay
from casie_spark.operators.tokenizer import tokenize
from casie_spark.pipeline import triples_from_tagged
from casie_spark.scoring import triple_prf
from casie_spark.sources.annotations import (
    gold_arguments,
    gold_events,
    gold_triples,
    load_annotations,
)
from oracle_ref import link_oracle


@pytest.fixture(scope="module")
def ann(spark):
    return load_annotations(spark).cache()


@pytest.fixture(scope="module")
def pred_keys(spark, ann):
    docs = ann.select("doc_id", F.col("content").alias("text"))
    toks = tokenize(docs, id_col="doc_id")
    tagged = tag_gold_replay(toks, gold_events(ann), gold_arguments(ann))
    pred = triples_from_tagged(tagged)
    rows = pred.select(
        "doc_id",
        F.col("event_begin").cast("long").alias("k1"),
        F.col("pred").alias("k2"),
        F.col("arg_begin").cast("long").alias("k3"),
    ).distinct().collect()
    return {(r["doc_id"], r["k1"], r["k2"], r["k3"]) for r in rows}


def test_differential_parity_vs_oracle(pred_keys):
    oracle = set()
    for f in sorted(glob.glob("/root/reference/data/annotation/*.json")):
        a = json.load(open(f))
        doc_id = f.rsplit("/", 1)[1][:-5]
        events = [e for h in (a["cyberevent"]["hopper"] or [])
                  for e in h["events"]]
        for (k1, k2, k3) in link_oracle(a["content"], events):
            oracle.add((doc_id, k1, k2, k3))
    tp = len(pred_keys & oracle)
    precision = tp / len(pred_keys)
    recall = tp / len(oracle)
    print(f"DIFFERENTIAL: tp={tp} pred={len(pred_keys)} oracle={len(oracle)} "
          f"P={precision:.4f} R={recall:.4f}")
    if precision < 1.0:
        sample = list(pred_keys - oracle)[:5]
        print("pred-only sample:", sample)
    if recall < 1.0:
        sample = list(oracle - pred_keys)[:5]
        print("oracle-only sample:", sample)
    assert precision >= 0.99
    assert recall >= 0.99


def test_gold_ceiling(spark, ann, pred_keys):
    gold = gold_triples(ann)
    rows = gold.select(
        "doc_id",
        F.col("nugget_begin").cast("long").alias("k1"),
        F.col("pred").alias("k2"),
        F.col("begin").cast("long").alias("k3"),
    ).distinct().collect()
    g = {(r["doc_id"], r["k1"], r["k2"], r["k3"]) for r in rows}
    tp = len(pred_keys & g)
    precision, recall = tp / len(pred_keys), tp / len(g)
    print(f"GOLD CEILING: P={precision:.4f} R={recall:.4f}")
    assert precision >= 0.85
    assert recall >= 0.85


def test_gold_event_counts(spark, ann):
    # corpus constants measured in SURVEY.md section 1.3
    assert gold_events(ann).count() == 8485
    assert gold_arguments(ann).count() == 22701
