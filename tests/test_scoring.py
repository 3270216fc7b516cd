"""Scorer differential tests: casie_spark.scoring.mention_dice_f1 vs
the reference mention() scorer (score.py:154-250), imported directly
from /root/reference (read-only) and driven on shared inputs.

Inputs use unique, positionally aligned words so the reference's
multiset word overlap equals our token-position overlap; ties are
avoided so greedy-removal order matches the one-to-one rank pairing
(divergences on order-dependent ties are documented in scoring.py)."""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sys

import pytest

from casie_spark.scoring import mention_dice_f1, triple_prf


@pytest.fixture(scope="module")
def ref_score():
    sys.path.insert(0, "/root/reference/code")
    spec = importlib.util.spec_from_file_location(
        "ref_score", "/root/reference/code/score.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_micro(ref_score, gold, pred, selectedlist):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_score.mention(gold, pred, selectedlist, O=False)
    micro = [ln for ln in buf.getvalue().splitlines() if ln.startswith("micro avg")][0]
    _, dice, ngold, npred, p, r, f = micro.split("\t")
    return float(p) / 100, float(r) / 100, float(f) / 100


# spans: (doc, sent, label, begin(token pos), n_tokens, words)
GOLD = [
    ("d1", 0, "Databreach", 0, 2, "alpha beta"),
    ("d1", 0, "Phishing", 5, 1, "gamma"),
    ("d2", 0, "Ransom", 2, 3, "delta echo foxtrot"),
]
PRED = [
    ("d1", 0, "Databreach", 0, 3, "alpha beta extra"),  # partial: tp=2, ts=3
    ("d1", 0, "Phishing", 5, 1, "gamma"),               # exact
    ("d2", 0, "Ransom", 9, 1, "zulu"),                  # no overlap
]
LABELS = ["B-Databreach", "B-Phishing", "B-Ransom"]


def _ref_dicts(rows):
    out = {}
    for doc, sent, label, _, _, words in rows:
        out.setdefault(doc, {}).setdefault(sent, []).append(
            {"trigger": words, "eventtype": label, "intersect": 0, "predlen": 0})
    # reference indexes gold docs/sents on both sides
    return out


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [(doc, sent, label, begin, begin + n, n)
         for doc, sent, label, begin, n, _ in rows],
        "doc_id string, sent_id int, label string, begin long, end long, n_tokens long",
    )


def test_mention_dice_matches_reference(spark, ref_score):
    gold = _ref_dicts(GOLD)
    pred = _ref_dicts(PRED)
    # reference iterates gold docs/sents; make pred cover them
    for d in gold:
        for s in gold[d]:
            pred.setdefault(d, {}).setdefault(s, [])
    p_ref, r_ref, f_ref = _ref_micro(ref_score, gold, pred, LABELS)

    got = mention_dice_f1(_spark_df(spark, PRED), _spark_df(spark, GOLD))
    assert got["precision"] == pytest.approx(p_ref, abs=1e-3)
    assert got["recall"] == pytest.approx(r_ref, abs=1e-3)
    assert got["f1"] == pytest.approx(f_ref, abs=1e-3)


def test_mention_dice_hand_computed(spark):
    """Hand check: dice = 2*2/(2+3) = 0.8 (partial) + 1.0 (exact) + 0
    (miss) = 1.8; P = 1.8/3, R = 1.8/3."""
    got = mention_dice_f1(_spark_df(spark, PRED), _spark_df(spark, GOLD))
    assert got["dice_sum"] == pytest.approx(1.8)
    assert got["precision"] == pytest.approx(0.6)
    assert got["recall"] == pytest.approx(0.6)


# tie/multiset stress set: duplicate words inside spans and two preds
# with EQUAL overlap for one gold — only the exact greedy-removal
# scorer reproduces the reference here
GOLD2 = [
    ("d1", 0, "Databreach", 0, 3, "data data breach"),
    ("d1", 0, "Databreach", 10, 2, "data stolen"),
    ("d1", 0, "Ransom", 20, 1, "paid"),
]
PRED2 = [
    ("d1", 0, "Databreach", 0, 2, "data breach"),   # overlaps both golds
    ("d1", 0, "Databreach", 10, 2, "data data"),    # multiset: 2 vs g1, 1 vs g2
    ("d1", 0, "Ransom", 20, 2, "paid paid"),        # duplicate word vs 1-gram
]


def _spark_text_df(spark, rows):
    return spark.createDataFrame(
        [(doc, sent, label, begin, words)
         for doc, sent, label, begin, _n, words in rows],
        "doc_id string, sent_id int, label string, begin long, text string",
    )


def test_exact_scorer_matches_reference_on_ties_and_multisets(spark, ref_score):
    from casie_spark.scoring import bag_intersect, mention_dice_f1_exact

    # the multiset primitive itself, incl. duplicate consumption
    assert bag_intersect("data data".split(), "data data breach".split()) == 2
    assert bag_intersect("paid paid".split(), ["paid"]) == 1
    assert bag_intersect(["a"], ["b"]) == 0

    gold = _ref_dicts(GOLD2)
    pred = _ref_dicts(PRED2)
    for d in gold:
        for s in gold[d]:
            pred.setdefault(d, {}).setdefault(s, [])
    p_ref, r_ref, f_ref = _ref_micro(ref_score, gold, pred,
                                     ["B-Databreach", "B-Ransom"])
    got = mention_dice_f1_exact(_spark_text_df(spark, PRED2),
                                _spark_text_df(spark, GOLD2))
    assert got["precision"] == pytest.approx(p_ref, abs=1e-3)
    assert got["recall"] == pytest.approx(r_ref, abs=1e-3)
    assert got["f1"] == pytest.approx(f_ref, abs=1e-3)


def test_exact_scorer_agrees_on_clean_inputs(spark):
    """On the tie-free differential set, exact and window scorers agree."""
    from casie_spark.scoring import mention_dice_f1_exact

    exact = mention_dice_f1_exact(_spark_text_df(spark, PRED),
                                  _spark_text_df(spark, GOLD))
    approx = mention_dice_f1(_spark_df(spark, PRED), _spark_df(spark, GOLD))
    assert exact["dice_sum"] == pytest.approx(approx["dice_sum"])


# token stream with BIO gold/pred tags for the confusion/report tests:
# (doc, sent, word, gold, pred)
TOKENS = [
    ("d1", 0, 0, "B-Databreach", "B-Databreach"),   # correct begin
    ("d1", 0, 1, "I-Databreach", "I-Phishing"),     # continuation confused
    ("d1", 0, 2, "O", "B-Phishing"),                # false positive
    ("d1", 0, 3, "O", "O"),                         # true negative
    ("d1", 1, 0, "B-Phishing", "O"),                # missed begin
    ("d1", 1, 1, "B-Ransom", "I-Ransom"),           # right type, wrong prefix
    ("d2", 0, 0, "B-Databreach", "B-Phishing"),     # wrong type
    ("d2", 0, 1, "I-Databreach", "O"),              # missed continuation
]
SELECTED = ["O", "B-Databreach", "B-Phishing", "B-Ransom"]


def _token_df(spark):
    return spark.createDataFrame(
        TOKENS, "doc_id string, sent_id int, token_id int, "
                "gold_tag string, pred_tag string")


def _raw_dict():
    out = {}
    for doc, sent, word, gold, pred in TOKENS:
        out.setdefault(doc, {}).setdefault(sent, {})[word] = {
            "gold": gold, "pred": pred}
    return out


def _ref_confusion(ref_score, fn):
    """Run the reference matrix printer, parse non-zero cells."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(None, None, SELECTED, _raw_dict())
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    cols = lines[0].split()[:-1]  # drop 'total'
    cells = {}
    for ln in lines[1:]:
        parts = ln.split("\t")
        gold_label = parts[0]
        for c, v in zip(cols, parts[1:]):
            if int(v):
                cells[(gold_label, c)] = int(v)
    return cells


@pytest.mark.parametrize("mode,ref_fn", [("label", "confusion_label"),
                                         ("token", "confusion_token")])
def test_confusion_matrix_matches_reference(spark, ref_score, mode, ref_fn):
    """Differential vs the reference matrix printers (score.py:253-341)
    on a stream covering begin/continuation/miss/false-positive/
    wrong-type cells."""
    want = _ref_confusion(ref_score, getattr(ref_score, ref_fn))
    from casie_spark.scoring import confusion_matrix

    got = {
        (r["gold_label"], r["pred_label"]): r["n"]
        for r in confusion_matrix(_token_df(spark), mode=mode).collect()
    }
    assert got == want


def test_confusion_matrix_label_mode_hand_check(spark):
    """label mode skips gold I- rows: d1/0/1 and d2/0/1 are absent;
    the B-Ransom/I-Ransom token folds to (Ransom, Ransom)."""
    from casie_spark.scoring import confusion_matrix

    got = {
        (r["gold_label"], r["pred_label"]): r["n"]
        for r in confusion_matrix(_token_df(spark), mode="label").collect()
    }
    assert got == {
        ("Databreach", "Databreach"): 1,
        ("Databreach", "Phishing"): 1,
        ("O", "Phishing"): 1,
        ("O", "O"): 1,
        ("Phishing", "O"): 1,
        ("Ransom", "Ransom"): 1,
    }


def test_per_class_report_hand_check(spark):
    """classification_report semantics (report.py:17-41): raw BIO tags
    as classes, O excluded, P = tp/n_pred, R = tp/support."""
    from casie_spark.scoring import per_class_report, report_summary

    rows = {r["label"]: r for r in per_class_report(_token_df(spark)).collect()}
    assert set(rows) == {"B-Databreach", "I-Databreach", "B-Phishing",
                         "I-Phishing", "B-Ransom", "I-Ransom"}
    # B-Databreach: gold 2 (d1/0/0, d2/0/0), pred 1 (d1/0/0, correct)
    r = rows["B-Databreach"]
    assert r["support"] == 2 and r["precision"] == pytest.approx(1.0)
    assert r["recall"] == pytest.approx(0.5)
    assert r["f1"] == pytest.approx(2 / 3)
    # B-Phishing: gold 1 (missed), pred 2 (both wrong) -> all zero
    r = rows["B-Phishing"]
    assert r["support"] == 1 and r["precision"] == 0.0 and r["recall"] == 0.0
    # I-Phishing: gold 0, pred 1 -> support 0, P 0 (tp=0), R 0
    r = rows["I-Phishing"]
    assert r["support"] == 0 and r["precision"] == 0.0
    s = report_summary(per_class_report(_token_df(spark)))
    assert s["n_classes"] == 6
    assert s["macro_f1"] == pytest.approx((2 / 3) / 6)


def test_triple_prf_basic(spark):
    pred = spark.createDataFrame(
        [("d1", 0, "Victim", 10), ("d1", 0, "CVE", 20), ("d1", 5, "Time", 30)],
        "doc_id string, event_begin long, pred string, arg_begin long")
    gold = spark.createDataFrame(
        [("d1", 0, "Victim", 10), ("d1", 0, "CVE", 21)],
        "doc_id string, nugget_begin long, pred string, begin long")
    m = triple_prf(pred, gold)
    assert m["tp"] == 1
    assert m["precision"] == pytest.approx(1 / 3)
    assert m["recall"] == pytest.approx(1 / 2)
