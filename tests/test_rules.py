"""Rule sweeps R1/R5 (operators.rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.operators.rules import (
    apply_compatibility_sweep,
    apply_forced_triggers,
)

SCHEMA = ("doc_id string, sent_id int, token_id int, token string, "
          "begin long, end long, trigger_tag string, arg_tag string")


def _tok(doc, sent, tid, tok, trig, arg):
    return (doc, sent, tid, tok, tid * 10, tid * 10 + len(tok), trig, arg)


def test_forced_ransom_trigger(spark):
    # Money + PaymentMethod, no Ransom trigger -> verbish token recovered
    rows = [
        _tok("d", 0, 0, "They", "O", "O"),
        _tok("d", 0, 1, "demanded", "O", "O"),
        _tok("d", 0, 2, "$500", "O", "B-Money"),
        _tok("d", 0, 3, "in", "O", "O"),
        _tok("d", 0, 4, "bitcoin", "O", "B-PaymentMethod"),
    ]
    out = apply_forced_triggers(spark.createDataFrame(rows, SCHEMA))
    got = {(r["token"], r["trigger_tag"]) for r in out.collect()}
    assert ("demanded", "B-Ransom") in got


def test_forced_trigger_skipped_when_present(spark):
    rows = [
        _tok("d", 0, 0, "demanded", "B-Ransom", "O"),
        _tok("d", 0, 1, "$500", "O", "B-Money"),
        _tok("d", 0, 2, "bitcoin", "O", "B-PaymentMethod"),
    ]
    out = apply_forced_triggers(spark.createDataFrame(rows, SCHEMA))
    trig = [r for r in out.collect() if r["trigger_tag"] != "O"]
    assert len(trig) == 1 and trig[0]["token"] == "demanded"


def test_discover_vuln_excluded_by_patch(spark):
    # Vulnerability + Patch present -> NO DiscoverVulnerability forced
    # (the Patch rule fires instead), per recheck link_coref.py:1051
    rows = [
        _tok("d", 0, 0, "released", "O", "O"),
        _tok("d", 0, 1, "patch", "O", "B-Patch"),
        _tok("d", 0, 2, "for", "O", "O"),
        _tok("d", 0, 3, "flaw", "O", "B-Vulnerability"),
    ]
    out = apply_forced_triggers(spark.createDataFrame(rows, SCHEMA))
    forced = {r["trigger_tag"] for r in out.collect()} - {"O"}
    assert forced == {"B-PatchVulnerability"}


def test_compatibility_sweep_clears_orphan_args(spark):
    rows = [
        # sent 0: trigger; sent 1: args near trigger (kept);
        # sent 5: args with no trigger within +/-1 (cleared)
        _tok("d", 0, 0, "breached", "B-Databreach", "O"),
        _tok("d", 1, 0, "records", "O", "B-Data"),
        _tok("d", 5, 0, "emails", "O", "B-Data"),
    ]
    out = apply_compatibility_sweep(spark.createDataFrame(rows, SCHEMA))
    got = {(r["sent_id"], r["arg_tag"]) for r in out.collect()}
    assert (1, "B-Data") in got
    assert (5, "O") in got


def test_sentence_event_scores(spark):
    """A3 (link_coref.py:925-939): Pair-compatible argument counts per
    event type; needs_noun = no Person/Organization argument."""
    from casie_spark.operators.rules import sentence_event_scores

    rows = [
        # sent 0: Data + PII args -> Databreach score 2 (both legal),
        # no Person/Org -> needs_noun True
        _tok("d", 0, 0, "records", "O", "B-Data"),
        _tok("d", 0, 1, "ssn", "O", "B-PII"),
        # sent 1: Person arg -> needs_noun False
        _tok("d", 1, 0, "hackers", "O", "B-Person"),
    ]
    out = {(r["sent_id"], r["eventtype"]): (r["score"], r["needs_noun"])
           for r in sentence_event_scores(
               spark.createDataFrame(rows, SCHEMA)).collect()}
    assert out[(0, "Databreach")][0] == 2
    assert out[(0, "Databreach")][1] is True
    assert out[(1, "Phishing")][1] is False  # Person present
    # every returned row has positive score (event_w_score_arg)
    assert all(s > 0 for s, _ in out.values())


def test_forced_trigger_pathological_token_ids(spark):
    """Packed-key clamp: token ids beyond the 19-bit field (an unsplit
    mega-'sentence') must not corrupt the higher-order key bits or
    throw; the sweep still forces a trigger at sane positions."""
    rows = [
        _tok("d", 0, 0, "demanded", "O", "O"),
        _tok("d", 0, 1, "$500", "O", "B-Money"),
        _tok("d", 0, 2, "bitcoin", "O", "B-PaymentMethod"),
        # same sentence, token ids far beyond 2^19
        _tok("d", 0, 600000, "filler", "O", "O"),
        _tok("d", 0, 600001, "more", "O", "O"),
    ]
    out = apply_forced_triggers(spark.createDataFrame(rows, SCHEMA))
    got = {r["token_id"]: r["trigger_tag"] for r in out.collect()}
    assert got[0] == "B-Ransom"            # forced at the sane position
    assert got[600000] == "O" and got[600001] == "O"
