"""P4 ambiguous-role candidate filter + provider hook
(AmbiguousList, reference prepare.py:177-179; candidate narrowing
role_phrase.py:35)."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.operators.roles import (
    ambiguous_role_candidates,
    assign_roles,
)

LINKED_ROWS = [
    # (doc, event, arg, subtype, arg_type)
    ("d1", 0, 0, "Phishing", "Person"),        # ambiguous
    ("d1", 0, 1, "Phishing", "File"),          # not ambiguous
    ("d1", 1, 2, "Ransom", "Money"),           # ambiguous
    ("d1", 1, 3, "Ransom", "Time"),            # not ambiguous
    ("d1", 2, 4, "DiscoverVulnerability", "Website"),  # not in its list
]
SCHEMA = "doc_id string, event_id int, arg_id int, subtype string, arg_type string"


def test_ambiguous_candidates_match_reference_list(spark):
    linked = spark.createDataFrame(LINKED_ROWS, SCHEMA)
    cand = {(r["event_id"], r["arg_id"])
            for r in ambiguous_role_candidates(linked).collect()}
    assert cand == {(0, 0), (1, 2)}


def test_provider_resolves_only_ambiguous_pairs(spark):
    linked = spark.createDataFrame(LINKED_ROWS, SCHEMA)

    def provider(cand):
        return cand.select(
            "doc_id", "event_id", "arg_id",
            F.lit("ProviderRole").alias("role"))

    out = {(r["event_id"], r["arg_id"]): r["role"]
           for r in assign_roles(linked, provider=provider).collect()}
    assert out[(0, 0)] == "ProviderRole"
    assert out[(1, 2)] == "ProviderRole"
    # unambiguous pairs keep the deterministic RolePair role
    assert out[(0, 1)] != "ProviderRole"
    assert out[(1, 3)] != "ProviderRole"


def test_no_provider_matches_round1_behavior(spark):
    linked = spark.createDataFrame(LINKED_ROWS, SCHEMA)
    base = {(r["event_id"], r["arg_id"]): r["role"]
            for r in assign_roles(linked).collect()}
    assert all(v is None or isinstance(v, str) for v in base.values())
    # deterministic fallback still fills roles from RolePair
    assert base[(1, 3)] is not None
