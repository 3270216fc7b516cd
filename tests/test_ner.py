"""Unit tests for the derived-NER stage: P3 whitelist + BIO encoding
(combineNe_st), the version context rules, J8 look-back propagation
(combineNNNer/findnearbyner), and the F12 singularizer — expectations
hand-traced from parseJsontoFeatures.py:164-198, :951-985."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.functions.singular import singular_noun
from casie_spark.operators.ner import encode_ner, lookback_ner, with_ner


def test_singular_noun_golden():
    assert singular_noun("breaches") == "breach"
    assert singular_noun("companies") == "company"
    assert singular_noun("people") == "person"
    assert singular_noun("viruses") == "virus"
    assert singular_noun("movies") == "movie"
    assert singular_noun("knives") == "knife"
    assert singular_noun("databases") == "database"
    assert singular_noun("heroes") == "hero"
    assert singular_noun("services") == "service"
    assert singular_noun("attackers") == "attacker"
    assert singular_noun("Hackers") == "Hacker"
    # not plural -> False (the inflect sentinel the reference uses)
    assert singular_noun("class") is False
    assert singular_noun("virus") is False
    assert singular_noun("boss") is False
    assert singular_noun("analysis") is False
    assert singular_noun("company") is False


def _toks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, sent_id int, token_id int, token string, _ner_raw string")


def _ner_map(df):
    return {(r["sent_id"], r["token_id"]): r["ner"] for r in df.collect()}


def test_encode_ner_whitelist_and_bio(spark):
    df = encode_ner(_toks(spark, [
        (1, 0, 0, "Adobe", "ORGANIZATION"),
        (1, 0, 1, "Systems", "ORGANIZATION"),
        (1, 0, 2, "said", "O"),
        (1, 0, 3, "xyz", "UNLISTED_TYPE"),   # P3: reset to O
        (1, 0, 4, "CVE-2019-0001", "CVE"),   # title-case quirk: B-Cve
    ]))
    m = _ner_map(df)
    assert m[(0, 0)] == "B-Organization"
    assert m[(0, 1)] == "I-Organization"
    assert m[(0, 2)] == "O"
    assert m[(0, 3)] == "O"
    assert m[(0, 4)] == "B-Cve"


def test_encode_ner_version_context_rules(spark):
    # rule (a): version token after a Software entity
    m = _ner_map(encode_ner(_toks(spark, [
        (1, 0, 0, "Flash", "SOFTWARE"),
        (1, 0, 1, "10.1", "O"),
    ])))
    assert m[(0, 0)] == "B-Software" and m[(0, 1)] == "B-Version"

    # rule (b): "ver..." predecessor is retro-tagged B-Version
    m = _ner_map(encode_ner(_toks(spark, [
        (1, 0, 0, "on", "O"),
        (1, 0, 1, "version", "O"),
        (1, 0, 2, "10.1", "O"),
    ])))
    assert m[(0, 1)] == "B-Version" and m[(0, 2)] == "I-Version"

    # rule (c): capitalized unknown before a version becomes B-Software
    m = _ner_map(encode_ner(_toks(spark, [
        (1, 0, 0, "running", "O"),
        (1, 0, 1, "Confluence", "O"),
        (1, 0, 2, "6.6.1", "O"),
    ])))
    assert m[(0, 1)] == "B-Software" and m[(0, 2)] == "B-Version"

    # number-after-software fix (:197-198)
    m = _ner_map(encode_ner(_toks(spark, [
        (1, 0, 0, "Windows", "SOFTWARE"),
        (1, 0, 1, "10", "NUMBER"),
    ])))
    assert m[(0, 1)] == "B-Version"


def test_lookback_inherits_nearest_preceding_type(spark):
    # sentence 0 tags Microsoft as Organization; "company" in sentence 2
    # (orglist member, singular, ner=O) inherits the full BIO tag
    df = encode_ner(_toks(spark, [
        (1, 0, 0, "Microsoft", "ORGANIZATION"),
        (1, 0, 1, "patched", "O"),
        (1, 1, 0, "Hackers", "PERSON"),
        (1, 1, 1, "attacked", "O"),
        (1, 2, 0, "the", "O"),
        (1, 2, 1, "company", "O"),
        (1, 2, 2, "today", "O"),
    ]))
    m = _ner_map(lookback_ner(df))
    assert m[(2, 1)] == "B-Organization"
    # non-noun tokens untouched
    assert m[(2, 0)] == "O" and m[(2, 2)] == "O"


def test_lookback_quirks(spark):
    # plural nouns look up but never inherit (originalText != singular)
    df = encode_ner(_toks(spark, [
        (1, 0, 0, "Oracle", "ORGANIZATION"),
        (1, 1, 0, "services", "O"),  # syssoftlist member but plural
        (1, 1, 1, "company", "O"),
    ]))
    m = _ner_map(lookback_ner(df))
    assert m[(1, 0)] == "O"
    assert m[(1, 1)] == "B-Organization"

    # whole-sentence scan: a compatible entity AFTER the noun in the
    # SAME sentence is still found (reference scans each sentence
    # left-to-right from its beginning)
    df = encode_ner(_toks(spark, [
        (1, 0, 0, "the", "O"),
        (1, 0, 1, "company", "O"),
        (1, 0, 2, "Equifax", "ORGANIZATION"),
    ]))
    m = _ner_map(lookback_ner(df))
    assert m[(0, 1)] == "B-Organization"

    # incompatible types do not propagate (Person source, org noun
    # with no Organization anywhere)
    df = encode_ner(_toks(spark, [
        (1, 0, 0, "hackers", "PERSON"),
        (1, 1, 0, "company", "O"),
    ]))
    m = _ner_map(lookback_ner(df))
    assert m[(1, 0)] == "O"


def test_with_ner_feeds_argument_recall(spark):
    """End-to-end through tag_rules: a bare 'company' noun becomes an
    Organization argument via look-back inheritance."""
    from casie_spark.operators.tagging import tag_rules
    from casie_spark.operators.tokenizer import tokenize

    docs = spark.createDataFrame(
        [("u1", "Equifax discloses data breach. The company lost records.")],
        "url string, text string")
    tagged = tag_rules(tokenize(docs, id_col="url"))
    rows = {r["token"]: r["arg_tag"] for r in tagged.collect()}
    assert rows["company"] == "B-Organization"
    assert "ner" in tagged.columns


def test_combine_external_ner_joins(spark):
    """J3 (combineExtNe): exact (offset, surface) match per source;
    finerner2 stays null when unmatched (the reference never
    initializes that key), the other three default to 'O'."""
    from casie_spark.operators.ner import combine_external_ner

    toks = spark.createDataFrame(
        [(1, 0, 0, "Microsoft", 0), (1, 0, 1, "patched", 10)],
        "doc_id long, sent_id int, token_id int, token string, begin long")
    wk1 = spark.createDataFrame(
        [(1, 0, "Microsoft", "B-Organization"),
         (1, 99, "Microsoft", "B-Wrong")],  # offset mismatch ignored
        "doc_id long, begin long, token string, ne string")
    out = {r["token"]: r for r in
           combine_external_ner(toks, wk1=wk1).collect()}
    assert out["Microsoft"]["finerner"] == "B-Organization"
    assert out["patched"]["finerner"] == "O"
    assert out["Microsoft"]["finerner2"] is None
    assert out["Microsoft"]["wk_ner"] == "O" and out["patched"]["db_ner"] == "O"


def test_ner_stage_keeps_single_token_shuffle(spark):
    """The whole derived-NER stage (raw + encode + look-back) rides the
    one explicit doc_id exchange."""
    from casie_spark.operators.tokenizer import tokenize

    docs = spark.createDataFrame(
        [(f"u{i}", "Microsoft patched. The company said so.") for i in range(4)],
        "url string, text string")
    toks = tokenize(docs, id_col="url").repartition(F.col("doc_id"))
    out = with_ner(toks)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple")
    doc_exchanges = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning(doc_id" in ln]
    assert len(doc_exchanges) == 1, doc_exchanges


def test_lookback_pathological_token_ids(spark):
    """20-bit position clamp: token ids beyond 2^20 in one sentence
    saturate (ties) instead of corrupting the sentence-major bits —
    inheritance still resolves, no exceptions."""
    from casie_spark.operators.ner import lookback_ner

    df = encode_ner(_toks(spark, [
        (1, 0, 0, "Microsoft", "ORGANIZATION"),
        (1, 0, 2_000_000, "company", "O"),   # beyond the 2^20 field
        (1, 1, 0, "company", "O"),
    ]))
    m = _ner_map(lookback_ner(df))
    assert m[(1, 0)] == "B-Organization"
    assert m[(0, 2_000_000)] == "B-Organization"
