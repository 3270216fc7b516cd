"""BIO span assembly edge cases (FIXTURES.md section 4):
- I- without preceding B- starts a span (link_coref.py:1214-1219 repair)
- I- run changing label mid-run splits (realis_identify.py:66-83)
- spans never cross sentence boundaries
"""

from __future__ import annotations

from casie_spark.operators.spans import assemble_spans


def _tok(doc, sent, tid, tok, begin, tag):
    return (doc, sent, tid, tok, begin, begin + len(tok), tag)


SCHEMA = "doc_id string, sent_id int, token_id int, token string, begin long, end long, tag string"


def _spans(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = assemble_spans(df, "tag")
    return sorted(
        [(r["sent_id"], r["label"], r["text"], r["begin"]) for r in out.collect()]
    )


def test_basic_b_i_runs(spark):
    rows = [
        _tok("d", 0, 0, "Hackers", 0, "O"),
        _tok("d", 0, 1, "stole", 8, "B-Databreach"),
        _tok("d", 0, 2, "data", 14, "O"),
        _tok("d", 0, 3, "credit", 19, "B-Data"),
        _tok("d", 0, 4, "cards", 26, "I-Data"),
    ]
    assert _spans(spark, rows) == [
        (0, "Data", "credit cards", 19),
        (0, "Databreach", "stole", 8),
    ]


def test_i_without_b_starts_span(spark):
    rows = [
        _tok("d", 0, 0, "was", 0, "O"),
        _tok("d", 0, 1, "accessed", 4, "I-Databreach"),
        _tok("d", 0, 2, "illegally", 13, "I-Databreach"),
    ]
    assert _spans(spark, rows) == [(0, "Databreach", "accessed illegally", 4)]


def test_i_label_change_splits(spark):
    rows = [
        _tok("d", 0, 0, "patched", 0, "B-PatchVulnerability"),
        _tok("d", 0, 1, "flaw", 8, "I-DiscoverVulnerability"),
    ]
    assert _spans(spark, rows) == [
        (0, "DiscoverVulnerability", "flaw", 8),
        (0, "PatchVulnerability", "patched", 0),
    ]


def test_b_after_i_splits(spark):
    rows = [
        _tok("d", 0, 0, "a", 0, "B-Data"),
        _tok("d", 0, 1, "b", 2, "I-Data"),
        _tok("d", 0, 2, "c", 4, "B-Data"),
    ]
    assert _spans(spark, rows) == [(0, "Data", "a b", 0), (0, "Data", "c", 4)]


def test_sentence_boundary_breaks_span(spark):
    rows = [
        _tok("d", 0, 0, "stolen", 0, "B-Databreach"),
        _tok("d", 1, 0, "records", 7, "I-Databreach"),
    ]
    assert _spans(spark, rows) == [
        (0, "Databreach", "stolen", 0),
        (1, "Databreach", "records", 7),
    ]


def test_o_interrupts_run(spark):
    rows = [
        _tok("d", 0, 0, "a", 0, "B-Data"),
        _tok("d", 0, 1, "x", 2, "O"),
        _tok("d", 0, 2, "b", 4, "I-Data"),
    ]
    assert _spans(spark, rows) == [(0, "Data", "a", 0), (0, "Data", "b", 4)]


def test_multi_doc_partitioning(spark):
    rows = []
    for d in range(6):
        rows += [
            _tok(f"d{d}", 0, 0, "w0", 0, "B-CVE"),
            _tok(f"d{d}", 0, 1, "w1", 3, "I-CVE"),
        ]
    df = spark.createDataFrame(rows, SCHEMA).repartition(4)
    out = assemble_spans(df, "tag").collect()
    assert len(out) == 6
    assert all(r["text"] == "w0 w1" and r["n_tokens"] == 2 for r in out)
