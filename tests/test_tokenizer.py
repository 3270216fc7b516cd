"""Tokenizer golden tests — offsets are load-bearing (every downstream
join keys on characterOffsetBegin, reference prepare.py:310-311), so
this freezes the tokenizer behavior."""

from __future__ import annotations

from casie_spark.operators.tokenizer import tokenize, tokenize_text


def test_offsets_exact_pure():
    text = "Hackers breached Acme. CVE-2019-1234 was patched in v1.2.3!"
    toks = tokenize_text(text)
    for sent_id, token_id, tok, begin, end in toks:
        assert text[begin:end] == tok
    surfaces = [t[2] for t in toks]
    assert "CVE-2019-1234" in surfaces  # CVE kept as one token
    assert "v1.2.3" in surfaces  # version kept as one token
    assert surfaces[0] == "Hackers"
    # two sentences
    assert max(t[0] for t in toks) == 1


def test_sentence_split_newline_and_punct():
    toks = tokenize_text("First line\nSecond line. Third one?")
    sents = sorted({t[0] for t in toks})
    assert sents == [0, 1, 2]


def test_empty_and_whitespace():
    assert tokenize_text("") == []
    assert tokenize_text("   \n  ") == []


def test_spark_tokenize_roundtrip(spark):
    docs = spark.createDataFrame(
        [("d1", "Alice pays $5,000. Bob runs v2.0."), ("d2", "")],
        "doc_id string, text string",
    )
    out = tokenize(docs).collect()
    assert all(r["doc_id"] == "d1" for r in out)
    text = "Alice pays $5,000. Bob runs v2.0."
    for r in out:
        assert text[r["begin"]:r["end"]] == r["token"]
    assert {r["sent_id"] for r in out} == {0, 1}
