"""Deterministic sentence splitter + tokenizer with exact char offsets.

Replaces the reference's external Stanford CoreNLP dependency
(reference code/parseJsontoFeatures.py:1-5 reads precomputed CoreNLP
JSON).  Every downstream stage joins on ``characterOffsetBegin``
(prepare.py:310-311), so offsets here are frozen by golden tests —
see tests/test_tokenizer.py.

Implementation: ``mapInPandas`` (Arrow-batched; the sanctioned slow
path — tokenization is inherently per-document string work, but there
is no per-row Python UDF: each Arrow batch is processed as a pandas
block and regex scanning is C-speed via ``re``).  Documents are
independent, so the stage is embarrassingly parallel and scales with
input partitions; upstream callers salt-repartition by url hash to
defuse domain skew (pipeline.py).

Tokenization rules (deterministic, Unicode-aware):
- sentences: split at newline, or at [.!?]+ followed by whitespace;
  the terminator stays with its sentence.
- tokens: ``CVE-\\d+-\\d+`` | version strings | word chars (incl.
  ``'`` and ``-`` joins like "cyber-attack") | single punctuation.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TOKENS_SCHEMA_TMPL = (
    "doc_id {id_type}, sent_id int, token_id int, token string, "
    "begin long, end long"
)
TOKENS_SCHEMA = TOKENS_SCHEMA_TMPL.format(id_type="string")

# Order matters: CVE > version > number > word(+internal '-/'), > single char.
_TOKEN_RE = re.compile(
    r"CVE-\d+-\d+"
    r"|v?\d+\.\d+(?:\.\d+)*"
    r"|\$?\d[\d,]*(?:\.\d+)?"
    r"|\w+(?:[-'’]\w+)*"
    r"|[^\w\s]",
    re.UNICODE,
)
# A [.!?] only terminates a sentence when followed by whitespace/EOL, so
# internal dots (versions "v1.2.3", "U.S.") don't split mid-token.
_SENT_RE = re.compile(r"[^\n]*?[.!?]+(?=\s|$)|[^\n]+", re.UNICODE)


def tokenize_text(text: str) -> list[tuple[int, int, str, int, int]]:
    """text -> [(sent_id, token_id, token, begin, end)] — pure, testable."""
    out = []
    sent_id = 0
    for m in _SENT_RE.finditer(text or ""):
        sent = m.group(0)
        if not sent.strip():
            continue
        base = m.start()
        token_id = 0
        for t in _TOKEN_RE.finditer(sent):
            out.append((sent_id, token_id, t.group(0), base + t.start(), base + t.end()))
            token_id += 1
        if token_id:
            sent_id += 1
    return out


def tokenize(documents: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", id_type: str = "string",
             context: bool = False) -> DataFrame:
    """documents -> tokens(doc_id, sent_id, token_id, token, begin, end
    [, _ptok, _ntok]).

    Column-pruned before the UDF so Arrow only ships (id, text).
    ``id_type='long'`` keeps a numeric key numeric — the pipeline hashes
    urls to 8-byte keys so every downstream sort/shuffle compares longs,
    not ~30-char url strings (a 2x memory-bandwidth saving on the token
    stream's window sorts at scale).

    ``context=True`` additionally emits the sentence-scoped previous /
    next token (null at sentence edges).  Computing them HERE is free —
    the tokenizer already walks each sentence in order inside one
    Python pass — whereas computing them downstream needs lag/lead
    windows, i.e. a full token-stream exchange.  The model tagger's
    inference expression consumes these so it can run entirely BEFORE
    the pipeline's doc_id exchange (Python-eval plan nodes do not
    propagate partitioning info, so anything a window needs must be on
    the pre-exchange side of them).
    """
    pruned = documents.selectExpr(
        f"cast({id_col} as {id_type}) as doc_id", f"{text_col} as text"
    )

    empty_cols = {
        "doc_id": pd.Series(dtype="object"),
        "sent_id": pd.Series(dtype="int32"),
        "token_id": pd.Series(dtype="int32"),
        "token": pd.Series(dtype="object"),
        "begin": pd.Series(dtype="int64"),
        "end": pd.Series(dtype="int64"),
    }
    if context:
        empty_cols["_ptok"] = pd.Series(dtype="object")
        empty_cols["_ntok"] = pd.Series(dtype="object")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_id, rows = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                toks = tokenize_text(text)
                rows_id.extend([doc_id] * len(toks))
                rows.extend(toks)
            if not rows:
                yield pd.DataFrame(empty_cols)
                continue
            sent, tok, txt, b, e = zip(*rows)
            out = {"doc_id": rows_id, "sent_id": sent, "token_id": tok,
                   "token": txt, "begin": b, "end": e}
            if context:
                n = len(txt)
                out["_ptok"] = [
                    txt[i - 1] if i > 0 and rows_id[i - 1] == rows_id[i]
                    and sent[i - 1] == sent[i] else None
                    for i in range(n)
                ]
                out["_ntok"] = [
                    txt[i + 1] if i + 1 < n and rows_id[i + 1] == rows_id[i]
                    and sent[i + 1] == sent[i] else None
                    for i in range(n)
                ]
            yield pd.DataFrame(out)

    schema = TOKENS_SCHEMA_TMPL.format(id_type=id_type)
    if context:
        schema += ", _ptok string, _ntok string"
    return pruned.mapInPandas(run, schema=schema)
