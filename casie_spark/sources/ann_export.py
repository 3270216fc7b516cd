"""Optional brat ``.ann`` export (SURVEY §2.1 S7).

The reference appends event/realis annotations to brat standoff files
(report.py:174-192 realis_to_ann; nugget/attribute writers :260+).
Gold stays in parquet here, so this is an export surface only: the
triples DataFrame is partitioned by document and rendered as standoff
lines — ``T<n>`` text-bound spans, ``E<n>`` events, ``A<n>`` realis
attributes — distributed via one per-doc ``applyInPandas``.

Offsets are the pipeline's extracted-text character offsets (the same
coordinate system brat uses against the stripped body, cuthead
semantics report.py:12-15).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

ANN_SCHEMA = "doc_id string, ann string"


def _render_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    lines: list[str] = []
    tid = eid = aid = 1
    span_ids: dict[tuple, int] = {}

    def span(begin: int, end: int, label: str, text: str) -> int:
        nonlocal tid
        key = (begin, end, label)
        if key not in span_ids:
            span_ids[key] = tid
            lines.append(f"T{tid}\t{label} {begin} {end}\t{text}")
            tid += 1
        return span_ids[key]

    for ev_key, grp in pdf.groupby("event_id", sort=True):
        first = grp.iloc[0]
        trig = span(int(first["event_begin"]),
                    int(first["event_begin"]) + len(first["subj"]),
                    first["event_subtype"], first["subj"])
        args = []
        for _, r in grp.sort_values("arg_begin").iterrows():
            a = span(int(r["arg_begin"]),
                     int(r["arg_begin"]) + len(r["obj"]),
                     r["pred"], r["obj"])
            args.append(f"{r['pred']}:T{a}")
        lines.append(
            f"E{eid}\t{first['event_subtype']}:T{trig} " + " ".join(args)
        )
        if first.get("realis"):
            lines.append(f"A{aid}\tRealis E{eid} {first['realis']}")
            aid += 1
        eid += 1

    return pd.DataFrame(
        {"doc_id": [pdf["doc_id"].iloc[0]], "ann": ["\n".join(lines)]}
    )


def triples_to_ann(triples: DataFrame) -> DataFrame:
    """triples -> one (doc_id, ann) row per document, ann = the full
    brat standoff block (T/E/A lines)."""
    cols = ["doc_id", "event_id", "event_begin", "subj", "event_subtype",
            "pred", "obj", "arg_begin", "realis"]
    return (
        triples.select(*[c for c in cols if c in triples.columns])
        .groupBy("doc_id")
        .applyInPandas(_render_doc, schema=ANN_SCHEMA)
    )


def write_ann_files(ann_df: DataFrame, out_dir: str,
                    rows: Iterable | None = None) -> int:
    """Write one ``<doc>.ann`` per document.  Driver-side file write —
    export utility for small selections, not a bulk sink (the bulk
    graph sink is sources.sinks.write_graph)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for r in (rows if rows is not None else ann_df.toLocalIterator()):
        name = str(r["doc_id"]).replace("/", "_").replace(":", "_")
        with open(os.path.join(out_dir, f"{name}.ann"), "w") as f:
            f.write(r["ann"] + "\n")
        n += 1
    return n
