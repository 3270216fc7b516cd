"""Event coreference clustering (the document-global graph op,
SURVEY.md section 2.9).

Reference: corefdiffbyevent + average-linkage AgglomerativeClustering
per (doc, event subtype), 7 weighted distance features, threshold 0.75
(code/link_coref.py:1530-1679, :2041-2044).  Events of the same
cluster form a hopper ('Same' relation).

v1 deterministic substitutes for the model/parse-dependent features
(documented divergences — a w2v matrix or coref chains slot in without
changing the column contract):
- nugget surface distance: 1 - char-trigram Jaccard (reference uses
  word2vec cosine, strdist :240-309)
- argument coref similarity: constant 1.0 (reference reads CoreNLP
  coref chains) — constant columns vanish under the reference's own
  min-max normalization (:1617-1651)

Implementation: one ``applyInPandas`` per doc_id group (sklearn-free
numpy average-linkage; event counts per doc are tens at most).  The
grouping key is doc_id, so the stage rides the pipeline's existing
doc_id partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import COREF_THRESHOLD, COREF_WEIGHTS

OUT_SCHEMA_TMPL = "doc_id {id_type}, event_id long, cluster_id long"


def _trigram_jaccard(a: str, b: str) -> float:
    a, b = (a or "").lower(), (b or "").lower()
    ta = {a[i:i + 3] for i in range(max(1, len(a) - 2))}
    tb = {b[i:i + 3] for i in range(max(1, len(b) - 2))}
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


def _minmax(m: np.ndarray) -> np.ndarray:
    lo, hi = m.min(), m.max()
    if hi <= lo:
        return np.zeros_like(m)
    return (m - lo) / (hi - lo)


def average_linkage_clusters(dist: np.ndarray, threshold: float) -> list[int]:
    """Deterministic average-linkage agglomerative clustering: merge the
    closest pair (ties -> smallest indices) while min distance <=
    threshold.  Mirrors sklearn AgglomerativeClustering(linkage=
    'average', distance_threshold=...) semantics."""
    n = dist.shape[0]
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    d = {(i, j): float(dist[i, j]) for i in range(n) for j in range(i + 1, n)}
    nxt = n
    while len(clusters) > 1:
        (i, j), best = min(d.items(), key=lambda kv: (kv[1], kv[0]))
        if best > threshold:
            break
        merged = clusters.pop(i) + clusters.pop(j)
        # average linkage: distance to new cluster = size-weighted mean
        newd = {}
        for k, members in clusters.items():
            pairs = [(min(a, b), max(a, b)) for a in merged for b in members]
            newd[k] = float(np.mean([dist[a, b] for a, b in pairs]))
        clusters[nxt] = merged
        d = {
            (a, b): v
            for (a, b), v in d.items()
            if a not in (i, j) and b not in (i, j)
        }
        for k, v in newd.items():
            d[(min(k, nxt), max(k, nxt))] = v
        nxt += 1
    labels = [0] * n
    for cid, members in enumerate(sorted(clusters.values(), key=min)):
        for m in members:
            labels[m] = cid
    return labels


def _cluster_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    doc_id = pdf["doc_id"].iloc[0]
    next_cluster = 0
    for subtype in sorted(pdf["subtype"].unique()):
        sub = pdf[pdf["subtype"] == subtype].sort_values("event_id")
        n = len(sub)
        if n == 1:
            out.append((doc_id, int(sub["event_id"].iloc[0]), next_cluster))
            next_cluster += 1
            continue
        texts = sub["event_text"].tolist()
        sents = sub["sent_id"].to_numpy(dtype=float)
        realis = sub["realis"].fillna("").tolist()
        argsets = [set((s or "").split("|")) - {""} for s in sub["arg_types"]]

        nugdiff = np.zeros((n, n))
        nugdist = np.zeros((n, n))
        realisdiff = np.zeros((n, n))
        argtype = np.zeros((n, n))
        argmiss = np.zeros((n, n))
        timedist = np.zeros((n, n))
        argcoref = np.ones((n, n))
        np.fill_diagonal(argcoref, 0.0)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                nugdiff[i, j] = 1.0 - _trigram_jaccard(texts[i], texts[j])
                nugdist[i, j] = abs(sents[i] - sents[j])
                realisdiff[i, j] = 0.0 if realis[i] == realis[j] else 1.0
                inter = len(argsets[i] & argsets[j])
                argtype[i, j] = inter
                argmiss[i, j] = len(argsets[i]) - inter

        feats = [
            _minmax(nugdiff), _minmax(nugdist), _minmax(realisdiff),
            1.0 - _minmax(argtype),  # more shared arg types -> closer
            _minmax(argmiss), _minmax(timedist), _minmax(argcoref),
        ]
        dist = sum(w * f for w, f in zip(COREF_WEIGHTS, feats))
        np.fill_diagonal(dist, 0.0)
        labels = average_linkage_clusters(dist, COREF_THRESHOLD)
        for eid, lab in zip(sub["event_id"], labels):
            out.append((doc_id, int(eid), next_cluster + lab))
        next_cluster += max(labels) + 1
    return pd.DataFrame(out, columns=["doc_id", "event_id", "cluster_id"])


def cluster_events(events: DataFrame, linked: DataFrame) -> DataFrame:
    """events + linked arg pairs -> (doc_id, event_id, cluster_id)."""
    argl = (
        linked.groupBy("doc_id", "event_id")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list("arg_type"))).alias("arg_types"))
    )
    base = events.select(
        "doc_id", "event_id",
        F.col("subtype"), F.col("sent_id"),
        F.col("text").alias("event_text"),
        (F.col("realis") if "realis" in events.columns else F.lit(None).cast("string")).alias("realis"),
    ).join(argl, ["doc_id", "event_id"], "left")
    # doc_id type follows the input (url string or hashed long key)
    id_type = dict(events.dtypes)["doc_id"]
    return base.groupBy("doc_id").applyInPandas(
        _cluster_doc, schema=OUT_SCHEMA_TMPL.format(id_type=id_type)
    )
