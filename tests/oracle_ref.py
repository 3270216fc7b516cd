"""Sequential pure-Python oracle of the pipeline semantics.

An independent, loop-based implementation of the reference linking
semantics (reference code/link_coref.py:1228-1457 as specified in
casie_spark.operators.{tagging,spans,linking,roles} docstrings),
written directly against the gold JSON.  The differential parity test
runs the distributed Spark pipeline and this oracle over the same
corpus and requires their (doc, event_begin, role, arg_begin) triple
sets to agree — any bug in the window/join formulation shows up as a
mismatch here.

Divergences from the reference, mirrored deliberately by BOTH sides
(documented in the operator docstrings):
- upstream (gold/model) role preferred over single-valued forcing;
- tie-break scans tokens of the full argument char span (the reference
  uses ``startOffset + len(token_list)`` — a token-count used as a char
  length, link_coref.py:1385-1387).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from casie_spark.config import PAIR, ROLE_PAIR  # noqa: E402
from casie_spark.operators.tokenizer import tokenize_text  # noqa: E402


def _null_first(v):
    return (v is None, v)


def replay_tags(content: str, events: list[dict]) -> list[dict]:
    """events: gold event dicts. Returns token dicts with tags."""
    toks = [
        {"sent": s, "tid": t, "tok": w, "begin": b, "end": e,
         "trig": "O", "arg": "O", "role": None, "realis": None}
        for (s, t, w, b, e) in tokenize_text(content)
    ]
    nugs = sorted(
        [(ev["nugget"]["startOffset"], ev["nugget"]["endOffset"],
          ev["subtype"], ev.get("realis")) for ev in events],
        key=lambda x: (-x[0], x[1], x[2], _null_first(x[3])),
    )
    args = {}
    for ev in events:
        for a in ev.get("argument") or []:
            key = (a["startOffset"], a["endOffset"])
            cand = (a["type"], (a.get("role") or {}).get("type"))
            if key not in args or (cand[0], _null_first(cand[1])) < (
                args[key][0], _null_first(args[key][1])
            ):
                args[key] = cand
    for t in toks:
        for b, e, label, realis in nugs:  # sorted: innermost first
            if b <= t["begin"] < e:
                t["trig"] = "B-" + label if t["begin"] == b else "I-" + label
                t["realis"] = realis
                break
        best = None
        for (b, e), (label, role) in args.items():
            if b <= t["begin"] < e:
                k = (-b, e, label, _null_first(role))
                if best is None or k < best[0]:
                    best = (k, b, label, role)
        if best:
            _, b, label, role = best
            t["arg"] = "B-" + label if t["begin"] == b else "I-" + label
            t["role"] = role
            t["trig"] = "O"  # argument wins (link_coref.py:613-614)
    return toks


def spans(toks, key):
    """BIO runs -> spans [{sent, begin, end, label, first, role/realis}]."""
    out = []
    prev_label, prev_sent = "", None
    for t in toks:
        tag = t[key]
        label = "" if tag == "O" else tag[2:]
        new_sent = t["sent"] != prev_sent
        if tag != "O" and (
            tag.startswith("B-")
            or (tag.startswith("I-") and (new_sent or prev_label != label))
        ):
            out.append({"sent": t["sent"], "begin": t["begin"], "end": t["end"],
                        "label": label, "first": t["tid"], "toks": [t["tok"]],
                        "role": t["role"], "realis": t["realis"]})
        elif tag != "O":
            out[-1]["toks"].append(t["tok"])
            out[-1]["end"] = t["end"]
        prev_label, prev_sent = label, t["sent"]
    return out


def link_oracle(content: str, events: list[dict]) -> set[tuple]:
    """-> {(event_begin, role, arg_begin)} triples for one document."""
    toks = replay_tags(content, events)
    evs = sorted(spans(toks, "trig"), key=lambda s: (s["sent"], s["first"]))
    ars = sorted(spans(toks, "arg"), key=lambda s: (s["sent"], s["first"]))
    for i, e in enumerate(evs):
        e["event_id"] = i
    for i, a in enumerate(ars):
        a["arg_id"] = i

    ev_sents = {e["sent"] for e in evs}
    trig_toks = [t for t in toks if t["trig"] != "O"]

    def nearest_trigger(tok):
        same = [tt for tt in trig_toks if tt["sent"] == tok["sent"]]
        if same:
            tt = min(same, key=lambda x: (abs(x["tid"] - tok["tid"]), x["tid"]))
            pos = "before" if tt["tid"] < tok["tid"] else "after"
            return tt["tok"], pos
        adj = [tt for tt in trig_toks if abs(tt["sent"] - tok["sent"]) == 1]
        if adj:
            tt = min(adj, key=lambda x: (x["sent"], x["tid"]))
            return tt["tok"], "differsentence"
        return None, None

    attached = []  # (event, arg)
    for a in ars:
        if a["sent"] in ev_sents:
            sel = a["sent"]
        elif a["sent"] - 1 in ev_sents:
            sel = a["sent"] - 1
        else:
            continue
        cands = [e for e in evs if e["sent"] == sel and a["label"] in PAIR[e["label"]]]
        if not cands:
            continue
        if len(cands) == 1:
            attached.append((cands[0], a))
            continue
        span_toks = [t for t in toks
                     if t["sent"] == a["sent"] and a["begin"] <= t["begin"] < a["end"]]
        done = False
        for t in span_toks:
            near, pos = nearest_trigger(t)
            if near is None:
                continue
            for e in cands:
                if near not in e["toks"]:
                    continue
                if pos in ("before", "differsentence") and e["begin"] <= t["begin"]:
                    attached.append((e, a))
                    done = True
                elif pos == "after" and e["begin"] >= t["begin"]:
                    attached.append((e, a))
                    done = True
                if done:
                    break
            if done:
                break

    # roles (upstream-first; Databreach Number neighbor rule)
    by_event: dict[int, list] = {}
    for e, a in attached:
        by_event.setdefault(e["event_id"], []).append(a)
    triples = set()
    for e, a in attached:
        legal = ROLE_PAIR[e["label"]].get(a["label"], [])
        role = a["role"]
        if role is None and len(legal) == 1:
            role = legal[0]
        if role is None and legal:
            role = legal[0]
        if e["label"] == "Databreach" and a["label"] == "Number":
            sibs = sorted(by_event[e["event_id"]], key=lambda x: x["arg_id"])
            idx = next(i for i, s in enumerate(sibs) if s["arg_id"] == a["arg_id"])
            if idx + 1 < len(sibs):
                nxt = sibs[idx + 1]
                legal_n = ROLE_PAIR[e["label"]].get(nxt["label"], [])
                nrole = nxt["role"] or (legal_n[0] if legal_n else None)
                if nrole == "Victim":
                    role = "Number-of-Victim"
                elif nrole == "Compromised-Data":
                    role = "Number-of-Compromised-Data"
        triples.add((e["begin"], role or "has_argument", a["begin"]))
    return triples
