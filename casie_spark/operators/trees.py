"""Sentence-local dependency / constituency tree operators (SURVEY
§2.9 G1–G8).

The reference walks string-keyed adjacency dicts with recursive DFS
(tree.py:3-257).  Sentences are tiny (≤ ~100 nodes), so in Spark these
are NOT distributed graph ops: they run inside one vectorized
per-sentence ``applyInPandas`` stage (``tree_features``), keeping the
doc_id partitioning and shipping only narrow feature columns back.

Reimplemented semantics (cited; differentially tested against the
reference module, which is importable pure Python):

- G1 ``build_deptree`` — governor->dependents adjacency, mutual-edge
  cycles broken by keeping the lower-index governor (tree.py:3-22);
- G2/G3 ``tree_path``/``dep_path_labels`` — node path between two
  tokens and its dependency-label sequence (tree.py:46-89).  Dep trees
  are trees, so the unique simple path (iterative BFS here) matches
  the reference's wandering DFS result;
- G4 ``build_parsetree`` — bracketed constituency string -> adjacency
  with positional node ids (tree.py:91-143; stack parser instead of
  innermost-paren string rewriting);
- G5 ``common_root``/``depth_to_root`` — lowest common ancestor and
  capped depth (tree.py:145-154; cap 25 at :168,:173);
- G6 ``list_chunks`` — NP/VP chunk spans + depth (tree.py:165-179);
- G7 ``span_head`` — multi-token span head = token whose governor lies
  outside the span (parseJsontoFeatures.py:296-358 semantics);
- G8 ``nearest_verb`` — ancestor-chain distance to the nearest verb
  (tree.py:181-207 verbsamedept/findverb).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# dependency trees: edges = [(governor, dependent, label)] with ROOT = 0
# ---------------------------------------------------------------------------

def build_deptree(edges: list[tuple[int, int, str]]) -> dict[int, list[int]]:
    """G1: governor -> [dependents]; mutual A<->B edges break the cycle
    by comparing node indices AS STRINGS (the reference splits its
    'gloss_@_idx' node keys and compares the index substring
    lexicographically, tree.py:14-20 — so '10' < '9' keeps the edge a
    numeric compare would drop).  Quirk preserved for parity."""
    tree: dict[int, list[int]] = {}
    for gov, dep, _ in edges:
        if gov == 0:  # ROOT rows are skipped (tree.py:6-7)
            continue
        tree.setdefault(gov, []).append(dep)
    for gov in list(tree):
        for dep in list(tree[gov]):
            if dep in tree and gov in tree[dep]:
                if str(gov) < str(dep):
                    tree[dep].remove(gov)
                else:
                    tree[gov].remove(dep)
    return tree


def _parent_map(tree: dict[int, list[int]]) -> dict[int, int]:
    return {dep: gov for gov, deps in tree.items() for dep in deps}


def tree_path(tree: dict[int, list[int]], start: int, end: int) -> list[int]:
    """G2: node path start..end (inclusive); [] if disconnected.
    BFS over the undirected tree — the unique simple path."""
    if start == end:
        return [start]
    adj: dict[int, set[int]] = {}
    for gov, deps in tree.items():
        for dep in deps:
            adj.setdefault(gov, set()).add(dep)
            adj.setdefault(dep, set()).add(gov)
    if start not in adj or end not in adj:
        return []
    prev = {start: start}
    q = deque([start])
    while q:
        n = q.popleft()
        if n == end:
            break
        for m in adj.get(n, ()):
            if m not in prev:
                prev[m] = n
                q.append(m)
    if end not in prev:
        return []
    path = [end]
    while path[-1] != start:
        path.append(prev[path[-1]])
    return path[::-1]


def dep_path_labels(path: list[int],
                    edges: list[tuple[int, int, str]]) -> list[str]:
    """G3: dependency labels along a node path, direction-insensitive
    with first-match-wins like the reference (tree.py:76-89)."""
    out = []
    for a, b in zip(path, path[1:]):
        for gov, dep, label in edges:
            if (gov == a and dep == b) or (gov == b and dep == a):
                out.append(label)
                break
    return out


def depth_to_root(tree: dict[int, list[int]], node: int, cap: int = 25) -> int:
    """G5: ancestor-chain length, capped (tree.py:168 min(...,25))."""
    parent = _parent_map(tree)
    d = 0
    while node in parent and d < cap:
        node = parent[node]
        d += 1
    return min(d, cap)


def common_root(tree: dict[int, list[int]], a: int, b: int) -> int | None:
    """G5: lowest common ancestor of a and b (None if disconnected)."""
    parent = _parent_map(tree)

    def chain(n):
        seen = [n]
        while n in parent:
            n = parent[n]
            seen.append(n)
        return seen

    ancestors_a = set(chain(a))
    for n in chain(b):
        if n in ancestors_a:
            return n
    return None


def nearest_verb(tree: dict[int, list[int]], head: int,
                 verbs: list[int]) -> tuple[int, int]:
    """G8: walk the governor chain from ``head``; the first verb found
    at ancestor distance d wins; min over candidates
    (verbsamedept/findverb, tree.py:181-207).  Returns (verb, dist)
    or (-1, -1)."""
    parent = _parent_map(tree)
    chain = []
    n = head
    while n in parent:
        n = parent[n]
        chain.append(n)
    best = (-1, -1)
    for v in verbs:
        if v in chain:
            d = chain.index(v) + 1
            if best[1] == -1 or d < best[1]:
                best = (v, d)
    return best


def span_head(tree: dict[int, list[int]], span: list[int]) -> int:
    """G7: head of a multi-token span = the token whose governor is
    outside the span (or the first token when none qualifies)."""
    parent = _parent_map(tree)
    inside = set(span)
    for t in span:
        if parent.get(t) not in inside:
            return t
    return span[0]


# ---------------------------------------------------------------------------
# constituency trees from bracketed strings
# ---------------------------------------------------------------------------

def build_parsetree(bracketed: str) -> dict[str, list[str]]:
    """G4: '(ROOT (S (NP (DT the) (NN cat)) (VP (VBZ sat))))' ->
    adjacency {label_@_pos: [children...]}, leaves as token_@_pos.
    Node ids are positional so repeated labels stay distinct (the
    reference disambiguates the same way, tree.py:103-106)."""
    toks = bracketed.replace("(", " ( ").replace(")", " ) ").split()
    tree: dict[str, list[str]] = {}
    stack: list[str] = []
    counter = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            label = toks[i + 1]
            node = f"{label}_@_{counter}"
            counter += 1
            if stack:
                tree.setdefault(stack[-1], []).append(node)
            stack.append(node)
            tree.setdefault(node, [])
            i += 2
        elif t == ")":
            stack.pop()
            i += 1
        else:
            leaf = f"{t}_@_{counter}"
            counter += 1
            tree.setdefault(stack[-1], []).append(leaf)
            i += 1
    # internal nodes with a single leaf child (POS preterminals) stay
    # in the adjacency, like the reference
    return {k: v for k, v in tree.items() if v}


def _leaves(tree: dict[str, list[str]], node: str) -> list[str]:
    out = []
    for c in tree.get(node, []):
        if c in tree:
            out.extend(_leaves(tree, c))
        else:
            out.append(c)
    return out


def _const_depth(tree: dict[str, list[str]], node: str, cap: int = 25) -> int:
    parent = {c: p for p, cs in tree.items() for c in cs}
    d = 0
    while node in parent and d < cap:
        node = parent[node]
        d += 1
    return min(d, cap)


def list_chunks(tree: dict[str, list[str]]):
    """G6: (np_chunks, vp_chunks, np_depths, vp_depths); chunks are
    leaf-token lists of length > 1, depths capped at 25
    (tree.py:165-179)."""
    nps, vps, dnp, dvp = [], [], [], []
    for node in tree:
        label = node.split("_@_")[0]
        if label.startswith("NP"):
            chnk = [x.split("_@_")[0] for x in _leaves(tree, node)]
            if len(chnk) > 1:
                nps.append(chnk)
                dnp.append(_const_depth(tree, node))
        elif label.startswith("VP"):
            chnk = [x.split("_@_")[0] for x in _leaves(tree, node)]
            if len(chnk) > 1:
                vps.append(chnk)
                dvp.append(_const_depth(tree, node))
    return nps, vps, dnp, dvp


def subtree_tokens(tree: dict[str, list[str]], node: str,
                   tokenlist: list[str]) -> list[str]:
    """G: ``subtree`` (reference tree.py:209-221): gather the leaf
    nodes under ``node`` whose gloss is in ``tokenlist``, in DFS child
    order.  Quirks preserved:

    - hitting a child whose node string CONTAINS ``'S_@_'`` stops the
      scan of the current node's remaining children only (the
      reference's early ``return`` is not propagated by its callers) —
      and because it is a substring test, labels *ending* in S (NNS,
      NNPS) trigger it too;
    - the gloss membership test runs before the S test, so a token
      literally spelled like a label is collected, not aborted.
    """
    out: list[str] = []

    def walk(n: str) -> None:
        for x in tree.get(n, []):
            if "_@_" not in x:
                continue
            nd = x.split("_@_")[0]
            if nd in tokenlist:
                out.append(x)
            elif "S_@_" in x:
                return
            else:
                walk(x)

    walk(node)
    return out


def select_sub_s(tree: dict[str, list[str]],
                 tokens: list[str]) -> list[list[str]]:
    """G: ``selectSubS`` (reference tree.py:224-253): token runs under
    non-top-level S nodes that have no NP-labeled child (subordinate
    clauses without a subject), each run split at comma-initial
    leaves.  ``idx != '1'`` excludes the sentence's top S (node
    numbering assigns 1 to the S directly under ROOT on both sides)."""
    tokenlist = list(tokens)
    slist = []
    for node in tree:
        nd, idx = node.split("_@_")[0], node.split("_@_")[-1]
        if nd == "S" and idx != "1":
            for child in tree[node]:
                if "NP" in child:
                    break
            else:
                slist.append(node)
    out: list[list[str]] = []
    for node in slist:
        stree = subtree_tokens(tree, node, tokenlist)
        b = 0
        for i in range(len(stree)):
            if stree[i].startswith(","):
                out.append(stree[b:i])
                b = i + 1
        out.append(stree[b:len(stree)])
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

TREE_FEATURES_SCHEMA = (
    "doc_id string, sent_id int, token_id int, depth int, "
    "nearest_verb_id int, nearest_verb_dist int"
)


def synth_deps(tokens: list[str]) -> list[tuple[int, int, str]]:
    """Deterministic stand-in dependency parse (no CoreNLP in this
    container): first verb-ish token governs the rest; others attach to
    the nearest preceding verb-or-first token.  Real deployments feed
    parser output through the identical edge schema."""
    verbish = [i + 1 for i, t in enumerate(tokens)
               if t.lower().endswith(("s", "ed", "ing")) and t.isalpha()]
    root = verbish[0] if verbish else 1
    edges = [(0, root, "root")]
    for i in range(1, len(tokens) + 1):
        if i == root:
            continue
        govs = [v for v in verbish if v <= i] or [root]
        gov = govs[-1] if govs[-1] != i else (govs[-2] if len(govs) > 1 else root)
        if gov == i:
            gov = root
        edges.append((gov, i, "dep"))
    return edges


def tree_features(tokens: DataFrame) -> DataFrame:
    """Per-sentence tree features via one grouped Arrow stage: depth in
    the dep tree and nearest-verb ancestor distance per token.  Groups
    are (doc_id, sent_id) — sentence-local, so the stage rides the
    existing doc_id partitioning modulo one narrow shuffle."""

    def per_sentence(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("token_id")
        toks = list(pdf["token"])
        edges = synth_deps(toks)
        tree = build_deptree(edges)
        verbs = [i + 1 for i, t in enumerate(toks)
                 if t.lower().endswith(("s", "ed", "ing")) and t.isalpha()]
        rows = []
        for i in range(1, len(toks) + 1):
            v, d = nearest_verb(tree, i, verbs)
            rows.append({
                "doc_id": pdf["doc_id"].iloc[0],
                "sent_id": int(pdf["sent_id"].iloc[0]),
                "token_id": i - 1,
                "depth": depth_to_root(tree, i),
                "nearest_verb_id": v - 1 if v > 0 else -1,
                "nearest_verb_dist": d,
            })
        return pd.DataFrame(rows)

    return (
        tokens.select("doc_id", "sent_id", "token_id", "token")
        .groupBy("doc_id", "sent_id")
        .applyInPandas(per_sentence, schema=TREE_FEATURES_SCHEMA)
    )
