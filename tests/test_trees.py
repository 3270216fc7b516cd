"""Differential tests: casie_spark.operators.trees vs the reference's
tree.py (pure Python, imported directly from /root/reference — read
only).  The rebuild uses integer node ids and iterative traversals;
these tests prove the *semantics* match on shared inputs."""

from __future__ import annotations

import importlib.util

import pytest

from casie_spark.operators.trees import (
    build_deptree,
    build_parsetree,
    common_root,
    dep_path_labels,
    depth_to_root,
    list_chunks,
    nearest_verb,
    span_head,
    synth_deps,
    tree_features,
    tree_path,
)


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_tree", "/root/reference/code/tree.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


EDGES = [(0, 1, "root"), (1, 2, "a"), (2, 3, "b"), (2, 4, "c"), (1, 5, "d")]


def _enh(edges):
    return [{"governor": g, "dependent": d, "dep": l,
             "governorGloss": f"g{g}" if g else "ROOT",
             "dependentGloss": f"g{d}"} for g, d, l in edges]


def _to_ref(tree):
    return {f"g{g}_@_{g}": [f"g{d}_@_{d}" for d in deps]
            for g, deps in tree.items() if deps}


def _ids(path):
    return [int(p.split("_@_")[1]) for p in path]


def test_build_deptree_matches_reference(ref):
    mine = build_deptree(EDGES)
    theirs = ref.build_deptree(_enh(EDGES))
    assert _to_ref(mine) == theirs

    # mutual edge cycle: reference keeps lower (string) index governor
    cyc = [(0, 1, "root"), (1, 2, "a"), (2, 1, "x"), (2, 3, "b")]
    mine = build_deptree(cyc)
    theirs = ref.build_deptree(_enh(cyc))
    assert _to_ref(mine) == theirs

    # >=10-node cycle: the index compare is LEXICOGRAPHIC in the
    # reference ('10' < '9'), so the surviving edge differs from a
    # numeric compare — quirk must match
    cyc10 = [(0, 1, "root"), (1, 9, "a"), (9, 10, "b"), (10, 9, "x"),
             (9, 2, "c")]
    mine = build_deptree(cyc10)
    theirs = ref.build_deptree(_enh(cyc10))
    assert _to_ref(mine) == theirs


def test_paths_match_reference(ref):
    mine = build_deptree(EDGES)
    theirs = ref.build_deptree(_enh(EDGES))
    for a, b in [(3, 5), (3, 4), (5, 4), (1, 3)]:
        got = tree_path(mine, a, b)
        want = _ids(ref.find_path(theirs, f"g{a}_@_{a}", f"g{b}_@_{b}", [], {}))
        assert got == want, (a, b, got, want)

    ref_labels = ref.todeppath(["g3_@_3", "g2_@_2", "g1_@_1"], _enh(EDGES))
    assert dep_path_labels([3, 2, 1], EDGES) == ref_labels == ["b", "a"]


def test_lca_and_depth():
    t = build_deptree(EDGES)
    assert common_root(t, 3, 4) == 2
    assert common_root(t, 3, 5) == 1
    assert depth_to_root(t, 3) == 2
    assert depth_to_root(t, 1) == 0
    assert depth_to_root(t, 3, cap=1) == 1


def test_parsetree_chunks_match_reference(ref):
    cfp = ("(ROOT (S (NP (DT the) (NN cat)) "
           "(VP (VBD sat) (PP (IN on) (NP (NNS mats))))))")
    toks = [{"originalText": w, "index": i + 1}
            for i, w in enumerate("the cat sat on mats".split())]
    r_np, r_vp, r_dnp, r_dvp = ref.list_chunk(ref.build_parsetree(cfp, toks))
    strip = lambda ch: [x.split("_@_")[0] for x in ch]  # noqa: E731
    m_np, m_vp, m_dnp, m_dvp = list_chunks(build_parsetree(cfp))
    assert sorted(map(strip, r_np)) == sorted(m_np)
    assert sorted(map(strip, r_vp)) == sorted(m_vp)
    assert sorted(r_dnp) == sorted(m_dnp)
    assert sorted(r_dvp) == sorted(m_dvp)


def test_select_sub_s_matches_reference(ref):
    """selectSubS/subtree differential: subordinate S clauses without
    an NP child, comma-split, quirks included (the 'S_@_' substring
    abort, preterminal-vs-leaf comma collection)."""
    from casie_spark.operators.trees import select_sub_s, subtree_tokens

    cfp = ("(ROOT (S (NP (DT The) (NN hacker)) "
           "(VP (VBD stole) (NN data)) "
           "(S (VP (VBG escaping) (, ,) (RB quickly)))))")
    words = ["The", "hacker", "stole", "data", "escaping", ",", "quickly"]
    toks = [{"originalText": w, "index": i + 1} for i, w in enumerate(words)]

    theirs = ref.selectSubS(ref.build_parsetree(cfp, toks), toks)
    mine = select_sub_s(build_parsetree(cfp), words)
    strip = lambda run: [x.split("_@_")[0] for x in run]  # noqa: E731
    assert [strip(r) for r in theirs] == [strip(r) for r in mine]
    assert [strip(r) for r in mine] == [["escaping"], ["quickly"]]

    # NNS label triggers the substring-S abort in BOTH implementations
    cfp2 = ("(ROOT (S (NP (DT a)) (VP (VBD hit) "
            "(S (VP (VBG running) (NP (NNS dogs) (NN fast)))))))")
    words2 = ["a", "hit", "running", "dogs", "fast"]
    toks2 = [{"originalText": w, "index": i + 1} for i, w in enumerate(words2)]
    rtree = ref.build_parsetree(cfp2, toks2)
    mtree = build_parsetree(cfp2)
    rS = [n for n in rtree if n.split("_@_")[0] == "S"
          and n.split("_@_")[-1] != "1"]
    mS = [n for n in mtree if n.split("_@_")[0] == "S"
          and n.split("_@_")[-1] != "1"]
    assert len(rS) == len(mS) == 1
    got_r = strip(ref.subtree(rS[0], rtree, words2, []))
    got_m = strip(subtree_tokens(mtree, mS[0], words2))
    assert got_r == got_m


def test_nearest_verb_matches_reference(ref):
    mine = build_deptree(EDGES)
    theirs = ref.build_deptree(_enh(EDGES))
    # verblist holds 0-based token positions in the reference
    for head, verbs0 in [(4, [0, 1]), (3, [1]), (5, [1])]:
        rv, rd = ref.verbsamedept(f"g{head}_@_{head}", verbs0, theirs)
        mv, md = nearest_verb(mine, head, [v + 1 for v in verbs0])
        if rv == -1:
            assert (mv, md) == (-1, -1)
        else:
            assert (mv, md) == (rv + 1, rd), (head, verbs0)


def test_span_head():
    t = build_deptree(EDGES)
    assert span_head(t, [3, 4]) == 3  # both governed by 2 (outside)
    assert span_head(t, [2, 3, 4]) == 2  # 2's governor (1) is outside


def test_tree_features_spark(spark):
    docs = spark.createDataFrame(
        [("u1", 0, 0, "Hackers"), ("u1", 0, 1, "breached"),
         ("u1", 0, 2, "the"), ("u1", 0, 3, "server"),
         ("u2", 0, 0, "ok")],
        "doc_id string, sent_id int, token_id int, token string")
    out = tree_features(docs).collect()
    assert len(out) == 5
    by_key = {(r["doc_id"], r["token_id"]): r for r in out}
    # "Hackers" (first verb-ish token under the suffix heuristic) is
    # the root of u1: depth 0, later tokens hang below a verb-ish gov
    assert by_key[("u1", 0)]["depth"] == 0
    assert by_key[("u1", 3)]["nearest_verb_dist"] >= 1
    assert all(0 <= r["depth"] <= 25 for r in out)


def test_synth_deps_is_a_tree():
    toks = "Hackers breached the server using stolen credentials".split()
    edges = synth_deps(toks)
    deps = [d for _, d, _ in edges]
    assert sorted(deps) == list(range(1, len(toks) + 1))  # every token once
    t = build_deptree(edges)
    for i in range(1, len(toks) + 1):
        assert depth_to_root(t, i) < 25  # acyclic, rooted
