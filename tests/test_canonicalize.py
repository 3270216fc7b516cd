"""Canonicalization: dictionary, MinHash-LSH edges, connected
components, end-to-end surface clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from casie_spark.operators.canonicalize import (
    apply_dictionary,
    build_dictionary,
    canonicalize_surfaces,
    connected_components,
    minhash_edges,
)


def test_dictionary_and_cve_normalization(spark):
    ents = spark.createDataFrame(
        [("cve-2019-0708",), ("Microsoft",), ("unknownco",)], "obj string"
    )
    d = build_dictionary(spark)
    out = {r["obj"]: r["canonical_id"]
           for r in apply_dictionary(ents, d, "obj").collect()}
    assert out["cve-2019-0708"] == "CVE-2019-0708"
    assert out["Microsoft"] == "vendor:microsoft"
    assert out["unknownco"] is None


def test_minhash_edges_find_near_identical(spark):
    surf = spark.createDataFrame(
        [(1, "acme corporation"), (2, "acme corporation inc"),
         (3, "completely different zebra")],
        "surface_id long, surface string",
    )
    edges = minhash_edges(surf, "surface_id", "surface", threshold=0.5)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert (1, 2) in got
    assert all(3 not in e for e in got)


def test_connected_components_chain(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "sid long")
    comp = {r["sid"]: r["component"]
            for r in connected_components(edges, verts).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[99] == 99


def test_connected_components_random_differential(spark):
    """Seeded random graphs vs a pure-Python union-find: every vertex
    must land in component = min reachable id (the q36 oracle's
    recursive-CTE contract).  Three regimes: sparse (many singleton
    components), dense (one giant component), and a 12-node path
    (worst-case diameter for min-label propagation — exercises the
    iteration loop, not just the clique-ish LSH shape)."""
    import random

    def unionfind(n, edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min id per root
        comp = {}
        for v in range(n):
            comp.setdefault(find(v), []).append(v)
        return {v: min(vs) for r, vs in comp.items() for v in vs}

    cases = []
    rng = random.Random(36)
    for n, m in ((30, 12), (25, 60)):
        cases.append((n, [(rng.randrange(n), rng.randrange(n))
                          for _ in range(m)]))
    cases.append((12, [(i, i + 1) for i in range(11)]))  # path graph

    for n, raw in cases:
        edges_py = [(a, b) for a, b in raw if a != b]
        want = unionfind(n, edges_py)
        edges = spark.createDataFrame(edges_py or [(0, 0)], "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in range(n)], "sid long")
        got = {r["sid"]: r["component"]
               for r in connected_components(edges, verts, max_iter=40).collect()}
        assert got == want


def test_canonicalize_end_to_end(spark):
    ents = spark.createDataFrame(
        [("CVE-2020-1000",), ("Adobe",), ("acme corp",), ("acme corporation",),
         ("zebra stripes ltd",)],
        "obj string",
    )
    d = build_dictionary(spark)
    out = {r["obj"]: r["canonical_id"]
           for r in canonicalize_surfaces(ents, d, "obj").collect()}
    assert out["CVE-2020-1000"] == "CVE-2020-1000"
    assert out["Adobe"] == "vendor:adobe"
    # the two acme variants share a cluster id; zebra does not
    assert out["acme corp"] == out["acme corporation"]
    assert out["acme corp"].startswith("cluster:")
    assert out["zebra stripes ltd"] != out["acme corp"]
