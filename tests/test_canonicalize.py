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
