"""Graph materialization + manifest-based checkpoint resume."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from casie_spark.manifests import pending_buckets, read_manifest
from casie_spark.sources.documents import synth_documents
from casie_spark.sources.sinks import build_graph, resumable_run, write_graph


def test_build_and_write_graph(spark, tmp_path):
    docs = synth_documents(spark, 60)
    vertices, edges = build_graph(docs)
    out = str(tmp_path / "graph")
    write_graph(vertices, edges, out)

    e = spark.read.parquet(out + "/edges")
    v = spark.read.parquet(out + "/vertices")
    assert e.count() > 0 and v.count() > 0
    # canonical ids resolve: CVE surfaces normalized; entity surfaces
    # map to the gold wikidata anchors (default_dictionary, r2 VERDICT
    # missing #5 — anchors win conflicts over the vendor: seed slugs)
    cves = e.filter(F.col("obj_id").rlike("^CVE-")).count()
    wd = e.filter(F.col("obj_id").startswith("wd:")).count()
    assert cves > 0 and wd > 0
    # edge partitions pruned by event_subtype
    assert "event_subtype" in e.columns
    kinds = {r["kind"] for r in v.select("kind").distinct().collect()}
    assert kinds == {"entity", "event"}


def test_resumable_run_is_incremental(spark, tmp_path):
    from casie_spark.manifests import with_bucket

    out = str(tmp_path / "run")
    docs = synth_documents(spark, 40).persist()
    n_buckets = 4

    # interrupted run: upstream only delivered buckets 0-1 — the
    # missing buckets must NOT be marked complete
    part = with_bucket(docs, "url", n_buckets).filter("bucket < 2").drop("bucket")
    r1 = resumable_run(part, out, n_buckets=n_buckets)
    assert sorted(r1["processed_buckets"]) == [0, 1, 2, 3]  # attempted
    done1 = {r["bucket"] for r in read_manifest(spark, out)
             .filter("status='ok'").collect()}
    assert done1 == {0, 1}

    # resume with the full corpus: only the missing buckets run
    r2 = resumable_run(docs, out, n_buckets=n_buckets)
    assert sorted(r2["processed_buckets"]) == [2, 3]
    assert pending_buckets(spark, out, "edges", n_buckets) == []

    # completed: a third run is a no-op
    r3 = resumable_run(docs, out, n_buckets=n_buckets)
    assert r3["processed_buckets"] == []

    m = read_manifest(spark, out)
    assert m.filter("status = 'ok'").count() == n_buckets
    # total edge rows match the manifest row counts
    total = spark.read.parquet(out + "/edges").count()
    recorded = m.agg(F.sum("rows").alias("s")).first()["s"]
    assert total == recorded
