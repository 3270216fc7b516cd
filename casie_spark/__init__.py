"""casie_spark — a PySpark-native knowledge-graph construction engine.

Rebuilds the capabilities of the Ebiquity/CASIE reference pipeline
(cybersecurity event extraction -> (subj, pred, obj) triples -> entity
canonicalization -> partitioned graph tables) as an idiomatic Spark
DataFrame + Arrow-UDF dataflow.  Not a port: the reference is a
sequential per-document Python loop (link_coref.py:1978); here every
stage is a declarative DataFrame transform so Catalyst/Tungsten pick
the physical plan and the per-document loop becomes partition
parallelism.

Layout
------
- ``session``    SparkSession factory with scale-tuned defaults
- ``config``     CASIE ontology constants (event types, Pair, RolePair, ...)
- ``sources``    documents/annotation readers, deterministic corpus synth, sinks
- ``functions``  column-expression libraries (text, regex, time, stats, hashing)
- ``operators``  dataflow stages (tokenizer, span assembly, tagging, linking,
                 rules, roles, realis, coref, canonicalize, dedup, similarity)
- ``pipeline``   end-to-end DAG documents -> triples
- ``corpus``     composed training-data hygiene chain (gates in
                 published-pipeline order behind lineage barriers)
- ``scoring``    score.py-faithful mention F1 + triple-set P/R
- ``streaming``  incremental ingestion wrapper (foreachBatch + manifests)
- ``manifests``  per-partition lineage + checkpoint-resume
"""

__version__ = "0.1.0"
