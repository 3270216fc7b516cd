"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CASIE KG-construction pipeline on sf0.001;
``queries``/``oracle_sql`` expose the operator suite for the DuckDB
correctness gate (see casie_spark/queries.py for conventions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> CASIE event triples via the TRAINED
    tagger (mode="model": broadcast-weight pandas_udf inference +
    the full linking DAG) on a deterministic synthetic
    Common-Crawl-shaped corpus (the driver's sf0.001 parquet carries
    word-soup text without CASIE events, so the pipeline demonstrates
    on its own synthesized pages; both are read to exercise the scan
    path)."""
    from pyspark.sql import functions as F

    from casie_spark.pipeline import run_pipeline
    from casie_spark.sources.documents import synth_documents

    # touch the driver-provided table so the scan path is exercised too
    sf_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _ = sf_docs.limit(1).count()

    docs = synth_documents(spark, 500)
    triples = run_pipeline(docs, mode="model")
    return triples.orderBy("doc_id", "event_begin", "arg_begin").select(
        "doc_id", "subj", "pred", "obj", "event_subtype", "realis",
        F.col("confidence").cast("double").alias("confidence"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from casie_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from casie_spark.queries import oracle_sql as _oracle

    return _oracle()
