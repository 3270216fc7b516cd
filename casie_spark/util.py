"""Small execution utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a stage boundary AND truncate lineage.

    Spark has no common-subplan reuse: a DataFrame referenced N times
    re-executes its subtree N times, and self-referencing layers
    (join back after aggregate) make the *logical plan tree* grow
    exponentially — deep pipelines OOM the driver just printing the
    plan.  ``localCheckpoint(eager=True)`` replaces the subtree with a
    leaf over cached partitions.

    On a multi-executor cluster prefer ``spark.sparkContext.
    setCheckpointDir`` + ``df.checkpoint()`` (replayable on executor
    loss) or a parquet/Iceberg stage table (casie_spark.manifests
    integrates those with resume); localCheckpoint is the fast local
    form of the same stage-boundary discipline.
    """
    return df.localCheckpoint(eager=True)
