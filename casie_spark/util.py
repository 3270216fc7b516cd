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

    ``persist() + count()`` stores the SQL columnar cache (compressed
    CachedBatch) and downstream queries plan against the cache node,
    not the subtree — measured 3-4x cheaper than
    ``localCheckpoint(eager=True)``, which stores raw deserialized
    rows (10.5s vs ~3s for the 1.1M-row tagged table at local[32]).

    On a multi-executor cluster prefer ``spark.sparkContext.
    setCheckpointDir`` + ``df.checkpoint()`` (replayable on executor
    loss) or a parquet/Iceberg stage table (casie_spark.manifests
    integrates those with resume); the in-memory cache is the fast
    local form of the same stage-boundary discipline.
    """
    df = df.persist()
    df.count()
    return df


def truncate(df: DataFrame) -> DataFrame:
    """Materialize AND truncate lineage (``localCheckpoint``).

    Required inside ITERATIVE algorithms (connected-components label
    propagation): each iteration's plan embeds the previous one, so
    with plain persist the logical tree grows exponentially — the JVM
    OOMs just rendering it.  localCheckpoint replaces the subtree with
    a leaf over cached partitions.  Costlier than :func:`materialize`
    (stores raw rows, not columnar batches), so use it only where the
    plan must be cut; on a cluster use ``df.checkpoint()`` (replayable
    on executor loss) instead."""
    return df.localCheckpoint(eager=True)
