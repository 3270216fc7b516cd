"""Small execution utilities."""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

# active persist trackers (see track_persists); a stack so nested
# scopes each release only their own frames
_PERSIST_TRACKERS: list[list[DataFrame]] = []
# parallel stack of RDD ids that truncate() checkpointed inside the
# scope — track_persists frees exactly these, never RDDs persisted by
# concurrent work sharing the session (ADVICE r3: the session-wide
# before/after diff could unpersist another in-flight job's
# localCheckpoint blocks, which are unrecoverable once freed)
_RDD_TRACKERS: list[list[int]] = []


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
    if _PERSIST_TRACKERS:
        _PERSIST_TRACKERS[-1].append(df)
    return df


def cache_lazy(df: DataFrame) -> DataFrame:
    """Persist WITHOUT the eager count: the cache populates during the
    first consuming job instead of a dedicated pass.  Right choice when
    every reference lives inside the same action (ngram_jaccard's four
    shingle-frame references): the eager count would add a full extra
    scan purely to warm the cache.  Wrong choice when references run in
    SEPARATE concurrent jobs (they could race to compute the subtree).
    Tracked like :func:`materialize`."""
    df = df.persist()
    if _PERSIST_TRACKERS:
        _PERSIST_TRACKERS[-1].append(df)
    return df


@contextlib.contextmanager
def track_persists() -> Iterator[list[DataFrame]]:
    """Release every block cached inside the scope when it exits:
    frames :func:`materialize` / :func:`cache_lazy` persisted, AND the
    RDD blocks :func:`truncate` (localCheckpoint) registered — those
    are invisible to the SQL CacheManager and ``df.unpersist()`` cannot
    reach them (they otherwise wait for driver-GC ContextCleaner).
    Only ids truncate() itself registered are freed, so concurrent
    queries sharing the session keep their own persisted blocks.

    Long-running drivers that invoke the pipeline repeatedly — above
    all ``foreachBatch`` streaming sinks firing every trigger — would
    otherwise accumulate a new set of persisted frames per invocation
    until executor storage memory is exhausted."""
    from pyspark.sql import SparkSession

    bucket: list[DataFrame] = []
    rdd_bucket: list[int] = []
    _PERSIST_TRACKERS.append(bucket)
    _RDD_TRACKERS.append(rdd_bucket)
    try:
        yield bucket
    finally:
        _PERSIST_TRACKERS.pop()
        _RDD_TRACKERS.pop()
        for df in bucket:
            df.unpersist()
        active = SparkSession.getActiveSession()
        if active is not None and rdd_bucket:
            jmap = active.sparkContext._jsc.getPersistentRDDs()
            wanted = set(rdd_bucket)
            for rid in jmap.keySet().toArray():
                if int(rid) in wanted:
                    jmap.get(rid).unpersist()


def truncate(df: DataFrame) -> DataFrame:
    """Materialize AND truncate lineage (``localCheckpoint``).

    Required inside ITERATIVE algorithms (connected-components label
    propagation): each iteration's plan embeds the previous one, so
    with plain persist the logical tree grows exponentially — the JVM
    OOMs just rendering it.  localCheckpoint replaces the subtree with
    a leaf over cached partitions.  Costlier than :func:`materialize`
    (stores raw rows, not columnar batches), so use it only where the
    plan must be cut; on a cluster use ``df.checkpoint()`` (replayable
    on executor loss) instead.

    Inside a :func:`track_persists` scope the checkpointed RDD ids are
    registered with the active bucket (found by diffing the session's
    persistent-RDD map across the eager checkpoint — a window tight
    enough that only this call's blocks land in it) so the scope exit
    can free them."""
    sc = df.sparkSession.sparkContext
    if _RDD_TRACKERS:
        jmap = sc._jsc.getPersistentRDDs()
        before = {int(rid) for rid in jmap.keySet().toArray()}
        out = df.localCheckpoint(eager=True)
        jmap = sc._jsc.getPersistentRDDs()
        _RDD_TRACKERS[-1].extend(
            int(rid) for rid in jmap.keySet().toArray()
            if int(rid) not in before)
        return out
    return df.localCheckpoint(eager=True)
