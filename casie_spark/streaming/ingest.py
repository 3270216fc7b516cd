"""Structured Streaming ingestion: incremental triple extraction over
arriving document partitions.

The reference is pure batch over 1,000 files (SURVEY.md §2.12); the
rebuild's ingestion surface is naturally incremental — a crawler keeps
appending WARC partitions.  Design:

- ``stream_documents``: ``readStream`` on the documents table/directory
  with an explicit schema (streaming scans cannot infer);
- ``stream_triples``: ``foreachBatch`` running the IDENTICAL batch
  pipeline (one code path for batch and streaming — the batch DAG is
  the unit of correctness, streaming only schedules it), writing each
  micro-batch append-only and exactly-once via the checkpoint;
- ``windowed_event_counts``: a native watermark + tumbling-window
  aggregation for the monitoring stream (late pages beyond the
  watermark are dropped, state is bounded);
- ``run_available_now``: drains everything currently in the source and
  stops — the backfill/test trigger.  At production scale the same
  query runs with ``trigger(processingTime=...)``; resume-after-crash
  is the checkpointLocation's job (offsets + state store), complementing
  the batch-side manifest resume in casie_spark.manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DOCUMENTS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_documents(spark: SparkSession, path: str,
                     schema: str = DOCUMENTS_SCHEMA,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Incremental parquet scan of a documents directory.  New files =
    new micro-batch; maxFilesPerTrigger bounds batch size so one giant
    crawl drop cannot OOM an executor."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def write_triples_batch(batch_df: DataFrame, batch_id: int, out_dir: str,
                        mode: str = "rules") -> None:
    """One idempotent micro-batch: run the batch pipeline, land the
    triples as partition batch_id=N via dynamic partition overwrite —
    calling this twice with the same batch_id replaces, never
    duplicates (the foreachBatch replay contract)."""
    from ..pipeline import run_pipeline
    from ..util import track_persists

    if batch_df.isEmpty():
        return
    # track_persists releases the pipeline's stage-barrier caches
    # once the batch's write lands — under trigger(processingTime=…)
    # the SQL cache would otherwise grow by a few frames every
    # micro-batch until storage memory is exhausted
    with track_persists():
        triples = run_pipeline(batch_df, mode=mode)
        (triples.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_dir))


def stream_triples(docs: DataFrame, out_dir: str, checkpoint_dir: str,
                   mode: str = "rules") -> StreamingQuery:
    """documents stream -> triples, via foreachBatch over the batch
    pipeline.  foreachBatch is AT-LEAST-ONCE by contract: a crash after
    the data write but before the checkpoint commits the batch id
    replays the batch on restart, so the batch body must be idempotent
    per batch_id.  Writing with dynamic partition overwrite partitioned
    by batch_id gives exactly that — a replay of batch N replaces
    partition batch_id=N instead of appending a second copy (the same
    crash-window rule as sinks.resumable_run / corpus.write_training_
    shards on the batch side)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_triples_batch(batch_df, batch_id, out_dir, mode)

    return (
        docs.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(docs: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window page counts per lang — the
    monitoring aggregation.  Watermark bounds the state store: pages
    later than `watermark` behind the max warc_ts are dropped, so state
    is O(windows-in-flight), not O(stream)."""
    return (
        docs.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("text")).alias("n_chars"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang", "n_pages", "n_chars",
        )
    )


def stream_window_counts(docs: DataFrame, out_dir: str,
                         checkpoint_dir: str) -> StreamingQuery:
    """Run the windowed aggregation with availableNow + append mode."""
    agg = windowed_event_counts(docs)
    return (
        agg.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def dedup_stream(docs: DataFrame, watermark: str = "24 hours",
                 key_cols: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup: drop re-fetches of the same content
    arriving within the watermark horizon (a crawler re-visits hot
    pages constantly; the batch-side analog is
    dedup.drop_exact_duplicates).  Keyed on md5(text) by default —
    pass ``key_cols`` to dedup on e.g. a canonical url instead
    (functions.urlnorm.canonical_url).

    Uses ``dropDuplicatesWithinWatermark``: the state store holds ONE
    entry per distinct key seen in the last `watermark` of event time
    and evicts it when the watermark passes — state is O(distinct keys
    per horizon), not O(stream), which is what makes streaming dedup
    viable on an unbounded crawl.  Plain ``dropDuplicates`` on a
    stream would retain every key forever."""
    keyed = docs.withColumn("content_hash", F.md5("text"))
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols or ["content_hash"])
    )


def stream_deduped(docs: DataFrame, out_dir: str, checkpoint_dir: str,
                   watermark: str = "24 hours") -> StreamingQuery:
    """Run the streaming dedup with availableNow + append mode; the
    checkpoint carries the key state across restarts, so a resumed
    crawl ingest keeps suppressing duplicates it saw before the
    restart."""
    return (
        dedup_stream(docs, watermark).writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def run_available_now(query: StreamingQuery, timeout_s: int = 300) -> None:
    """Drain the source and stop (test/backfill helper)."""
    query.awaitTermination(timeout_s)
    if query.isActive:  # pragma: no cover - defensive
        query.stop()
    if query.exception() is not None:
        raise query.exception()
