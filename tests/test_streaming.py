"""Structured Streaming: incremental triple extraction must equal the
batch pipeline on the same input, resume from checkpoint must process
only new files, and the watermarked window agg must match batch
windowing for closed windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from casie_spark.pipeline import run_pipeline
from casie_spark.sources.documents import synth_documents
from casie_spark.streaming.ingest import (
    run_available_now,
    stream_documents,
    stream_triples,
    stream_window_counts,
)

TRIPLE_KEY = ["doc_id", "subj", "pred", "obj"]


def _triple_set(df):
    return {tuple(r) for r in df.select(*TRIPLE_KEY).collect()}


def test_stream_triples_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    all_docs = synth_documents(spark, 180, partitions=4)
    cut = "2024-01-01 00:02:00"  # ids 0..119 vs 120..179
    first = all_docs.filter(F.col("warc_ts") < cut)
    second = all_docs.filter(F.col("warc_ts") >= cut)
    first.write.parquet(src)

    spark.catalog.clearCache()
    q = stream_triples(stream_documents(spark, src), out, ckpt)
    run_available_now(q)
    # each micro-batch unpersists its pipeline caches (track_persists):
    # a processingTime deployment must not leak storage memory per batch
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), \
        "foreachBatch leaked persisted frames"

    streamed = spark.read.parquet(out)
    assert _triple_set(streamed) == _triple_set(run_pipeline(first))
    assert streamed.select("batch_id").distinct().count() == 1

    # drop new files; same checkpoint -> ONLY the new docs are processed
    second.write.mode("append").parquet(src)
    q2 = stream_triples(stream_documents(spark, src), out, ckpt)
    run_available_now(q2)

    streamed2 = spark.read.parquet(out)
    new_batches = streamed2.filter(~F.col("batch_id").isin(
        [r[0] for r in streamed.select("batch_id").distinct().collect()]))
    assert _triple_set(new_batches) == _triple_set(run_pipeline(second))
    assert _triple_set(streamed2) == _triple_set(run_pipeline(all_docs))


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup must suppress duplicates both WITHIN a
    micro-batch and ACROSS micro-batches (state carried by the
    checkpointed state store), keeping exactly one row per distinct
    text."""
    import datetime as dt
    import time

    from casie_spark.streaming.ingest import stream_deduped

    src = str(tmp_path / "dsrc")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    base = dt.datetime(2024, 1, 1)
    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")

    # batch 1: texts t0..t4, each fetched twice (within-batch dups)
    rows1 = [(f"https://e/{i}", base + dt.timedelta(minutes=i), b"",
              f"text {i % 5}", "en") for i in range(10)]
    # batch 2: re-fetches of t0..t4 (cross-batch dups, inside the
    # watermark) + new texts t5..t7
    rows2 = [(f"https://e/{10 + i}", base + dt.timedelta(minutes=30 + i),
              b"", f"text {i}", "en") for i in range(8)]

    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src)
    time.sleep(0.2)  # the file source orders batches by mtime
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    q = stream_deduped(
        stream_documents(spark, src, max_files_per_trigger=1), out, ckpt)
    run_available_now(q)

    got = spark.read.parquet(out)
    texts = [r["text"] for r in got.select("text").collect()]
    assert sorted(texts) == sorted(f"text {i}" for i in range(8))
    # survivors of cross-batch dups must be the FIRST arrival (batch 1)
    first_urls = {r["url"] for r in got.collect() if r["text"] < "text 5"}
    assert all(int(u.rsplit("/", 1)[1]) < 10 for u in first_urls)


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")

    base = dt.datetime(2024, 1, 1)
    rows = [
        (f"https://e/{i}", base + dt.timedelta(hours=i, minutes=i % 50),
         b"", f"page {i}", "en" if i % 3 else "de")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    docs.write.parquet(src)

    q = stream_window_counts(stream_documents(spark, src), out, ckpt)
    run_available_now(q)
    got = spark.read.parquet(out)

    expected = (
        docs.groupBy(F.date_trunc("hour", "warc_ts").alias("window_start"), "lang")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("text")).alias("n_chars"))
    )
    exp = {tuple(r) for r in expected.collect()}
    emitted = {tuple(r) for r in
               got.select("window_start", "lang", "n_pages", "n_chars").collect()}
    # append mode emits only watermark-closed windows: a strict, correct
    # subset of the batch result, and most of the 30 hours must be out
    assert emitted <= exp
    assert len(emitted) >= 20
    # every emitted window really closed: end <= max_ts - 2h watermark
    max_ts = max(r[1] for r in rows)
    for r in got.collect():
        assert r["window_end"] <= max_ts - dt.timedelta(hours=2) + dt.timedelta(hours=1)


def test_foreachbatch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the data write but
    before the checkpoint commit replays the batch.  The batch body
    (write_triples_batch) must therefore replace — not duplicate — its
    own batch_id partition, while leaving other batches untouched."""
    from casie_spark.streaming.ingest import write_triples_batch

    out = str(tmp_path / "replay_out")
    docs = synth_documents(spark, 40, partitions=2).persist()
    b0 = docs.filter(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    b1 = docs.subtract(b0)

    write_triples_batch(b0, 0, out)
    write_triples_batch(b1, 1, out)
    once = spark.read.parquet(out)
    # materialize BEFORE the replay: the overwrite replaces the files
    # this lazy frame points at
    set_once = _triple_set(once)
    n_total, n_b1 = once.count(), once.filter("batch_id = 1").count()
    assert n_total > n_b1 > 0

    # replay batch 1 (simulated post-write / pre-commit crash restart)
    write_triples_batch(b1, 1, out)
    again = spark.read.parquet(out)
    assert again.count() == n_total
    assert again.filter("batch_id = 1").count() == n_b1
    assert _triple_set(again) == set_once
    docs.unpersist()
