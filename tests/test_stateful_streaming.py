"""Custom stateful streaming op (applyInPandasWithState): per-host
crawl sessions accumulate across micro-batches and close (emit a final
row, drop their state) after the idle timeout."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from casie_spark.sources.documents import synth_documents
from casie_spark.streaming.ingest import stream_documents
from casie_spark.streaming.stateful import run_host_sessions


def _wait_for(cond, timeout_s=90, poll=2.0):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if cond():
            return True
        time.sleep(poll)
    return False


def test_host_sessions_accumulate_and_close(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = synth_documents(spark, 300, partitions=4)
    docs.write.parquet(src)
    expected = {
        r["host"]: r
        for r in docs.select(
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
            F.length("text").cast("long").alias("n_bytes"),
        ).groupBy("host").agg(
            F.count("*").alias("n_pages"), F.sum("n_bytes").alias("n_bytes")
        ).collect()
    }

    q = run_host_sessions(
        stream_documents(spark, src), out, ckpt,
        idle_ms=3_000, interval="1 second",
    )
    try:
        def _closed_rows():
            try:
                df = spark.read.parquet(out)
            except Exception:
                return 0
            return df.filter(F.col("closed")).count()

        # sessions close only after the idle timeout fires on a LATER
        # batch — processing-time trigger keeps batches coming
        assert _wait_for(lambda: _closed_rows() >= len(expected)), \
            "sessions never closed"
    finally:
        q.stop()

    got = spark.read.parquet(out)
    closed = {r["host"]: r for r in got.filter(F.col("closed")).collect()}
    assert set(closed) == set(expected)
    for host, exp in expected.items():
        assert closed[host]["n_pages"] == exp["n_pages"]
        assert closed[host]["n_bytes"] == exp["n_bytes"]
        assert closed[host]["first_ts"] <= closed[host]["last_ts"]
    # the running (closed=false) updates were also emitted en route
    assert got.filter(~F.col("closed")).count() >= len(expected)
