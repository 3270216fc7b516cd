"""Custom stateful streaming operator: per-host crawl session tracking
via ``applyInPandasWithState``.

The batch pipeline needs no custom state (SURVEY §2.12), but a crawl
ingestion surface does: a host that stops delivering pages for longer
than ``gap`` closes its "crawl session", and the closed session's
aggregate (pages, bytes, span) is emitted exactly once.  This is the
session-window shape that built-in tumbling/sliding windows cannot
express when the window length is data-dependent.

State design (the 100 TB consideration): state is keyed by host —
cardinality = |hosts|, not |pages| — and each state value is a fixed
handful of counters, so the state store stays O(active hosts)
regardless of stream length.  Timeouts are processing-time based; on
timeout the session flushes and the key's state is removed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_pages long, n_bytes long, first_ts long, last_ts long"
OUTPUT_SCHEMA = (
    "host string, n_pages long, n_bytes long, "
    "first_ts long, last_ts long, closed boolean"
)


DEFAULT_IDLE_MS = 30_000


def _make_tracker(idle_ms: int):
    def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            n_pages, n_bytes, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame([{
                "host": host, "n_pages": n_pages, "n_bytes": n_bytes,
                "first_ts": first_ts, "last_ts": last_ts, "closed": True,
            }])
            return

        n_pages, n_bytes, first_ts, last_ts = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            ts = pdf["warc_ts"].astype("int64") // 10**9
            n_pages += len(pdf)
            n_bytes += int(pdf["n_bytes"].sum())
            first_ts = int(ts.min()) if first_ts is None else min(first_ts, int(ts.min()))
            last_ts = int(ts.max()) if last_ts is None else max(last_ts, int(ts.max()))
        state.update((n_pages, n_bytes, first_ts, last_ts))
        state.setTimeoutDuration(idle_ms)  # idle gap closes the session
        yield pd.DataFrame([{
            "host": host, "n_pages": n_pages, "n_bytes": n_bytes,
            "first_ts": first_ts, "last_ts": last_ts, "closed": False,
        }])

    return _track


def host_sessions(docs: DataFrame, idle_ms: int = DEFAULT_IDLE_MS) -> DataFrame:
    """documents stream -> per-host crawl-session updates.  Emits a
    running (closed=false) row per host per micro-batch and a final
    closed=true row when the host goes idle past the timeout."""
    from pyspark.sql import functions as F

    keyed = docs.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        "warc_ts",
        F.length("text").cast("long").alias("n_bytes"),
    )
    return (
        keyed.groupBy("host")
        .applyInPandasWithState(
            _make_tracker(idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_host_sessions(docs_stream: DataFrame, out_dir: str,
                      checkpoint_dir: str, idle_ms: int = DEFAULT_IDLE_MS,
                      interval: str = "1 second"):
    """Wire the stateful op into a streaming sink.  Processing-time
    trigger, NOT availableNow: state timeouts only fire when batches
    keep running after the source drains, which availableNow never
    schedules — the caller stops the query (tests poll the sink)."""
    return (
        host_sessions(docs_stream, idle_ms)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
