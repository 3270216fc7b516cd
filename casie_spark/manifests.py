"""Per-partition lineage manifests + checkpoint-based resume
(SURVEY.md section 4 item 4; BASELINE.json north_rule "resumable from
checkpoint with per-partition lineage + metrics").

The unit of work is a url-hash bucket: documents are assigned
``bucket = pmod(xxhash64(url), n_buckets)`` and every pipeline run
processes whole buckets.  A manifest row records one completed
(stage, bucket) with row counts and wall time.  Resume = anti-join of
the bucket universe against completed manifest rows — only missing
buckets re-run, giving idempotent incremental execution (the Iceberg
analog would key on snapshot ids; parquet append is the sandbox
stand-in).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = ("stage string, bucket int, run_id string, rows long, "
                   "wall_ms long, status string, finished_at timestamp")


def with_bucket(df: DataFrame, key: str = "url", n_buckets: int = 64) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    p = manifest_path(out_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(p)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_buckets(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    m = read_manifest(spark, out_dir)
    return (
        m.filter((F.col("stage") == stage) & (F.col("status") == "ok"))
        .select("bucket")
        .distinct()
    )


def pending_buckets(spark: SparkSession, out_dir: str, stage: str,
                    n_buckets: int) -> list[int]:
    all_b = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    done = completed_buckets(spark, out_dir, stage)
    return [r["bucket"] for r in all_b.join(done, "bucket", "left_anti").collect()]


def record(spark: SparkSession, out_dir: str, stage: str,
           bucket_rows: dict[int, int], wall_ms: int, status: str = "ok") -> None:
    run_id = uuid.uuid4().hex[:12]
    now = time.strftime("%Y-%m-%d %H:%M:%S")
    rows = [
        (stage, int(b), run_id, int(n), int(wall_ms), status, now)
        for b, n in bucket_rows.items()
    ]
    df = spark.createDataFrame(rows, "stage string, bucket int, run_id string, "
                                     "rows long, wall_ms long, status string, "
                                     "finished_at string")
    df = df.withColumn("finished_at", F.to_timestamp("finished_at"))
    df.write.mode("append").parquet(manifest_path(out_dir))
