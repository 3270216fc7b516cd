"""SparkSession factory tuned for the KG-construction workload.

Local mode is the sandbox stand-in for a multi-executor cluster; every
knob here is chosen so the same code runs unchanged under
``spark-submit --py-files`` on a real cluster (the only difference is
``master`` and memory sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB the shuffle-partition count is sized by target partition
# bytes (~128-256 MB post-shuffle); locally we match core count and let
# AQE coalesce.  Both paths rely on AQE being on.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Model/tokenizer UDF stages hold padded batches in memory; bound
    # Arrow batch size so executor memory is predictable at scale
    # (SURVEY.md section 4 item 2).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Deep multi-reference DAGs (persist barriers keep full lineage)
    # render plan strings quadratically; unbounded (the default) OOMs
    # the driver just EXPLAINing them during AQE updates
    "spark.sql.maxPlanStringLength": "1048576",
    # The r4 repair/sev stages put >25 columns on some token-stream
    # plan nodes, tripping the per-node FIELD-COUNT truncation warning
    # (a different knob than the total-length cap above, which stays
    # at 1 MB as the real guard).  Debug strings for a 40-field node
    # are tiny; raise the field cap so recorded bench/test logs stay
    # warning-free (the zero-truncation regression gate, CLAUDE.md).
    "spark.sql.debug.maxToStringFields": "100",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.extraJavaOptions": "-Djava.security.manager=allow",
    "spark.executor.extraJavaOptions": "-Djava.security.manager=allow",
}


def get_spark(
    app_name: str = "casie_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all
    cores).  On a cluster, pass ``master=None`` with
    ``SPARK_GRAFT_MASTER`` unset and let spark-submit own it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else n

    # Ship the package to executors.  On a real cluster this is
    # ``spark-submit --py-files casie_spark.zip``; in local mode the
    # Python workers inherit the driver env, so exporting PYTHONPATH
    # before the JVM starts is sufficient (and harmless on a cluster).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    b = SparkSession.builder.appName(app_name)
    b = b.config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    if master:
        b = b.master(master)
    for k, v in _DEFAULTS.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master and master.startswith("local"):
        b = b.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
