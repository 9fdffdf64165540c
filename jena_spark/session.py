"""SparkSession factory with the pipeline's scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join handling on,
Arrow UDFs on); local test runs override parallelism via ``master``.
"""

from __future__ import annotations

import os
from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Local mode runs driver + all executor threads in ONE JVM, so the
    heap must be sized to the host, not to a driver-only default: at
    sf1-scale bench inputs an 8g heap produced GC-thrash rep spikes of
    3-10x (measured 26s worst-rep vs 2.1s at 32g on the same query,
    guide §5 — checkpointed intermediates + broadcasts + 32 concurrent
    task buffers compete for one old gen).  A quarter of physical RAM,
    clamped to [8g, 32g]; cluster deployments size executor memory
    explicitly (tools/submit_job.py) and the env override stays
    authoritative."""
    try:
        with open("/proc/meminfo") as f:
            kb = int(
                next(l for l in f if l.startswith("MemTotal")).split()[1]
            )
        return f"{max(8, min(32, kb // (4 * 1024 * 1024)))}g"
    except (OSError, StopIteration, ValueError, IndexError):
        return "8g"


def get_spark(
    app: str = "jena_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # AQE: runtime re-plan, skew-join splitting, partition coalescing —
        # the counterpart of the reference's stats-based BGP reorder
        # (tdb2/solver/stats) and its skewed-join benchmark concern.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow batches for pandas UDFs (the parse stage hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # Keep scans splittable and bounded at 100 TB (128m); local test
        # corpora are tiny, so allow an env override to keep scan
        # parallelism up (small parquet dirs otherwise collapse to 1-2
        # input splits and serialize every downstream stage).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "4194304"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return b.getOrCreate()
