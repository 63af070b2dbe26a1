"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "zsolr", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = (os.cpu_count() or 8) if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # posting blobs are ≤1 MiB; keep Arrow batches bounded (SURVEY.md R4).
        # NOTE: Spark's byte-size batch limit (maxBytesPerBatch) calls
        # ArrowWriter.sizeInBytes per ROW — a vector-tree walk that measured
        # >90% of grouped-Arrow stage CPU at 100M rows.  The engine therefore
        # keeps per-row streams OUT of Arrow boundaries (JVM-side
        # collect_list pre-grouping); see build._stage_postings.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("ZSOLR_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Single-box sandbox: the shared virtual disk (~150 MB/s) would cap all
    # shuffle/spill I/O at any core count, masking CPU scaling that a real
    # cluster (per-node disks) has.  RAM-backed local dirs restore
    # per-core-proportional I/O.  Override with ZSOLR_LOCAL_DIR.
    local_dir = os.environ.get("ZSOLR_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/zsolr-spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    return b.getOrCreate()
