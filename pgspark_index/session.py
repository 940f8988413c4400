"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "pgspark_index",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """local[N] session tuned for this container; on a real cluster the same
    configs apply minus master/driver-memory (spark-submit supplies them).

    AQE is on (runtime shuffle-partition coalescing + skew handling for the
    relational parts); Arrow is on (every custom stage is pandas/Arrow
    vectorized); timezone pinned UTC so DuckDB oracle comparisons are exact.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = shuffle_partitions or (32 if cores in ("*",) else max(8, int(cores)))
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", driver_memory or "16g")
        # Wide exchanges (R >= ~64 reduce partitions) pay R file streams
        # per map task under the bypass-merge shuffle writer (M x R tiny
        # files, guide §2.2); the sort-based writer emits one file + index
        # per task. Measured on the 128-wide build exchange: ~35-44 s of
        # summed shuffle-write time -> ~2 s. Narrow exchanges (< 64) keep
        # the bypass writer, where it is the right tool. Scale-safe: real
        # clusters run R >> 200, where Spark picks the sort writer anyway.
        .config("spark.shuffle.sort.bypassMergeThreshold", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local-mode shuffle goes through spark.local.dir; a single shared
        # virtio disk serializes it and misrepresents a real cluster (where
        # per-node shuffle I/O scales with executor count). tmpfs restores
        # the scaling behavior; harmless elsewhere (falls back to /tmp).
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
