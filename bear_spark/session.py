"""SparkSession factory tuned for this engine.

Local-mode notes: one JVM, N executor threads; `spark.driver.memory` is
the only memory knob. Shuffle partitions sized to cores, AQE on (runtime
coalesce + skew-join splitting), Arrow on for the pandas-UDF paths,
session timezone pinned to UTC so results compare bit-for-bit against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# glibc malloc knobs that keep Python-worker heap pages resident across
# micro-batches. The merge kernel's pandas/numpy churn allocates large
# (>128 KB) buffers that glibc serves via mmap and returns to the OS on
# free, so every batch re-faults its working set — a steady page-fault
# tax per batch on any host where faults are expensive (overcommitted
# VMs, THP-fragmented hosts), and the dominant cost during this
# sandbox's hypervisor fault-path degradation episodes. MMAP_MAX_=0
# routes large allocations to the sbrk heap and TRIM_THRESHOLD_=-1
# (parsed unsigned → effectively infinite) never trims it, so a
# long-lived worker (spark.python.worker.reuse, the default) faults its
# arena once and reuses it for every subsequent batch. Same rationale
# as the Arrow-side jemalloc retention in lake/arrow_apply.py.
_MALLOC_RETAIN_ENV = {
    "MALLOC_MMAP_MAX_": "0",
    "MALLOC_TRIM_THRESHOLD_": "-1",
    "MALLOC_ARENA_MAX": "4",
}


def get_spark(
    app_name: str = "bear_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle
    partitions default to 2x cores (a reasonable local heuristic; on a
    real cluster this is sized to total executor cores).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # $SPARK_GRAFT_MASTER overrides the default thread-local master with
    # any Spark master URL — e.g. local-cluster[8,1,3584] for a
    # multi-executor-JVM run (separate executor processes, real
    # block-transfer shuffle), or spark://host:7077 on a real cluster.
    # `cores` then only sizes shuffle partitions.
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(8, 2 * n)

    retain = os.environ.get("BEAR_MALLOC_RETAIN", "1") != "0"
    if retain:
        for k, v in _MALLOC_RETAIN_ENV.items():
            # local mode: the JVM (and the pyspark.daemon it forks) inherit
            # the driver env captured at launch, so set it before getOrCreate
            os.environ.setdefault(k, v)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # files: keep partition sizing sane for both sf0.001 and 100 TB
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # a lake table snapshot can reference hundreds of bucket files;
        # below this threshold Spark stats them on the driver (micro-
        # seconds on a local fs) instead of scheduling a one-task-per-
        # file distributed listing job (which costs seconds per merge)
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
    )
    # Shuffle/spill blocks go to RAM-backed storage when requested: in
    # local mode all executor threads share one virtual disk, which
    # serializes the shuffle stages that a real cluster spreads across
    # per-executor SSDs. Opt-in ($BEAR_SHM_SPILL=1, set by the bench
    # entry points) rather than default: tmpfs is typically capped at
    # half of RAM, so redirecting every session's spill there could
    # turn a large disk spill into ENOSPC.
    if (
        os.environ.get("BEAR_SHM_SPILL") == "1"
        and os.path.isdir("/dev/shm")
        and "spark.local.dir" not in (extra_conf or {})
    ):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if retain:
        # cluster mode: executors don't inherit the driver env, so ship
        # the same knobs through executorEnv (no-op in local mode)
        for k, v in _MALLOC_RETAIN_ENV.items():
            builder = builder.config(f"spark.executorEnv.{k}", os.environ.get(k, v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
