"""SparkSession factory with the engine's default tuning."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "admarus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Tame glibc mmap/munmap churn in the Arrow UDF workers: large numpy
    # buffers otherwise mmap+munmap on every batch, and at 32 concurrent
    # workers the kernel page-zeroing/mmap path dominates (observed 95%
    # system time). Arena reuse keeps those buffers pooled. Python workers
    # inherit this environment from the JVM, which inherits it from here.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "536870912")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "536870912")
    os.environ.setdefault("MALLOC_ARENA_MAX", "4")
    # the pre-warm daemon module must be importable by the worker daemon
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # local[N] → match shuffle partitions to cores (guide: not 200)
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = os.cpu_count() or 32 if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # local corpora arrive as few large parquet files; small input splits
        # keep scan parallelism at the core count (harmless on many-file
        # tables — split merging still coalesces tiny files)
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "4m"))
        # JVM<->Python-worker channels over unix domain sockets: sandboxed /
        # filtered localhost TCP can stall worker setup for seconds per task
        .config("spark.python.unix.domain.socket.enabled", "true")
        # Reused workers with a pool sized to the core count (the default
        # pool cap throws warm workers away under bursts), forked from a
        # daemon that pre-imports the heavy stack (see daemon_prewarm.py) so
        # cold forks skip the ~1s pandas/numpy/pyarrow import.
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.factory.idleWorkerMaxPoolSize", "64")
        .config("spark.python.daemon.module", "admarus_spark.daemon_prewarm")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        # Pin -Xms to -Xmx and pre-touch at startup: Spark only sets -Xmx,
        # so the heap grows mid-run and every G1 expansion commits+zeroes
        # GBs inside stop-the-world pauses (observed as 20s+ stalls at 95%
        # system time). One-time startup pretouch instead.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g')} -XX:+AlwaysPreTouch",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def jvm_shuffle_write_bytes(spark: SparkSession) -> int | None:
    """Total shuffle-write bytes across every stage the app has run so far,
    read from the JVM AppStatusStore (the UI's data source — works with
    ``spark.ui.enabled=false``). A before/after snapshot around a job
    brackets that job's exchange volume; the build runs its jobs
    sequentially from one driver thread, so the delta is attributable.
    Returns None when the py4j surface is unavailable (API drift) — callers
    treat the metric as best-effort evidence, never control flow."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        # Spark 4 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — Scala default args don't exist at
        # the bytecode level, so every parameter is passed explicitly
        quantiles = sc._gateway.new_array(sc._jvm.double, 0)
        total = 0
        it = store.stageList(None, False, False, quantiles, None).iterator()
        while it.hasNext():
            total += it.next().shuffleWriteBytes()
        return int(total)
    except Exception:
        return None
