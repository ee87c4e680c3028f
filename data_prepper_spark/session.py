"""SparkSession factory tuned for this engine.

Local mode is single-JVM; we still size shuffle partitions to cores and
enable AQE so the same plan shapes hold on a real multi-executor
cluster (AQE coalescing replaces the reference's hand-rolled
ShufflePartitionCoalescer, reference iceberg-source
shuffle/ShufflePartitionCoalescer.java:16-44 which itself cites Spark).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_prepper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # make the package importable by Python worker processes regardless
    # of the caller's cwd (local mode inherits the driver env; cluster
    # deployments ship the package via spark-submit --py-files instead)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pypath if pypath else "")
        )
    # Python workers inherit this env: serve large numpy temporaries
    # from the reused glibc heap instead of fresh mmaps — profiling on
    # this sandbox showed page-fault-dominated allocation costs (~7ms/
    # MB) dwarfing the actual vector ops in Arrow-batch UDFs.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    master = master or f"local[{cpus}]"
    # parse core count out of local[N] for partition sizing
    ncores = cpus
    if master.startswith("local["):
        inner = master[6:-1]
        ncores = cpus if inner == "*" else int(inner)
    shuffle_partitions = shuffle_partitions or max(ncores * 2, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(ncores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: the 2048 default costs ~1.5x extra
        # wall on JVM<->Python IPC for wide fan-out UDF stages
        # (measured: 115M-row transfer 80s @ 2048 vs 54s @ 16k+)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # small input splits: wide scan parallelism + good task balance
        # without shuffling raw content (tokenize is CPU-bound on the
        # scan side; 8 MB compressed ~= 35 MB of content per task)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
