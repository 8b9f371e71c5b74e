"""SparkSession factory tuned for the engine.

Local sandbox runs on ``local[N]``; the same config block is what we
would pass to ``spark-submit`` on a real cluster (AQE on, skew join
on, Arrow batching for the pandas UDF kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "s2-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # One BLAS/OpenMP thread per Python worker: Spark already runs one
    # task per core, so letting numpy's BLAS spawn its own per-core
    # pool inside EVERY worker oversubscribes cores^2 threads (the
    # loop-containment and cosine kernels are matrix products).  Must
    # be set before the workers fork; also exported to executors for
    # cluster deployments.
    for v in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        os.environ.setdefault(v, "1")
    # Executor python workers import the engine via PYTHONPATH (they
    # do not see the driver's sys.path); cluster deployments ship the
    # package with spark-submit --py-files instead.
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting (hot tiles).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow IPC for pandas UDFs — the only JVM<->Python crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast the covering table even if stats are conservative.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # Local mode has no data locality to wait for; the default 3s
        # locality wait only adds scheduling jitter.
        .config("spark.locality.wait", "0s")
        .config("spark.ui.enabled", "false")
        # Many distinct generated WholeStageCodegen classes across a
        # query suite overflow the default 240MB JIT code cache, after
        # which the JVM silently stops compiling and later queries run
        # interpreted (observed 10-30x slowdowns mid-suite).
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true -XX:ReservedCodeCacheSize=2g "
            "-XX:+UseCodeCacheFlushing",
        )
    )
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
