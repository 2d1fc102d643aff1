"""SparkSession factory with scale-appropriate defaults.

Local-mode testing stands in for a multi-executor cluster; every knob
here is chosen to also be correct at 1000-executor / 100 TB scale:

* AQE on (runtime shuffle-partition coalescing + skew-join splitting —
  the distributed analogue of the reference's ``schedule(dynamic,1)``
  and ``least_first`` edge scheduling, ``src/common/scheduler.cc``),
* Arrow enabled for every pandas-UDF boundary,
* UTC session timezone so results compare bit-for-bit against DuckDB
  oracles,
* shuffle partitions sized to cores locally; on a real cluster AQE
  coalesces from a deliberately-high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graphminer_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls the ``local[N]`` master locally; ``master``
    overrides it entirely (e.g. ``local-cluster[4,2,8192]`` for real
    multi-executor runs, or a cluster URL). ``SPARK_GRAFT_CPUS`` env
    var overrides cores for bench runs.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cores, DEFAULT_SHUFFLE_PARTITIONS)))
        )
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: shuffle files on tmpfs, not the root disk — a
        # single-host stand-in for a cluster's node-local NVMe; without
        # this, multi-GB shuffles serialize on one spindle and core
        # scaling flatlines
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
