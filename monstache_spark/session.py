"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same configs are the right
defaults on a real cluster (AQE, adaptive coalescing/skew-join, UTC
session timezone for oracle-comparable timestamps, Arrow for the few
pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def state_store_provider(state_store: str | None = None) -> str | None:
    """Resolve the streaming state-store backend: explicit argument
    first, else ``$SPARK_GRAFT_STATE_STORE``.  ``"rocksdb"`` returns
    the RocksDB provider class — the 100×-streaming-state lever: keyed
    state lives off-heap/on-disk per executor with incremental
    checkpointing, instead of the default in-memory HDFS-backed map
    that must FIT in executor memory.  ``"hdfs"``/unset returns None
    (Spark default provider).
    """
    choice = (state_store or os.environ.get("SPARK_GRAFT_STATE_STORE", "")).lower()
    if choice in ("", "hdfs", "default"):
        return None
    if choice == "rocksdb":
        return ROCKSDB_PROVIDER
    # allow a fully-qualified provider class for custom backends
    if "." in choice:
        return state_store or os.environ["SPARK_GRAFT_STATE_STORE"]
    raise ValueError(f"unknown state store backend: {choice!r}")


def shuffle_partitions(spark: SparkSession) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the
    ``"auto"`` spelling some AQE/managed deployments set (where a bare
    ``int(conf.get(...))`` raises) by falling back to the cluster
    default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def spread_scan(df, factor: int = 2):
    """Scale-adaptive scan spread (optimization guide §2.5, "input
    skew: one huge unsplittable file ... repartition immediately
    after the read"): when a frame's current partitioning yields
    materially fewer partitions than the session's shuffle width
    (single small parquet file, single row group — every scan task
    bottlenecks per-row work on one core), round-robin repartition to
    the shuffle width so the per-row stage parallelizes.

    At production scale a scan yields >= width partitions and this is
    a NO-OP — the check reads the frame's planned partition count
    (driver-side metadata, no job).  Apply it only in front of
    per-row-heavy stages (moment aggregations, tokenizing, regex
    scoring): the spread is a real exchange of the input rows, paid
    back only when the downstream per-row work dominates it.
    """
    width = shuffle_partitions(df.sparkSession)
    if df.rdd.getNumPartitions() * factor <= width:
        return df.repartition(width)
    return df


def get_spark(app_name: str = "monstache_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus != "*" else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long and convert in the source layer
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
