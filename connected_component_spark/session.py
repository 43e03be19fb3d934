"""SparkSession construction with scale-oriented defaults.

The reference tuned executor memory / partitions by hand
(reference README.md:72).  We rely on AQE instead: runtime
coalescing, skew-join splitting, and dynamic join strategy switch
replace the reference's manual RangePartitioner experiments
(reference ConnectedComponent.scala:141, CCDriver.scala:66).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that matter at 100 TB as much as on local[32]:
#: AQE handles post-shuffle partition sizing and skew; Arrow makes
#: the few pandas-UDF paths (similarity / multimodal) batch-vectorized.
SCALE_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # a broadcast threshold fit for dim tables (region/nation/supplier)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # keep timestamps deterministic across JVM/duckdb comparisons
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert in sources/tables.py
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


#: RocksDB-backed streaming state store — the 100 TB memory contract
#: for the stateful surface (dropDuplicatesWithinWatermark, session
#: windows, applyInPandasWithState): state spills to local disk
#: instead of growing the executor heap with the watermark horizon.
#: Runtime-settable per session; each streaming query reads it at
#: start.  Select via ``get_spark(state_store="rocksdb")`` or
#: ``SPARK_GRAFT_STATE_STORE=rocksdb``.
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_STATE_STORE_PROVIDERS = {
    "rocksdb": ROCKSDB_STATE_STORE_PROVIDER,
    # Spark's default in-memory HDFS-backed provider (explicit name
    # so a session can be switched back)
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "connected-component-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback
    ``local[*]``) so bench and tests share one code path.
    ``state_store`` ("rocksdb" | "hdfs" | a provider class name)
    selects the streaming state store backend; default is Spark's
    in-memory HDFS-backed provider, "rocksdb" is the at-scale choice
    (see :data:`ROCKSDB_STATE_STORE_PROVIDER`).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(SCALE_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if state_store is None:
        state_store = os.environ.get("SPARK_GRAFT_STATE_STORE")
    if state_store:
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            _STATE_STORE_PROVIDERS.get(state_store.lower(), state_store)
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
