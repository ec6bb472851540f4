"""SparkSession factory.

Single place where scale-relevant configuration lives.  The reference
hand-tunes parallelism (one thread per shard, private accumulator maps —
TailCommand.java:991-1018); here the equivalents are shuffle partitioning,
AQE, and Arrow-vectorized Python interop, set once for every entry point.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[N], 128 GiB); on a real cluster the
# same settings scale: AQE re-coalesces shuffle partitions at runtime so an
# over-provisioned spark.sql.shuffle.partitions is safe at 100 TB, and skew
# -join splitting handles hot keys without manual salting for joins.
_SCALE_CONF = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast when stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF / mapInPandas (input_hint: no
    # per-row Python anywhere).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast threshold: the enrich dimensions (tool/role catalogs,
    # nation/region) are tiny; 64 MB leaves headroom for doc_sizes-style
    # lookup tables while never broadcasting a fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Bounded parquet split size so a 100 TB scan yields well-sized tasks.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    # local mode runs every task thread in the driver JVM; the 1g default
    # heap thrashes GC as soon as tens of tasks run concurrently (measured
    # 8x slowdown at local[32]).  On a cluster, spark-submit overrides.
    "spark.driver.memory": "48g",
    "spark.driver.maxResultSize": "4g",
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
}


def get_spark(
    master: str | None = None,
    app_name: str = "oplog-analyzer-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's scale settings.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, then 32) in the
    sandbox; on a cluster, pass ``None`` with a pre-configured environment and
    the builder inherits spark-submit's master.
    """
    # Executor Python workers must be able to import this package (the
    # pandas UDFs pickle by reference).  Local mode: workers inherit the
    # driver env, so extend PYTHONPATH; cluster mode: ship the package with
    # spark-submit --py-files (see tools/make_pyfiles.py).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_SCALE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
