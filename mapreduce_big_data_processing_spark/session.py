"""SparkSession factory with scale-aware defaults.

The reference's "engine config" is a hand-built Hadoop ``Job`` per stage
(e.g. ``final project/src/final_kNN_src/phase1/TF_IDF_Compute.java:465-484``);
here a single session hosts every operator and Catalyst plans the stages.

Defaults are chosen for the 100 TB posture:
  - AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  - broadcast threshold left at Spark default so small dims broadcast
  - Arrow enabled for the pandas_udf escape hatches
  - UTC session timezone so results are comparable across engines
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an existing session.

    Used both by :func:`get_session` and by the driver-owned sessions handed
    to ``__spark_entry__`` (where we cannot control builder-time conf).
    """
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # events.parquet stores TIMESTAMP(NANOS); Spark refuses it unless
        # read as long (catalog.load converts back to a timestamp column)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # local[N] has no network shuffle; cap in-flight partitions near cores
        "spark.sql.shuffle.partitions": str(max(_local_cpus(), 8)),
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build; builder-time conf covers it
    return spark


def get_session(app_name: str = "mapreduce-bdp-spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) the engine session.

    On a real cluster the master/memory conf comes from spark-submit; these
    builder settings only matter for local runs.
    """
    n = cpus or _local_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return tune(builder.getOrCreate())
