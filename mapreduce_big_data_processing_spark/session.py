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
    """Apply correctness-critical runtime conf to an existing session.

    Called inside every registered query so driver-owned sessions (whose
    builder conf we don't control) produce engine-correct results. Only
    semantics-affecting keys belong here — performance knobs (AQE, shuffle
    partitions) are set at builder time in :func:`get_session` and must not
    be stomped at runtime (AQE is on by default in Spark ≥3.2 anyway).
    """
    conf = {
        # timestamps must bucket identically across engines
        "spark.sql.session.timeZone": "UTC",
        # events.parquet stores TIMESTAMP(NANOS); Spark refuses it unless
        # read as long (catalog.load converts back to a timestamp column)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build; builder-time conf covers it
    return spark


def get_session(
    app_name: str = "mapreduce-bdp-spark",
    cpus: int | None = None,
    adaptive: bool = True,
) -> SparkSession:
    """Create (or fetch) the engine session.

    On a real cluster the master/memory conf comes from spark-submit; these
    builder settings only matter for local runs. ``adaptive`` switches AQE:
    on by default (the 100 TB posture — runtime re-planning, skew splits),
    but its per-stage re-optimization costs ~0.1 s/query, which only pays
    for itself when shuffles are large; callers that KNOW the workload is
    sub-GB (bench at sf≤0.1) pass False, exactly as shuffle partitions are
    sized to the local core count.
    """
    n = cpus or _local_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # local mode: shuffles are in-process; fewer, fatter partitions beat
        # the 200 default at test scale. NOTE AQE only ever COALESCES
        # post-shuffle partitions — it never splits them (skew-join
        # splitting is join-only) — so the low static number here must be
        # paired with a high adaptive STARTING number below or every
        # shuffle at real scale is capped at this many reduce tasks.
        .config("spark.sql.shuffle.partitions", str(max(n // 4, 8)))
        .config("spark.sql.adaptive.enabled", "true" if adaptive else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # scale-adaptive reduce parallelism (guide §2.2): shuffles START at
        # 8×cores map-output splits and AQE coalesces them down to
        # advisoryPartitionSizeInBytes from the measured sizes, so sf0.1
        # still collapses to a handful of tasks while a 100× shuffle fans
        # out to every core instead of the static 8 above. Only meaningful
        # when AQE is on (without AQE this key is ignored); r10 measured
        # pagerank@100× 211 s → the graph-build shuffles were running 8
        # reduce tasks on 32 cores.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(8 * n, 64)),
        )
        # without this, CACHED subplans plan with AQE partition-count
        # adaptation disabled (Spark keeps a cache's outputPartitioning
        # stable by default), so every .cache() lineage — iterative edge
        # tables, shingle sets, per-doc stats — would still run its
        # shuffles at the static partition count above regardless of data
        # size. Letting the cached plan's partitioning float means a
        # downstream consumer keyed on it may re-shuffle its (small) other
        # side to match — the right trade at scale, same reasoning as the
        # pagerank ranks-side shuffle.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true" if adaptive else "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return tune(builder.getOrCreate())
