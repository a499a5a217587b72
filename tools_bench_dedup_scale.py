"""Dedup/curation-family scale sweep (r3 verdict #8): the families whose
100 TB posture matters most, measured at 10x/100x/1000x of sf0.1.

The 1000x fixtures hold only documents+embeddings (the tables these
families read — `tools_gen_scale.py 1000 scale_data/sf100g
documents,embeddings`), so this sweep runs exactly the queries that touch
them. AQE on (the scale posture), min-of-N timing like bench_scale.py.

Usage: python tools_bench_dedup_scale.py scale_data/sf1g scale_data/sf10g scale_data/sf100g
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SAMPLES = int(os.environ.get("SPARK_GRAFT_SCALE_SAMPLES", "2"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

FAMILY = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "embedding_near_dup",
    "chunk_dedup_docs",
    "benchmark_contamination",
    "quality_scores",
    "token_stats",
    "doc_cross_entropy",
    "curated_training_set",
    "span_stripped_docs",
]


def _materialize(df) -> None:
    """Force FULL computation without data-sized driver IO: xxhash64 over
    the whole row struct makes every output column compute (a bare count()
    would let Catalyst prune the projections — the r3 timing trap), and
    the aggregation ships ONE row to the driver. At 1000x several family
    queries emit per-doc result sets over spark.driver.maxResultSize, so
    bench.py's toPandas() contract (fine at the driver SF) cannot be the
    scale-materialization."""
    from pyspark.sql import functions as F

    # bit_xor, not sum: ANSI mode throws on long-sum overflow
    df.select(
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h")
    ).collect()


def main() -> None:
    from mapreduce_big_data_processing_spark.session import get_session
    from mapreduce_big_data_processing_spark import queries as Q

    spark = get_session("bench-dedup-scale", cpus=CPUS, adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")
    # get_session sizes shuffle partitions for the tiny driver fixtures
    # (max(cores/4, 8)); at the 1000x corpus that is ~40M shuffle rows per
    # partition and the unified memory manager cannot hold a partition's
    # aggregation state (observed: UNABLE_TO_ACQUIRE_MEMORY in the minhash
    # signature shuffle). Size for scale and let AQE coalesce back down on
    # the small dirs — exactly what a real cluster config does.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "256"),
    )
    for sf_dir in sys.argv[1:]:
        times = {}
        for name in FAMILY:
            fn = Q.QUERIES[name]
            spark.catalog.clearCache()
            _materialize(fn(spark, sf_dir))  # warm: codegen + parquet footers
            samples = []
            for _ in range(SAMPLES):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            times[name] = round(min(samples), 3)
            print(f"  {sf_dir} {name}: {times[name]}", file=sys.stderr, flush=True)
        print(
            json.dumps(
                {"sf_dir": sf_dir, "total_sec": round(sum(times.values()), 3),
                 "queries": times}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
