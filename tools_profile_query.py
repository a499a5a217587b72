"""Standalone per-query profiler: median wall time + Spark job count.

Usage: python tools_profile_query.py q1,q2,... [samples]

Bench posture (sf0.1 default via SPARK_GRAFT_SF_DIR, AQE off, toPandas
collect — same protocol as bench.py) but one query at a time, so a
reading here isolates the query from bench-order effects. Job count per
sample comes from the status tracker via a per-sample job group: a
plan-shape diff (fewer actions/probes) shows up here even when wall
time is inside host noise.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = sys.argv[1].split(",")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from mapreduce_big_data_processing_spark import queries as Q
    from mapreduce_big_data_processing_spark.session import get_session

    spark = get_session("profile", adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for name in NAMES:
        Q.QUERIES[name](spark, SF_DIR).toPandas()  # warm-up
        spark.catalog.clearCache()
        ts, jobs = [], []
        for i in range(N):
            spark.catalog.clearCache()
            group = f"{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, SF_DIR).toPandas()
            ts.append(time.perf_counter() - t0)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
        med = round(statistics.median(ts), 3)
        print(
            f"{name}: median={med}s samples={[round(t, 3) for t in ts]} "
            f"jobs/run={jobs}"
        )


if __name__ == "__main__":
    main()
