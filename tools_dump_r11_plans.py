"""Dump explain('formatted') for named queries to plans/r11/.

Usage: python tools_dump_r11_plans.py <suffix> [names]

Env knobs:
  SPARK_GRAFT_SF_DIR     fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_PLAN_AQE   1 = scale posture (AQE on), default 0 (bench posture)
  SPARK_GRAFT_PLAN_R10   1 = force the r10 gate behavior (word-graph encode
                         off, chunk_dedup split shape off, LPA encode at the
                         r10-nonexistent setting) so a "before" plan can be
                         dumped from the r11 tree at any fixture size.

One file per query: plans/r11/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AQE = os.environ.get("SPARK_GRAFT_PLAN_AQE", "0") == "1"
R10 = os.environ.get("SPARK_GRAFT_PLAN_R10", "0") == "1"
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def main() -> None:
    from bench import HEADLINE
    from mapreduce_big_data_processing_spark import queries as Q
    from mapreduce_big_data_processing_spark.operators import curation as C
    from mapreduce_big_data_processing_spark.operators import graph as G
    from mapreduce_big_data_processing_spark.session import get_session

    if R10:
        Q._GRAPH_ENCODE_MIN_BYTES = 1 << 62
        C._SPLIT_SHUFFLE_MIN_BYTES = 1 << 62
        # pagerank's own loop encode existed in r10 — leave G._ENCODE_MIN_EDGES

    spark = get_session("plans-r11", adaptive=AQE)
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    names = ONLY or [n for n in HEADLINE if n in Q.QUERIES]
    for name in names:
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            k
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if k in plan
        ]
        print(f"{name}_{SUFFIX}: Exchange={n_ex} joins={joins}", flush=True)


if __name__ == "__main__":
    main()
