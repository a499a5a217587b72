"""Dump explain('formatted') for every headline query to plans/r10/.

Usage: python tools_dump_r10_plans.py <suffix>   # e.g. before / after

Bench posture (sf0.1, AQE off — the bench.py session) so the plan text
matches what the driver bench executes. One file per query:
plans/r10/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def main() -> None:
    from bench import HEADLINE
    from mapreduce_big_data_processing_spark import queries as Q
    from mapreduce_big_data_processing_spark.session import get_session

    spark = get_session("plans-r10", adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r10")
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
        py = [
            k
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
            if k in plan
        ]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
