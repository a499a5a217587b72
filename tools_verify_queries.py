"""Spot-verify named registry queries Spark-vs-DuckDB on a plain session.

Usage: python tools_verify_queries.py [--mem=16g] <sf_dir> <name> [<name> ...]
Mirrors the driver protocol (see .claude/skills/verify/SKILL.md): plain
SparkSession (no SQL-conf tuning at build time), column order normalized
by name, floats rounded to 9 decimals, sorted-row exact compare.

JVM sizing (r9 verdict ask #3): the default-heap JVM dies broadcasting
at the sf1g 10x fixtures, so the heap is auto-sized from the fixture
directory's parquet footprint (>= 128 MB of input -> 16g, the sweep
harness's proven setting) unless overridden with --mem=<heap> or
SPARK_GRAFT_VERIFY_MEM. Heap size is a JVM resource knob, not a SQL
conf — the session still mirrors the driver's query semantics.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def norm(v):
    if isinstance(v, float):
        # + 0.0 canonicalizes IEEE negative zero: the engines can produce
        # -0.0 vs 0.0 for noise-signed near-zero values (numerically equal,
        # so the driver-style numeric sort never sees it) and the repr-based
        # row sort here would misalign the two lists and report a phantom
        # FAIL (the r4 "embedding_top_pc sweep transient", diagnosed r5).
        return "NaN" if math.isnan(v) else round(v, 9) + 0.0
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def _fixture_bytes(sf: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(sf):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def main():
    args = list(sys.argv[1:])
    mem = os.environ.get("SPARK_GRAFT_VERIFY_MEM", "")
    for a in list(args):
        if a.startswith("--mem="):
            mem = a.split("=", 1)[1]
            args.remove(a)
    sf = args[0]
    names = args[1:]
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    if not mem and _fixture_bytes(sf) >= 128 * 1024 * 1024:
        mem = "16g"
    builder = SparkSession.builder.master("local[8]")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
        print(f"driver memory: {mem}")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{sf}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for name in names:
        sdf = qs[name](spark, sf)
        so = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        s = sorted(
            (tuple(norm(r[i]) for i in so) for r in sdf.collect()), key=repr
        )
        if name not in osql:
            print("ROWS", name, len(s))
            continue
        rel = con.sql(osql[name])
        do = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
        d = sorted(
            (tuple(norm(r[i]) for i in do) for r in rel.fetchall()), key=repr
        )
        ok = sorted(sdf.columns) == sorted(rel.columns) and s == d
        if not ok:
            fails.append(name)
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print("FAIL", name, len(s), "vs", len(d), diff)
            # persist the full mismatch payload (r4 verdict ask #6 — a
            # transient must be diagnosable after green re-runs)
            import hashlib
            import json
            import time

            art = {
                "name": name,
                "sf_dir": sf,
                "spark_columns": list(sdf.columns),
                "oracle_columns": list(rel.columns),
                "spark_rows": len(s),
                "oracle_rows": len(d),
                "spark_hash": hashlib.sha256(repr(s).encode()).hexdigest()[:16],
                "oracle_hash": hashlib.sha256(repr(d).encode()).hexdigest()[:16],
                "spark_sample": [repr(r) for r in s[:5]],
                "oracle_sample": [repr(r) for r in d[:5]],
            }
            fn = f"sweep_fail_{name}_{int(time.time())}.json"
            with open(fn, "w") as fh:
                json.dump(art, fh, indent=1)
            print("FAIL_ARTIFACT", fn)
        else:
            print("OK  ", name, len(s))
    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
