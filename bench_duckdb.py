"""DuckDB side of the BENCH_COMPARE methodology: run each headline query's
oracle SQL (same semantics, same parquet inputs) warm, median-of-3, full
fetchall materialization — symmetric with bench.py's protocol.

Prints one JSON line {"metric": "duckdb_oracle_total", ...}. Queries with
no oracle (rows-only) are skipped and listed under "skipped".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from bench import HEADLINE, SF_DIR


def main() -> None:
    from mapreduce_big_data_processing_spark import queries as Q

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = Q.oracle_sql()
    names = [n for n in HEADLINE if n in oracles]
    skipped = [n for n in HEADLINE if n not in oracles]

    for name in names:  # warm: OS file cache + duckdb metadata
        con.sql(oracles[name]).fetchall()

    times: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sorted(samples)[1], 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "skipped": skipped,
                "sf": float(m.group(1).rstrip(".")) if m else None,
            }
        )
    )


if __name__ == "__main__":
    main()
