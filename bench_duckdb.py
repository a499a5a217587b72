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
        path = f"{SF_DIR}/{t}.parquet"
        # driver fixtures are single files; tools_gen_scale output is a
        # directory of part files — glob either way
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    oracles = Q.oracle_sql()
    names = [n for n in HEADLINE if n in oracles]
    skipped = [n for n in HEADLINE if n not in oracles]

    # scale-run knobs (defaults preserve the driver-facing protocol):
    # some oracle SQL is written for CORRECTNESS (unrolled replays, cross
    # joins) and is intractable at 100x — a timeout records that honestly
    # instead of hanging the sweep
    n_samples = int(os.environ.get("SPARK_GRAFT_DUCK_SAMPLES", "3"))
    timeout_s = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "0") or 0)

    def run(sql: str) -> bool:
        """Execute to completion; False if interrupted by the timeout."""
        import threading

        timer = None
        if timeout_s > 0:
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
        try:
            con.sql(sql).fetchall()
            return True
        except duckdb.InterruptException:
            return False
        finally:
            if timer is not None:
                timer.cancel()

    times: dict[str, float] = {}
    timed_out: list[str] = []
    for name in names:
        if not run(oracles[name]):  # warm: OS file cache + duckdb metadata
            timed_out.append(name)
            print(f"# timeout {name}", file=sys.stderr, flush=True)
            continue
        samples = []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            ok = run(oracles[name])
            samples.append(time.perf_counter() - t0)
            if not ok:
                timed_out.append(name)
                break
        else:
            import statistics

            times[name] = round(statistics.median(samples), 3)
            print(f"# {name} {times[name]}", file=sys.stderr, flush=True)
            continue

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "skipped": skipped,
                "timed_out": timed_out,
                "sf": float(m.group(1).rstrip(".")) if m else None,
            }
        )
    )


if __name__ == "__main__":
    main()
