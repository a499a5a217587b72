"""Differential test mirroring the driver's DuckDB-oracle gate.

For every registered query with an oracle, run the Spark plan and the SQL
on the same parquet fixtures and compare row counts + sorted row values
(column order normalized by name, exact match after the queries' own
rounding). This is SURVEY.md §5.4 executed locally at sf0.001.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

#: full-registry sweep ≈ 6-7 min — the single biggest chunk of suite
#: wall-clock; the pre-commit canonical verify covers the same ground
#: at the gate SF, so the inner loop may skip it.
pytestmark = pytest.mark.slow

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{sf_dir}/{t}.parquet"
        # generated scale fixtures are Spark-written directories of parts
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise below the queries' rounding
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: total order even when a column mixes NULL and non-NULL
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in data), key=repr
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    rel = con.sql(ORACLES[name])
    dcols = rel.columns
    drows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    s_sorted, _ = _rows(scols, srows)
    d_sorted, _ = _rows(dcols, drows)
    assert len(s_sorted) == len(d_sorted), (
        f"{name}: row count {len(s_sorted)} vs oracle {len(d_sorted)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_oracle_sql_plans_in_duckdb(sf_dir):
    """Fast lint: EXPLAIN every oracle (no execution) — catches SQL typos,
    unknown functions, and schema drift in seconds, without waiting for
    the full differential sweep."""
    con = _duck(sf_dir)
    for name, sql in sorted(ORACLES.items()):
        try:
            con.sql("EXPLAIN " + sql)
        except Exception as e:  # pragma: no cover - failure formatting
            raise AssertionError(f"{name}: oracle SQL failed to plan: {e}")
