"""Bloom-filter pruned semi-join (driver extension; not in the reference —
its closest analogue is the reduce-side join of `final project/src/**`,
which always shuffles the full big side).

At 100 TB the dominant cost of `big LEFTSEMI small` on a non-broadcastable
small side is shuffling the BIG side. A Bloom filter of the small side's
keys is a few MiB regardless of row width, so it CAN be broadcast even when
the rows cannot; probing it scan-side drops most non-matching big rows
before the exchange, shrinking the shuffle by the join's selectivity. The
final exact semi-join removes Bloom false positives, so the operator's
output is EXACTLY the semi-join result (oracle: plain `IN` subquery).

Spark's own runtime bloom pushdown
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) covers the same idea
inside one query; this operator makes the filter explicit so it can be
built once and reused across queries/stages, sized deliberately, and
applied to Arrow-stage pipelines the optimizer cannot see into.

Construction is the classic Bloom (Bloom, CACM 1970) with
Kirsch-Mitzenmacher double hashing (ESA'06): positions h1 + i·h2 mod m.
Keys of any type are first hashed to int64 JVM-side (xxhash64), so the
Arrow stages only ever see fixed-width integers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = "__bloom_key"


def _splitmix(x: np.ndarray, counter: int) -> np.ndarray:
    """splitmix64 finalizer on uint64 (wrapping arithmetic)."""
    z = x + np.uint64((counter * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(keys: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n, num_hashes) bit positions; num_bits must be a power of two."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix(x, 1)
    h2 = _splitmix(x, 2) | np.uint64(1)  # odd => cycles the whole table
    i = np.arange(num_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(num_bits - 1)


def _with_key(df: DataFrame, key: str) -> DataFrame:
    return df.withColumn(_KEY, F.xxhash64(F.col(key)))


def build_bloom(
    small: DataFrame, key: str, num_bits: int = 1 << 23, num_hashes: int = 5
) -> np.ndarray:
    """Build the filter distributed: each partition folds ALL its batches
    into one local bitmap and emits that single row, so the driver collects
    O(partitions × num_bits/8) bytes — model-sized, never data-sized — and
    ORs them. Returns the packed uint8 bitmap (num_bits/8 bytes)."""
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    import pyarrow as pa

    nb, nh = num_bits, num_hashes

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bits = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for b in batches:
            seen = True
            # xxhash64 output is non-nullable int64: zero-copy, full 64-bit
            # fidelity (a float64 detour would corrupt keys above 2^53)
            keys = b.column(0).to_numpy()
            if len(keys):
                pos = _positions(keys, nb, nh).ravel()
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bits.tobytes()], type=pa.binary())], ["bitmap"]
            )

    parts = (
        _with_key(small, key)
        .select(_KEY)
        .mapInArrow(fold, schema="bitmap binary")
        .collect()
    )
    out = np.zeros(num_bits // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bitmap"], dtype=np.uint8)
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """``big LEFTSEMI small ON key`` with a scan-side Bloom pre-filter.

    The probe is a zero-shuffle Arrow stage directly over the big-side
    scan; only rows whose key MIGHT be in the small side reach the
    exchange. The exact semi-join afterwards removes false positives, so
    the result is identical to ``big.join(small, key, "left_semi")`` for
    any filter size (smaller ``num_bits`` only means more rows shuffled,
    never a wrong row). Expected false-positive rate at the defaults:
    (1-e^{-kn/m})^k ~ 0.6 % at n=1 M keys, m=2^23 bits (1 MiB), k=5.
    """
    bits = build_bloom(small, key, num_bits, num_hashes)
    spark = big.sparkSession
    bc = spark.sparkContext.broadcast(bits.tobytes())
    nb, nh = num_bits, num_hashes
    import pyarrow as pa

    def probe(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for b in batches:
            keys = b.column(b.num_columns - 1).to_numpy()  # non-null int64
            if len(keys):
                pos = _positions(keys, nb, nh)
                hit = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
                yield b.filter(pa.array(hit))
            else:
                yield b

    tagged = _with_key(big, key)
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in tagged.schema.fields)
    pruned = tagged.mapInArrow(probe, schema=schema).drop(_KEY)
    return pruned.join(small.select(key).distinct(), key, "left_semi")
