"""Blocked-Bloom-filter pruned semi-join (driver extension; not in the
reference — its closest analogue is the reduce-side join of
`final project/src/**`, which always shuffles the full big side).

At 100 TB the dominant cost of `big LEFTSEMI small` on a
non-broadcastable small side is shuffling the BIG side. A Bloom filter of
the small side's keys is ~16 bits/key regardless of row width — an order
denser than a broadcast hash table of the keys — so it can be shipped to
every task even when the key set itself is borderline; probing it
scan-side drops most non-matching big rows before the exchange, shrinking
the shuffle by the join's selectivity. The final exact semi-join removes
false positives, so the operator's output is EXACTLY the semi-join result
(oracle: plain `IN` subquery) for any filter sizing.

The filter is the cache-line BLOCKED variant (Putze, Sanders & Singler,
JEA 2009 — the Impala/Kudu runtime-filter design, one block per key):
block index = hash0 mod num_blocks; k bits WITHIN the 64-bit block from
k seeded hashes. Build is one groupBy(block) with `bit_or` partial
aggregation — fully distributed, nothing ever collected to the driver;
the probe is ONE broadcast hash join on the block index plus a bitwise
mask test, entirely whole-stage-codegen.

Two discarded designs, both measured at the 100x fixtures
(BENCH_SCALE.md): an Arrow-stage probe spent ~3x the naive join's cost
serializing the big side through Python, and a literal-array bitmap
built a 131072-child CreateArray (50 s of py4j per-element calls to
construct, 16 MiB task binaries, interpreted evaluation). Scan-side
pruning only pays when the probe compiles to JVM code and the filter
ships as ordinary broadcast DATA.

Spark's own runtime bloom pushdown
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) covers the same idea
inside one query; this operator makes the filter explicit so it can be
built once and reused across queries/stages, sized deliberately, and
applied in front of Arrow-stage pipelines the optimizer cannot see into.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block(key: Column, num_blocks: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(0)), F.lit(num_blocks))


#: 64-entry power-of-two table: a column-count shiftleft without the SQL
#: string round-trip (the Python shiftleft wrapper only takes literal
#: counts). Entry 64 is the sign bit as a two's-complement long.
_POW2 = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def _mask(key: Column, num_hashes: int) -> Column:
    """OR of k single-bit masks within the 64-bit block, from k seeded
    hashes — all JVM expressions (bit select via a 64-element literal
    gather)."""
    m = None
    for i in range(1, num_hashes + 1):
        bit = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(64)).cast("int")
        one = F.element_at(F.lit(_POW2), bit + 1)
        m = one if m is None else m.bitwiseOR(one)
    return m


def build_bloom(
    small: DataFrame,
    key: str,
    num_blocks: int = 1 << 17,
    num_hashes: int = 4,
) -> DataFrame:
    """(block, bits) table of the blocked Bloom filter over the small
    side's keys: one `bit_or` aggregation, fully distributed. At the
    default sizing (2^17 blocks = 1 MiB of bits, k=4) the filter holds
    ~500 k keys at ~1 % false-positive rate; size num_blocks ~ n_keys/4
    for ~16 bits/key."""
    if num_blocks & (num_blocks - 1):
        raise ValueError(f"num_blocks must be a power of two, got {num_blocks}")
    k = F.col(key)
    bits = F.bit_or("__bloom_mask").alias(
        # sizing rides along as column metadata: a probe with DIFFERENT
        # sizing computes different block indexes and silently drops true
        # matches, so the probe side adopts (or verifies) these values.
        "__bloom_bits",
        metadata={"num_blocks": num_blocks, "num_hashes": num_hashes},
    )
    return (
        small.select(
            _block(k, num_blocks).alias("__bloom_block"),
            _mask(k, num_hashes).alias("__bloom_mask"),
        )
        .groupBy("__bloom_block")
        .agg(bits)
    )


def _filter_sizing(filter_df: DataFrame) -> tuple[int, int] | None:
    """Sizing recorded by :func:`build_bloom` in the filter's schema
    metadata, or None for a filter built elsewhere (e.g. read back from
    parquet through a path that drops metadata)."""
    try:
        md = filter_df.schema["__bloom_bits"].metadata or {}
    except KeyError:
        return None
    if "num_blocks" in md and "num_hashes" in md:
        return int(md["num_blocks"]), int(md["num_hashes"])
    return None


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_blocks: int | None = None,
    num_hashes: int | None = None,
    filter_df: DataFrame | None = None,
) -> DataFrame:
    """``big LEFTSEMI small ON key`` with a scan-side blocked-Bloom
    pre-filter.

    The probe is one broadcast hash join on the block index plus a
    bitwise containment test — pure codegen, no exchange of the big side
    until after pruning (an inner join: an ABSENT block proves no key
    hashed there, so the row is dropped). The exact semi-join afterwards
    removes false positives, so the result is identical to
    ``big.join(small, key, "left_semi")`` for any sizing (a smaller
    filter only means more rows shuffled, never a wrong row).

    Pass ``filter_df`` (a ``build_bloom`` result, possibly persisted) to
    reuse one filter across many queries — the explicit-reuse advantage
    over Spark's per-query runtime bloom pushdown. The probe's block/mask
    arithmetic must use the SIZING THE FILTER WAS BUILT WITH (a mismatch
    computes different block indexes and silently drops true matches), so
    the probe ADOPTS the sizing recorded in the filter's schema metadata;
    explicitly passing a conflicting num_blocks/num_hashes raises. For a
    filter whose metadata was stripped (e.g. round-tripped through a
    writer that drops it), pass the build sizing explicitly.
    """
    if filter_df is not None:
        rec = _filter_sizing(filter_df)
        if rec is not None:
            rb, rh = rec
            if num_blocks is not None and num_blocks != rb:
                raise ValueError(
                    f"bloom_semi_join: filter was built with num_blocks={rb} "
                    f"but probe asked for {num_blocks} — block indexes would "
                    "disagree and true matches would be dropped"
                )
            if num_hashes is not None and num_hashes != rh:
                raise ValueError(
                    f"bloom_semi_join: filter was built with num_hashes={rh} "
                    f"but probe asked for {num_hashes}"
                )
            num_blocks, num_hashes = rb, rh
        elif num_blocks is None or num_hashes is None:
            raise ValueError(
                "bloom_semi_join: filter_df carries no sizing metadata — "
                "pass the num_blocks/num_hashes it was built with"
            )
    num_blocks = 1 << 17 if num_blocks is None else num_blocks
    num_hashes = 4 if num_hashes is None else num_hashes
    words = filter_df if filter_df is not None else build_bloom(
        small, key, num_blocks, num_hashes
    )
    k = F.col(key)
    probe = big.withColumns(
        {
            "__bloom_block": _block(k, num_blocks),
            "__bloom_mask": _mask(k, num_hashes),
        }
    )
    pruned = (
        probe.join(F.broadcast(words), "__bloom_block")
        .filter(
            F.col("__bloom_bits")
            .bitwiseAND(F.col("__bloom_mask"))
            .eqNullSafe(F.col("__bloom_mask"))
        )
        .select(big.columns)
    )
    return pruned.join(small.select(key).distinct(), key, "left_semi")
