"""Data-layout pruning tests, verified against parquet footer statistics.

Plan text can show a pushed filter, but whether pruning WORKS depends on
the file stats the writer produced. These tests read the footers back with
pyarrow and measure the fraction of files a range predicate would touch —
the number that decides scan cost at 100 TB.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark.sources import layout


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per data file, from footer row-group stats."""
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    return ranges


def _touch_fraction(ranges: list[tuple], lo, hi) -> float:
    hit = sum(1 for a, b in ranges if not (b < lo or a > hi))
    return hit / len(ranges)


def test_range_clustering_makes_file_stats_selective(spark, sf_dir, tmp_path):
    li = catalog.load(spark, "lineitem", sf_dir)
    lo = li.agg({"l_shipdate": "min"}).collect()[0][0]
    hi = li.agg({"l_shipdate": "max"}).collect()[0][0]
    mid = lo + (hi - lo) / 2
    narrow = (mid, mid + (hi - lo) / 20)  # a 5%-wide date slice

    clustered = str(tmp_path / "clustered")
    baseline = str(tmp_path / "baseline")
    layout.write_range_clustered(li, clustered, ["l_shipdate"], num_files=16)
    li.repartition(16).write.mode("overwrite").parquet(baseline)

    frac_clustered = _touch_fraction(_file_ranges(clustered, "l_shipdate"), *narrow)
    frac_baseline = _touch_fraction(_file_ranges(baseline, "l_shipdate"), *narrow)

    # random layout: every file spans the full range -> nothing prunes
    assert frac_baseline >= 0.9
    # clustered: a 5% slice touches at most ~2 of 16 files
    assert frac_clustered <= 0.2, frac_clustered

    # and the engine answers identically from the clustered copy
    pred = f"l_shipdate >= '{narrow[0]}' AND l_shipdate < '{narrow[1]}'"
    assert (
        spark.read.parquet(clustered).filter(pred).count()
        == spark.read.parquet(baseline).filter(pred).count()
    )


def test_z_order_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    li = catalog.load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_ord = li.agg({"l_orderkey": "max"}).collect()[0][0]
    n_prt = li.agg({"l_partkey": "max"}).collect()[0][0]

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single_sort")
    layout.write_z_ordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=16)
    # single-column clustering: prunes the leading column only
    layout.write_range_clustered(li, spath, ["l_orderkey"], num_files=16)

    # a 5%-wide slice on each dimension, placed inside a z-quadrant
    # (a slice straddling the 0.5 boundary touches both halves of the
    # curve by construction — that's curve geometry, not a layout bug)
    ord_slice = (int(n_ord * 0.30), int(n_ord * 0.35))
    prt_slice = (int(n_prt * 0.30), int(n_prt * 0.35))

    z_ord = _touch_fraction(_file_ranges(zpath, "l_orderkey"), *ord_slice)
    z_prt = _touch_fraction(_file_ranges(zpath, "l_partkey"), *prt_slice)
    s_ord = _touch_fraction(_file_ranges(spath, "l_orderkey"), *ord_slice)
    s_prt = _touch_fraction(_file_ranges(spath, "l_partkey"), *prt_slice)

    # the single sort is perfect on its leading column, useless on the other
    assert s_ord <= 0.2 and s_prt >= 0.9
    # z-order prunes meaningfully on BOTH (16 files over 2D -> ~sqrt locality)
    assert z_ord <= 0.5, z_ord
    assert z_prt <= 0.5, z_prt

    # row counts survive the rewrite
    assert spark.read.parquet(zpath).count() == li.count()


def test_z_value_bit_interleave(spark):
    """Morton-code unit check: z(1,0)=1, z(0,1)=2, z(3,3)=15, z(2,1)=6."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3), (2, 1)], "x long, y long")
    out = df.select(layout.z_value([F.col("x"), F.col("y")], bits=4).alias("z"))
    assert [r.z for r in out.collect()] == [1, 2, 15, 6]

def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from mapreduce_big_data_processing_spark.sources.layout import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(64).write.parquet(src)  # simulate a small-files tree
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n_out = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_out < 64
    assert len(glob.glob(f"{dst}/*.parquet")) == n_out
    a = spark.read.parquet(dst)
    assert a.count() == li.count()
    assert a.exceptAll(spark.read.parquet(src)).count() == 0


def test_compact_with_clustering_restores_pruning(spark, sf_dir, tmp_path):
    """Compaction with sort_within_by must leave narrow per-file ranges —
    checked against parquet footer stats like the other layout tests."""
    import glob

    import pyarrow.parquet as pq

    from mapreduce_big_data_processing_spark.sources.layout import compact_parquet

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "comp2")
    # sf0.01 explicitly: the default fixture is too small to yield >1 file
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, sort_within_by=["l_shipdate"])
    files = sorted(glob.glob(f"{dst}/*.parquet"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    # files must tile the key space: sorted by min, each file's range must
    # not contain another file's whole range (disjoint-ish clustering)
    ranges.sort()
    overlaps = sum(
        1 for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]) if b_lo < a_hi
    )
    # range-partitioned output: at most boundary-touch overlaps
    assert overlaps <= len(ranges) // 2
