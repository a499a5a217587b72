"""Tests for readers/writers (SURVEY §2.1), streaming twins (§2.10), and
multimodal plumbing (driver extension)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.operators import multimodal as MM
from mapreduce_big_data_processing_spark.sources import readers as RD
from mapreduce_big_data_processing_spark.sources import writers as WR
from mapreduce_big_data_processing_spark.streaming import windows as SW


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def test_text_and_kv_readers(spark, tmp):
    p = os.path.join(tmp, "in")
    os.makedirs(p)
    with open(os.path.join(p, "a.txt"), "w") as f:
        f.write("k1\tv1\nk2\tv2\nnokey\n")
    lines = RD.read_text_lines(spark, p, with_file=True)
    assert lines.count() == 3 and "file" in lines.columns
    kv = {r.key: r.value for r in RD.read_kv_text(spark, p).collect()}
    assert kv == {"k1": "v1", "k2": "v2", "nokey": None}


def test_labeled_corpus_reader(spark, tmp):
    """S3 — folder-as-label layout (20-newsgroups shape)."""
    for label, doc, text in [
        ("sci", "d1.txt", "atoms\nquarks"),
        ("sci", "d2.txt", "stars"),
        ("rec", "d3.txt", "bikes"),
    ]:
        d = os.path.join(tmp, "corpus", label)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, doc), "w") as f:
            f.write(text)
    df = RD.read_labeled_corpus(spark, os.path.join(tmp, "corpus"))
    assert df.count() == 4
    got = {
        (r.label, r.doc_id)
        for r in df.select("label", "doc_id").distinct().collect()
    }
    assert got == {("sci", "d1.txt"), ("sci", "d2.txt"), ("rec", "d3.txt")}


def test_partitioned_sink_and_pruning(spark, tmp, sf_dir):
    """S7 — dynamic partition write; reading one partition must prune."""
    from mapreduce_big_data_processing_spark import catalog

    ev = catalog.load(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts")
    )
    out = os.path.join(tmp, "by_type")
    WR.write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    one = spark.read.parquet(out).filter(F.col("event_type") == "error")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan or "event_type" in plan
    assert one.count() == ev.filter(F.col("event_type") == "error").count()


def test_tsv_roundtrip(spark, tmp):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    out = os.path.join(tmp, "tsv")
    WR.write_tsv(df, out)
    back = RD.read_csv(spark, out, schema="k string, v int", sep="\t")
    assert {(r.k, r.v) for r in back.collect()} == {("a", 1), ("b", 2)}


def test_keyed_scan_paths(spark, sf_dir):
    """S10 — point get / range scan semantics."""
    from mapreduce_big_data_processing_spark import catalog

    c = catalog.load(spark, "customer", sf_dir)
    assert RD.keyed_table_scan(c, "c_custkey", point=1).count() == 1
    rng = RD.keyed_table_scan(c, "c_custkey", lower=10, upper=19)
    assert rng.count() == 10


def test_bucketed_table_join_skips_shuffle(spark, sf_dir, tmp):
    """S11 — bucketBy co-location: a join between two tables bucketed on
    the key must plan without an Exchange on either side (the declarative
    form of the reference's custom-Partitioner co-grouping)."""
    from mapreduce_big_data_processing_spark import catalog

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o = catalog.load(spark, "orders", sf_dir)
    c = catalog.load(spark, "customer", sf_dir)
    WR.save_as_table(o, "b_orders", bucket_cols=["o_custkey"], n_buckets=8)
    WR.save_as_table(
        c.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
        bucket_cols=["o_custkey"], n_buckets=8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_streaming_windowed_count_matches_batch(spark, sf_dir, tmp):
    """§2.10 — the streaming twin must produce the batch answer on a
    bounded input (same F.window expression, two modes)."""
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.operators import windows as WB

    # file stream sources need a directory of µs-timestamp files
    src = os.path.join(tmp, "events_stream")
    catalog.load(spark, "events", sf_dir).repartition(4).write.parquet(src)
    stream = SW.read_event_stream(spark, src)
    agg = SW.windowed_count_stream(stream, "1 hour", "10 hours", "event_type")
    SW.run_to_memory(agg, "stream_counts", output_mode="complete")
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.sql("SELECT * FROM stream_counts").collect()
    }
    ev = catalog.load(spark, "events", sf_dir)
    want = {
        (r.window_start, r.event_type): r.cnt
        for r in WB.windowed_count(ev, "ts", "1 hour", "event_type").collect()
    }
    assert got == want


def test_streaming_session_window(spark, sf_dir, tmp):
    from mapreduce_big_data_processing_spark import catalog

    src = os.path.join(tmp, "events_stream2")
    catalog.load(spark, "events", sf_dir).write.parquet(src)
    stream = SW.read_event_stream(spark, src)
    sess = SW.session_window_stream(stream, gap="30 minutes")
    SW.run_to_memory(sess, "stream_sessions", output_mode="complete")
    rows = spark.sql("SELECT * FROM stream_sessions").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)


def test_stateful_running_totals(spark, sf_dir, tmp):
    """applyInPandasWithState: final per-user running totals over a bounded
    stream must equal the batch groupBy aggregate."""
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.streaming import stateful as ST

    src = os.path.join(tmp, "events_state")
    catalog.load(spark, "events", sf_dir).write.parquet(src)
    stream = SW.read_event_stream(spark, src)
    out = ST.running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emitted row per user = final totals
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM running_totals) WHERE rn = 1
        """
    )
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()
    }
    ev = catalog.load(spark, "events", sf_dir)
    want = {
        r.user_id: (r.n, round(r.t, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def test_multimodal_feature_plumbing(spark):
    media = MM.synthetic_media(spark, 64)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    assert all(len(r.features) == MM.FEATURE_DIM for r in rows)
    # deterministic: same id → same features
    again = {r.media_id: r.features for r in MM.extract_features(media).collect()}
    first = {r.media_id: r.features for r in rows}
    assert again == first


def test_multimodal_error_stub(spark):
    media = MM.synthetic_media(spark, 4)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        MM.extract_features(media, decode_stub="error").collect()


def test_multimodal_resize_and_frames(spark):
    media = MM.synthetic_media(spark, 30)
    resized = MM.resize_images(media, 224, 224)
    assert resized.filter(F.col("meta.width") != 224).count() == 0
    frames = MM.sample_frames(media, every_n=10)
    assert frames.count() > 0
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, tmp):
    """§2.10 extension — dropDuplicatesWithinWatermark over a stream that
    delivers every event twice (two identical files) must converge to the
    batch distinct count, with state bounded by the watermark."""
    from mapreduce_big_data_processing_spark import catalog

    src = os.path.join(tmp, "dup_stream")
    ev = catalog.load(spark, "events", sf_dir)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery
    stream = SW.read_event_stream(spark, src)
    SW.run_to_memory(SW.dedup_stream(stream, watermark="10 hours"), "dedup_out")
    got = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    assert got == ev.count()


@pytest.mark.slow
def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp):
    """§2.10 extension — clicks⋈purchases within 1 hour per user, as a
    stream-stream join, must produce exactly the batch join's row set."""
    from mapreduce_big_data_processing_spark import catalog

    src = os.path.join(tmp, "ev_stream")
    ev = catalog.load(spark, "events", sf_dir)
    # Micro-batches must arrive in event-time order or the 10h watermark
    # out-runs data still in flight (a randomly-partitioned write makes
    # every file span the full month and batch 2+ rows get dropped as
    # late). FileStreamSource orders by modification time, so write one
    # file per week SEQUENTIALLY — ties on mod-time are not ordered.
    for lo, hi in [(1, 9), (9, 17), (17, 25), (25, 32)]:
        ev.filter(F.dayofmonth("ts").between(lo, hi - 1)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    s = SW.read_event_stream(spark, src)
    clicks = s.filter(F.col("event_type") == "click")
    buys = s.filter(F.col("event_type") == "purchase")
    SW.run_to_memory(
        SW.interval_join_stream(clicks, buys, upper="1 hour", watermark="10 hours"),
        "sj_out",
    )
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT l_event_id, r_event_id FROM sj_out").collect()
    }
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k2"), F.col("ts").alias("bts"),
        F.col("event_id").alias("bid"),
    )
    want = {
        (r.cid, r.bid)
        for r in c.join(
            b,
            (F.col("k") == F.col("k2"))
            & (F.col("bts") >= F.col("cts"))
            & (F.col("bts") <= F.col("cts") + F.expr("interval 1 hour")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp):
    """§2.3 J2 streaming twin — broadcast-joining a static dim into the
    stream must equal the batch join, with no stateful operator."""
    from mapreduce_big_data_processing_spark import catalog

    src = os.path.join(tmp, "enrich_stream")
    ev = catalog.load(spark, "events", sf_dir)
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    dim_static = spark.createDataFrame(dim.collect(), dim.schema)
    SW.run_to_memory(
        SW.enrich_stream(SW.read_event_stream(spark, src), dim_static), "enr_out"
    )
    got = {
        (r.event_id, r.first_seen)
        for r in spark.sql("SELECT event_id, first_seen FROM enr_out").collect()
    }
    want = {(r.event_id, r.first_seen) for r in ev.join(dim, "user_id").collect()}
    assert got == want and len(got) == ev.count()


def test_foreach_batch_sink_is_epoch_partitioned(spark, sf_dir, tmp):
    """Exactly-once sink plumbing: every input row lands exactly once,
    under an epoch=<batchId> partition that a retried batch would
    overwrite idempotently."""
    from mapreduce_big_data_processing_spark import catalog

    src = os.path.join(tmp, "fb_stream")
    out = os.path.join(tmp, "fb_out")
    ck = os.path.join(tmp, "fb_ck")
    ev = catalog.load(spark, "events", sf_dir)
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    SW.write_foreach_batch_parquet(SW.read_event_stream(spark, src), out, ck)
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert sorted(r.event_id for r in got.select("event_id").collect()) == sorted(
        r.event_id for r in ev.select("event_id").collect()
    )
    assert "epoch" in got.columns


def test_lenient_json_quarantine(spark, tmp):
    """One parse pass splits clean rows from quarantined raw lines; nothing
    is dropped and nothing kills the job."""
    p = os.path.join(tmp, "dirty.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": 2.5}\n')
        f.write('{"id": 2, "v": "NOT A NUMBER"}\n')   # type mismatch
        f.write('{"id": 3 BROKEN JSON\n')              # syntax error
        f.write('{"id": 4, "v": -1.0}\n')
    clean, quarantined = RD.read_json_lenient(spark, p, "id BIGINT, v DOUBLE")
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert len(bad) == 2 and all(isinstance(s, str) for s in bad)
    # replayability: the raw lines round-trip after a "parser fix"
    assert any("BROKEN" in s for s in bad)


def test_streaming_heavy_hitters_matches_batch(spark, sf_dir, tmp):
    """Bounded stream, capacity above the per-group domain: the final MG
    emission per group must carry EXACT counts equal to the batch
    groupBy — and stay bounded-state for unbounded streams."""
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.streaming import stateful as ST

    src = os.path.join(tmp, "events_hh")
    catalog.load(spark, "events", sf_dir).write.parquet(src)
    stream = SW.read_event_stream(spark, src)
    out = ST.streaming_heavy_hitters(stream, capacity=300)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.event_type, r.value): r.count_lb
        for r in spark.sql(
            """
            SELECT event_type, value, count_lb FROM (
              SELECT *, row_number() OVER (
                PARTITION BY event_type, value ORDER BY count_lb DESC) rn
              FROM hh_stream) WHERE rn = 1
            """
        ).collect()
    }
    ev = catalog.load(spark, "events", sf_dir)
    want = {
        (r.event_type, str(r.user_id)): r.n
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_jdbc_roundtrip_derby(spark, sf_dir):
    """S5/S9 against a real RDBMS: Spark ships Derby (the Hive-metastore
    dependency), so the JDBC source/sink run end-to-end in-process —
    including a partitioned (4-cursor) parallel read."""
    from mapreduce_big_data_processing_spark.sources.readers import read_jdbc
    from mapreduce_big_data_processing_spark.sources.writers import write_jdbc

    url = "jdbc:derby:memory:enginedb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_jdbc(
        nation, url, "NATION", mode="overwrite", driver=driver
    )
    back = read_jdbc(spark, url, "NATION", driver=driver)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    # parallel read: 4 JDBC cursors split on the key range
    par = read_jdbc(
        spark,
        url,
        "NATION",
        partition_column="N_NATIONKEY",
        lower_bound=0,
        upper_bound=30,
        num_partitions=4,
        driver=driver,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == nation.count()


def test_media_similarity_pipeline(spark):
    """Multimodal → ANN integration: media features (mapInPandas decode
    stub) flow straight into the similarity and quantization operators —
    the media dedup/search path with the decode step swapped for the
    deterministic fake."""
    from mapreduce_big_data_processing_spark.operators import quantization as QZ
    from mapreduce_big_data_processing_spark.operators import similarity as S

    feats = MM.extract_features(MM.synthetic_media(spark, 48)).select(
        "media_id", F.col("features").alias("embedding")
    )
    q = feats.filter(F.col("media_id") < 4).select(
        F.col("media_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(
        feats, q, k=5, id_col="media_id", query_id_col="query_id"
    )
    assert exact.groupBy("query_id").count().agg(F.min("count")).collect()[0][0] == 5
    # int8-quantized path agrees on the neighbor sets at high recall
    quant = QZ.quantized_topk(
        feats, q, k=5, id_col="media_id", query_id_col="query_id"
    )
    e = {(r["query_id"], r["media_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["media_id"]) for r in quant.collect()}
    assert len(e & g) / len(e) >= 0.8


def test_latest_k_versions_cell_semantics(spark):
    """S10 versions (`ppt/Ch6….pdf p.60-62`): newest-k cells per
    (rowkey, qualifier), newest first, deterministic tie-break."""
    from mapreduce_big_data_processing_spark.sources.readers import latest_k_versions

    rows = [
        # (rowkey, qualifier, version_ts, seq, value)
        (1, "cf:a", 100, 1, "v1"),
        (1, "cf:a", 200, 2, "v2"),
        (1, "cf:a", 300, 3, "v3"),
        (1, "cf:b", 100, 4, "b1"),
        (2, "cf:a", 50, 5, "x1"),
        # equal timestamps: seqid breaks the tie (higher = newer)
        (2, "cf:b", 70, 6, "old"),
        (2, "cf:b", 70, 7, "new"),
    ]
    df = spark.createDataFrame(
        rows, "rowkey long, qualifier string, ts long, seq long, value string"
    )
    got = {
        (r.rowkey, r.qualifier, r.version_rank): r.value
        for r in latest_k_versions(
            df, ["rowkey", "qualifier"], "ts", k=2, tiebreak_cols=["seq"]
        ).collect()
    }
    assert got == {
        (1, "cf:a", 1): "v3",
        (1, "cf:a", 2): "v2",
        (1, "cf:b", 1): "b1",
        (2, "cf:a", 1): "x1",
        (2, "cf:b", 1): "new",
        (2, "cf:b", 2): "old",
    }


def test_real_decode_ppm_golden():
    """Byte-level golden: a hand-built 2x1 P6 PPM decodes to exact
    grayscale bucket means — pins header parsing and pixel math."""
    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    feats = MM._decode_real(payload, "image", feature_dim=2)
    # pixel grayscales: (10+20+30)/3=20, (40+50+60)/3=50; /255 per bucket
    assert feats == [20.0 / 3 / 255 * 3, 50.0 / 255]
    assert abs(feats[0] - 20.0 / 255) < 1e-12


def test_real_decode_wav_golden():
    """Byte-level golden: stdlib-written PCM16 WAV decodes to exact
    |sample|/32768 bucket means."""
    import io
    import wave

    import numpy as np

    samples = np.array([0, 16384, -32768, 32767], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    feats = MM._decode_real(buf.getvalue(), "audio", feature_dim=2)
    assert feats[0] == (0.0 + 0.5) / 2
    assert abs(feats[1] - (1.0 + 32767 / 32768) / 2) < 1e-12


def test_real_generators_roundtrip():
    """The executor-side generators emit VALID formats: parse(make(x))
    recovers the deterministic pixels/samples, and the VID0 container
    yields its declared frame count."""
    import numpy as np

    arr, used = MM._parse_ppm(MM._make_ppm(7))
    assert arr.shape == (MM._IMG_H, MM._IMG_W, 3)
    idx = np.arange(MM._IMG_W * MM._IMG_H * 3)
    assert (arr.reshape(-1) == ((7 * 31 + idx * 7) % 256)).all()
    sr, samples = MM._parse_wav(MM._make_wav(7))
    assert sr == MM._WAV_SR and len(samples) == MM._WAV_N
    assert samples[0] == ((7 * 131) % 65536) - 32768
    frames = MM._parse_vid(MM._make_vid(7, 3))
    assert len(frames) == 3 and frames[0].shape == (MM._VID_H, MM._VID_W, 3)


def test_multimodal_real_decode_end_to_end(spark):
    """decode_stub='real' over real generated payloads: every kind decodes
    from actual bytes, features are sample-derived (in [0,1]) and
    deterministic across runs."""
    media = MM.synthetic_media(spark, 48, real_payloads=True)
    feats = MM.extract_features(media, decode_stub="real")
    rows = feats.collect()
    assert len(rows) == 48
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert len(r.features) == MM.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.features)
    again = {r.media_id: r.features for r in feats.collect()}
    assert again == {r.media_id: r.features for r in rows}


def test_multimodal_oracle_rounding_margin():
    """The multimodal_features oracle hashes per-kind feature averages
    rounded at 5 decimals. Cross-engine float noise is ~1e-13 (double sums
    over ~85 values); assert every unrounded average keeps ≥1e-8 of margin
    from the nearest round-half boundary so summation-order divergence can
    never flip a rounded digit. (Data is fixed — 256 seeded media rows — so
    this check is exhaustive, not probabilistic.)"""
    import duckdb

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["multimodal_features"].replace(
        "round(avg(CAST(feat AS DOUBLE)), 5)", "avg(CAST(feat AS DOUBLE))"
    )
    rows = duckdb.sql(sql).fetchall()
    assert len(rows) == 48
    worst = min(abs((v * 1e5) % 1 - 0.5) for _, _, v in rows)
    assert worst * 1e-5 > 1e-8, f"rounding margin too small: {worst * 1e-5}"


def test_table_lifecycle_admin(spark, sf_dir):
    """S11 lifecycle surface — drop/alter/rename wrappers
    (`ppt/Ch6-HBase与Hive程序设计.pdf p.23-38` teaches create/alter/
    disable/drop as one admin unit): ADD COLUMNS reads back NULL for
    pre-existing rows without a rewrite, RENAME is catalog-only, DROP
    removes both catalog entry and (managed, local-warehouse) data dir."""
    import os
    from urllib.parse import urlparse

    from mapreduce_big_data_processing_spark import catalog

    WR.drop_table(spark, "lc_nation")
    WR.drop_table(spark, "lc_nation2")
    n = catalog.load(spark, "nation", sf_dir)
    WR.save_as_table(n, "lc_nation")

    WR.alter_table_add_columns(spark, "lc_nation", {"note": "string"})
    t = spark.table("lc_nation")
    assert "note" in t.columns
    assert t.filter(t.note.isNull()).count() == t.count()  # old files -> NULL

    WR.rename_table(spark, "lc_nation", "lc_nation2")
    assert not spark.catalog.tableExists("lc_nation")
    assert spark.table("lc_nation2").count() == n.count()

    loc = None
    for r in spark.sql("DESCRIBE TABLE EXTENDED lc_nation2").collect():
        if r["col_name"] == "Location":
            loc = urlparse(r["data_type"]).path
    WR.drop_table(spark, "lc_nation2")
    assert not spark.catalog.tableExists("lc_nation2")
    assert loc and not os.path.exists(loc)  # managed dir cleared
