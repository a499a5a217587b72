"""Streaming sinks that maintain KEYED TABLE STATE — the continuous-ingest
half of the S10 write path (`ppt/Ch6-HBase与Hive程序设计.pdf p.23-38`: Put/
Delete mutations against a row-keyed store, applied as they arrive).

`sources.writers.keyed_upsert` gives the batch MERGE; this module drives it
from a mutation STREAM via `foreachBatch` — the CDC shape (Kafka topic of
puts/deletes → keyed table) every ingest pipeline ends in. Convergence must
not depend on micro-batch order (a file-source replay orders files by
modification time, and concurrently-written parts tie arbitrarily — the
replay IS reordered in practice), so the state persists DELETE TOMBSTONES
(`keyed_upsert(keep_tombstones=True)`): max-version-per-key over rows that
include delete markers is associative and commutative for totally-ordered
versions. Without the stored tombstone, a batch carrying an older put for
a key whose delete already applied would resurrect it — measured: ~280 of
1206 sf0.1 users resurrected on roughly every second replay. Readers
filter `op = 'put'`; production compacts tombstones older than the replay
horizon (Cassandra's gc_grace discipline).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.sources import writers as W


def read_upsert_manifest(work_dir: str) -> dict | None:
    """Return the committed {generation, batch_id} pointer, or None if no
    commit has happened yet (fresh state dir)."""
    path = os.path.join(work_dir, "MANIFEST.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _atomic_json_commit(path: str, payload: dict) -> None:
    """Write a temp file, fsync, then ``os.replace`` — the one atomic
    primitive POSIX gives a plain filesystem. The manifest IS the commit:
    state only becomes visible to readers when the pointer lands, so a
    crash mid-way through writing new data leaves torn files that no
    reader ever opens (the write-new/swap-pointer discipline a table
    format's transaction log provides — Delta's _last_checkpoint /
    Iceberg's version-hint, reduced to its core)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def commit_upsert_manifest(work_dir: str, generation: int, batch_id: int) -> None:
    """Atomically commit the keyed-upsert state pointer (see
    :func:`_atomic_json_commit` — a torn next-generation directory is
    never opened because the pointer still names the old one)."""
    _atomic_json_commit(
        os.path.join(work_dir, "MANIFEST.json"),
        {"generation": generation, "batch_id": batch_id},
    )


def commit_history_manifest(
    work_dir: str, history: list[list], batch_id: int, retain: int
) -> None:
    """Atomically commit the retained-snapshot ledger of a
    ``retain_history`` keyed-upsert table: ``history`` is the ordered
    ``[[batch_id, dirname], ...]`` list of snapshot directories readers
    may open (newest last). Same primitive, richer pointer — the ledger
    is what makes :func:`read_keyed_table` time travel possible."""
    _atomic_json_commit(
        os.path.join(work_dir, "MANIFEST.json"),
        {
            "batch_id": batch_id,
            "history": [[int(b), str(d)] for b, d in history],
            "retain": retain,
        },
    )


def _snapshot_name(batch_id: int) -> str:
    return f"snap_{batch_id}"


def _gc_snapshots(work_dir: str, keep: set[str]) -> None:
    """Remove every ``snap_*`` directory the committed ledger does not
    list — folded-out retention victims AND orphans from torn attempts
    (a crash before a manifest commit leaves a directory no reader ever
    opens; the next successful batch sweeps it). Purely physical: the
    manifest already made these invisible."""
    for name in os.listdir(work_dir):
        if name.startswith("snap_") and name not in keep:
            shutil.rmtree(os.path.join(work_dir, name), ignore_errors=True)


def read_keyed_table(
    spark: SparkSession,
    work_dir: str,
    schema,
    as_of_batch: int | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Read a keyed-upsert table's LIVE rows (tombstones filtered,
    ``op_col`` dropped) — optionally AS OF a past micro-batch.

    ``as_of_batch=b`` returns the state after the newest committed batch
    with ``batch_id <= b`` — Delta/Iceberg ``VERSION AS OF``, reduced to
    the manifest ledger: snapshots are immutable once committed, so the
    read is reproducible forever (within retention) with no lock against
    concurrent ingest — the reader's manifest parse pins its snapshot.
    Requires the sink to have run with ``retain_history > 0``; asking for
    a batch older than the retention window raises (the snapshot is
    GC'd — same contract as a table format's VACUUM horizon). On an
    A/B-mode table (``retain_history=0``) only the current state
    (``as_of_batch=None``) is readable. ``schema`` is the explicit read
    schema (the torn-footer rule)."""
    return _read_snapshot(spark, work_dir, schema, as_of_batch).filter(
        F.col(op_col) == "put"
    ).drop(op_col)


def _resolve_snapshot(
    work_dir: str, as_of_batch: int | None = None
) -> tuple[int, str]:
    """(resolved batch id, snapshot dir) as of a batch — the shared
    resolver behind :func:`read_keyed_table` and
    :func:`keyed_table_changes`. Resolves DOWN to the newest committed
    batch <= as_of_batch."""
    mf = read_upsert_manifest(work_dir)
    if mf is None:
        raise RuntimeError("no committed keyed-upsert state in " + work_dir)
    hist = mf.get("history")
    if hist is None:
        if as_of_batch is not None:
            raise ValueError(
                "time travel needs a retain_history sink; this table is "
                "A/B-mode (no snapshot ledger in its manifest)"
            )
        return (
            int(mf["batch_id"]),
            ["state_a", "state_b"][int(mf["generation"])],
        )
    cands = [
        (int(b), d)
        for b, d in hist
        if as_of_batch is None or int(b) <= as_of_batch
    ]
    if not cands:
        raise ValueError(
            f"as_of_batch={as_of_batch} predates the retention window "
            f"(oldest retained batch: {int(hist[0][0])})"
        )
    return max(cands)


def _read_snapshot(
    spark: SparkSession,
    work_dir: str,
    schema,
    as_of_batch: int | None = None,
) -> DataFrame:
    """RAW snapshot rows (tombstones included) as of a batch."""
    _, rel = _resolve_snapshot(work_dir, as_of_batch)
    return spark.read.schema(schema).parquet(os.path.join(work_dir, rel))


def keyed_table_changes(
    spark: SparkSession,
    work_dir: str,
    schema,
    key_cols: list[str],
    from_batch: int,
    to_batch: int | None = None,
    op_col: str = "op",
    change_col: str = "change_type",
) -> DataFrame:
    """Change data feed between two retained snapshots — Delta/Iceberg
    CDF ("table_changes") reduced to the snapshot ledger: every row whose
    stored (key, version, values, op) state DIFFERS between the
    ``from_batch`` and ``to_batch`` snapshots, tagged ``insert`` (key had
    no live row before), ``update_postimage`` (key was live, row
    changed), or ``delete`` (the new state is a tombstone). Downstream
    incremental consumers (index maintenance, sync to a serving store)
    read this instead of re-scanning the table.

    Because the keyed-upsert MERGE is max-version-per-key over
    tombstoned rows, the multiset difference new EXCEPT ALL old is
    exactly the set of keys the intervening batches touched with a
    winning mutation — replays and no-op re-puts of an identical row do
    NOT appear (idempotent CDC, the property consumers want). Cost is
    one distributed anti-diff of two snapshots (a real table format
    reads per-commit change files instead; diffing immutable snapshots
    is the honest plain-parquet reduction, and it parallelizes as an
    ordinary shuffle join on the row hash). Both snapshots must still be
    inside the retention window, and ``from_batch`` must resolve at or
    before ``to_batch`` — a reversed window would silently mis-tag
    removals as inserts, so it raises instead."""
    from_id, from_rel = _resolve_snapshot(work_dir, from_batch)
    to_id, to_rel = _resolve_snapshot(work_dir, to_batch)
    if from_id > to_id:
        raise ValueError(
            f"keyed_table_changes: from_batch resolves to {from_id}, after "
            f"to_batch's {to_id} — the change window must run forward"
        )
    old = spark.read.schema(schema).parquet(os.path.join(work_dir, from_rel))
    new = spark.read.schema(schema).parquet(os.path.join(work_dir, to_rel))
    changed = new.exceptAll(old)
    old_live = (
        old.filter(F.col(op_col) == "put")
        .select(*key_cols)
        .withColumn("__had_live", F.lit(1))
    )
    tagged = changed.join(old_live, list(key_cols), "left").withColumn(
        change_col,
        F.when(F.col(op_col) == "delete", F.lit("delete"))
        .when(F.col("__had_live") == 1, F.lit("update_postimage"))
        .otherwise(F.lit("insert")),
    )
    return tagged.drop("__had_live", op_col)


#: The ingest-index manifest lives INSIDE the index directory. The name
#: starts with "_" so Spark's file listing ignores it (the _SUCCESS
#: convention) — the directory stays directly readable as parquet.
_IDX_MANIFEST = "_MANIFEST.json"


def read_index_manifest(idx_dir: str) -> dict | None:
    """Committed state of an ingest signature index:
    ``{"epochs": [...], "gen": g, "batch_id": b}`` — ``epochs`` is the
    EXACT set of committed ``sig_epoch`` partitions (compacted slices are
    negative generations), ``gen`` counts compactions, ``batch_id`` is
    the newest committed micro-batch. None = no commit yet."""
    path = os.path.join(idx_dir, _IDX_MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def commit_index_manifest(
    idx_dir: str, epochs: list[int], gen: int, batch_id: int
) -> None:
    """Atomically flip the index's committed-epoch set."""
    _atomic_json_commit(
        os.path.join(idx_dir, _IDX_MANIFEST),
        {"epochs": sorted(epochs), "gen": gen, "batch_id": batch_id},
    )


def _listed_epochs(idx_dir: str) -> list[int]:
    if not os.path.isdir(idx_dir):
        return []
    return sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(idx_dir)
        if e.startswith("sig_epoch=")
    )


def _committed_index_state(idx_dir: str) -> tuple[list[int], int, int]:
    """(committed epochs, compaction generation, last batch id) — from
    the manifest when one exists; a LEGACY index directory (slices
    written before the manifest protocol) adopts every listed slice as
    committed, preserving the old directory-listing semantics."""
    mf = read_index_manifest(idx_dir)
    if mf is not None:
        return list(mf["epochs"]), int(mf.get("gen", 0)), int(mf["batch_id"])
    eps = _listed_epochs(idx_dir)
    return eps, 0, (max(eps) if eps else -1)


def _keyed_upsert_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    work_dir: str,
    gens: list[str],
    schema,
    key_cols: list[str],
    version_col: str,
    op_col: str,
    retain_history: int = 0,
) -> None:
    """One micro-batch of the keyed-upsert fold (module-level so crash /
    redelivery scenarios can be exercised directly in tests).

    Exactly-once under foreachBatch's at-least-once contract: the
    committed manifest records the last batch_id whose output generation
    became visible, so a REDELIVERED batch (same id after a checkpoint
    recovery) is skipped outright, and a RETRIED batch (failed before
    commit) re-reads the still-committed input generation and overwrites
    the torn target — the flip only happens in the manifest commit, after
    the generation write completed. With ``retain_history > 0`` the
    target is a fresh per-batch snapshot directory instead of the
    alternating pair, the manifest carries the retained-snapshot ledger,
    and committed-then-rotated-out snapshots are GC'd AFTER the commit —
    the identical write-new/commit/sweep order as
    :func:`compact_ingest_index`."""
    mf = read_upsert_manifest(work_dir)
    if mf is None:
        raise RuntimeError(
            "keyed upsert state not seeded: no MANIFEST.json in " + work_dir
        )
    if batch_id <= mf["batch_id"]:
        return  # already committed — redelivery after checkpoint recovery
    spark = batch_df.sparkSession
    if retain_history > 0:
        if "history" not in mf:
            raise ValueError(
                "retain_history batch applied to an A/B-mode table "
                "(manifest has no snapshot ledger) — re-seed the state "
                "dir in the layout the sink will write"
            )
        hist = [[int(b), str(d)] for b, d in mf["history"]]
        cur_dir = os.path.join(work_dir, hist[-1][1])
        state = spark.read.schema(schema).parquet(cur_dir)
    else:
        if "generation" not in mf:
            raise ValueError(
                "A/B-mode batch applied to a retain_history table "
                "(manifest carries a snapshot ledger, not a generation "
                "pointer) — pass the sink's retain_history"
            )
        cur = mf["generation"]
        state = spark.read.schema(schema).parquet(gens[cur])
    merged = W.keyed_upsert(
        state,
        batch_df,
        key_cols=key_cols,
        version_col=version_col,
        op_col=op_col,
        keep_tombstones=True,
    )
    if retain_history > 0:
        name = _snapshot_name(batch_id)
        merged.write.mode("overwrite").parquet(os.path.join(work_dir, name))
        keep = (hist + [[batch_id, name]])[-retain_history:]
        commit_history_manifest(work_dir, keep, batch_id, retain_history)
        _gc_snapshots(work_dir, {d for _, d in keep})
    else:
        merged.write.mode("overwrite").parquet(gens[1 - cur])
        commit_upsert_manifest(work_dir, 1 - cur, batch_id)


def run_keyed_upsert_sink(
    spark: SparkSession,
    mutation_stream: DataFrame,
    base: DataFrame,
    work_dir: str,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
    retain_history: int = 0,
) -> DataFrame:
    """Drive a bounded mutation stream into keyed table state and return
    the final LIVE view (tombstones filtered, ``op_col`` dropped).

    ``retain_history=K > 0`` switches the state layout from the
    alternating A/B pair to one immutable snapshot directory per applied
    micro-batch, with the newest K listed in the manifest ledger — the
    time-travel mode :func:`read_keyed_table` consumes (``VERSION AS OF``
    over plain parquet). Storage cost is bounded by K full table copies
    (a real table format shares unchanged files across versions; per-
    batch full snapshots are the honest plain-parquet reduction), so K
    is a small constant in practice — the audit/debug window, not an
    archive.

    ``base`` seeds the state and must carry ``op_col`` — pass existing
    rows with ``op = 'put'``, or the tombstoned output of a previous
    bootstrap merge. The persisted state keeps delete tombstones so the
    merge sequence commutes across replay orders (module docstring).

    State lives in two alternating parquet generations under ``work_dir``
    (read generation N, write generation N+1, flip) — the
    write-new/swap-pointer discipline a real deployment gets from a table
    format's atomic commit (Delta/Iceberg); plain parquet has no atomic
    MERGE, and overwriting the directory a plan is still reading from is
    undefined. The POINTER is a manifest file committed by atomic rename
    (``MANIFEST.json``: {generation, batch_id}) rather than driver
    memory, so the commit protocol survives a crash between generation
    write and flip, and a redelivered batch (foreachBatch is
    at-least-once across checkpoint recovery) is detected by its id and
    skipped — see :func:`_keyed_upsert_apply_batch`. Each micro-batch
    applies the same `keyed_upsert` MERGE as the batch path: untouched
    keys (the vast majority at 100 TB) stream through broadcast
    anti/semi joins with no exchange, so per-trigger cost is
    O(batch + touched keys), not O(table).

    The checkpoint directory is reset per call: this is a bounded-replay
    harness (the local twin of a continuous Kafka query), and a stale
    checkpoint would skip the replayed files entirely.
    """
    if op_col not in base.columns:
        raise ValueError(
            f"run_keyed_upsert_sink: base must carry {op_col!r} "
            "(seed existing rows with op='put')"
        )
    gens = [os.path.join(work_dir, "state_a"), os.path.join(work_dir, "state_b")]
    ckpt = os.path.join(work_dir, "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    schema = base.schema
    # seed commit: seed state visible, no batch applied yet (-1 < any
    # foreachBatch id, which start at 0)
    if retain_history > 0:
        seed = _snapshot_name(-1)
        base.write.mode("overwrite").parquet(os.path.join(work_dir, seed))
        commit_history_manifest(work_dir, [[-1, seed]], -1, retain_history)
        _gc_snapshots(work_dir, {seed})
    else:
        base.write.mode("overwrite").parquet(gens[0])
        commit_upsert_manifest(work_dir, 0, -1)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _keyed_upsert_apply_batch(
            batch_df,
            batch_id,
            work_dir=work_dir,
            gens=gens,
            schema=schema,
            key_cols=key_cols,
            version_col=version_col,
            op_col=op_col,
            retain_history=retain_history,
        )

    q = (
        mutation_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_keyed_table(spark, work_dir, schema, op_col=op_col)


def _near_dup_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    idx_dir: str,
    dec_dir: str,
    n_hashes: int,
    bands: int,
    min_est_jaccard: float,
) -> None:
    """One micro-batch of the near-dup ingest fold (module-level so a
    retry — same ``batch_id`` re-applied after a mid-write failure — can
    be exercised directly in tests).

    Idempotence under retry requires reading the history STRICTLY BELOW
    the current epoch: a failed attempt may already have written this
    batch's own ``sig_epoch = batch_id`` index slice, and without the
    ``sig_epoch < batch_id`` filter every doc in the retried batch would
    find its own signatures in "history" (16/16 agreement) and flip to
    ``near_dup_of_history`` with ``matched_id = doc_id``. Since r10 the
    read is additionally MANIFEST-GATED: only epochs the index manifest
    committed are visible (``isin`` on the partition column — pruning
    keeps the read from scanning ROWS of any torn slice), so a crashed
    compaction attempt or a foreign partial write can never change the
    history set, with NO recovery action required. An explicit read
    schema keeps schema INFERENCE from sampling a torn file's footer
    too — without it, ``spark.read.parquet`` may open files from a
    failed attempt just to infer the schema and fail the whole read
    (r8 advice).
    """
    from mapreduce_big_data_processing_spark.operators import dedup as D

    sp = batch_df.sparkSession
    sig_schema = "doc_id bigint, h int, minhash bigint"
    # cache (not localCheckpoint: keep size statistics for the verify
    # joins' planning) — feeds the classify AND the index append
    sigs = D.minhash_signatures(
        D.shingles(batch_df, k=3), n_hashes=n_hashes, portable=True
    ).cache()
    try:
        epochs, gen, last_b = _committed_index_state(idx_dir)
        history = [e for e in epochs if e < batch_id]
        if history:
            index = (
                sp.read.schema(sig_schema + ", sig_epoch int")
                .parquet(idx_dir)
                .filter(F.col("sig_epoch").isin(history))
                .select("doc_id", "h", "minhash")
            )
        else:
            index = sp.createDataFrame([], sig_schema)
        decisions = D.incremental_near_dup(
            sigs,
            index,
            n_hashes=n_hashes,
            bands=bands,
            min_est_jaccard=min_est_jaccard,
        )
        (
            decisions.withColumn("ingest_epoch", F.lit(batch_id).cast("int"))
            .write.mode("overwrite")
            .partitionBy("ingest_epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(dec_dir)
        )
        # the index records EVERY ingested doc's signatures (kept or
        # dup — near-of-near must still attribute to history), the
        # rule that makes the daily fold equal the one-shot backfill
        (
            sigs.withColumn("sig_epoch", F.lit(batch_id).cast("int"))
            .write.mode("overwrite")
            .partitionBy("sig_epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(idx_dir)
        )
        # manifest commit is the LAST step: the new slice only becomes
        # history once the committed-epoch set includes it
        commit_index_manifest(
            idx_dir,
            sorted(set(epochs) | {batch_id}),
            gen,
            max(last_b, batch_id),
        )
    finally:
        sigs.unpersist()


def _embedding_near_dup_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    idx_dir: str,
    dec_dir: str,
    planes: list[list[float]],
    threshold: float,
) -> None:
    """One micro-batch of the EMBEDDING near-dup ingest fold (module-level
    for direct retry testing, like :func:`_near_dup_apply_batch`). Same
    idempotence protocol: manifest-gated history reads restricted to
    committed epochs below ``batch_id`` with an explicit schema (a
    failed attempt's own torn slice is invisible to row reads, schema
    inference, AND the committed-epoch set), and both outputs are
    dynamic partition overwrites keyed by the batch id."""
    from mapreduce_big_data_processing_spark.operators import similarity as S

    sp = batch_df.sparkSession
    idx_schema = "vec_id bigint, embedding array<float>, bucket bigint, sig_epoch int"
    sigs = S.arrow_signature(
        batch_df.select("vec_id", "embedding"), planes, "embedding"
    ).cache()
    try:
        epochs, gen, last_b = _committed_index_state(idx_dir)
        history = [e for e in epochs if e < batch_id]
        if history:
            index = (
                sp.read.schema(idx_schema)
                .parquet(idx_dir)
                .filter(F.col("sig_epoch").isin(history))
                .select("vec_id", "embedding", "bucket")
            )
        else:
            index = sp.createDataFrame(
                [], "vec_id bigint, embedding array<float>, bucket bigint"
            )
        decisions = S.incremental_embedding_near_dup(
            sigs, index, threshold=threshold
        )
        (
            decisions.withColumn("ingest_epoch", F.lit(batch_id).cast("int"))
            .write.mode("overwrite")
            .partitionBy("ingest_epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(dec_dir)
        )
        # EVERY ingested vector's signature enters the index (kept or dup
        # — near-of-near must still attribute to history), the rule that
        # makes the daily fold equal the one-shot backfill
        (
            sigs.withColumn("sig_epoch", F.lit(batch_id).cast("int"))
            .write.mode("overwrite")
            .partitionBy("sig_epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(idx_dir)
        )
        # manifest commit last — the slice becomes history only now
        commit_index_manifest(
            idx_dir,
            sorted(set(epochs) | {batch_id}),
            gen,
            max(last_b, batch_id),
        )
    finally:
        sigs.unpersist()


def run_embedding_near_dup_ingest_sink(
    spark: SparkSession,
    vec_stream: DataFrame,
    work_dir: str,
    planes: list[list[float]],
    threshold: float = 0.30,
) -> DataFrame:
    """Continuous-ingest embedding near-dedup as a streaming fold — the
    cosine twin of :func:`run_near_dup_ingest_sink`: each micro-batch of
    vectors is LSH-bucketed (one Arrow matmul stage), classified against
    the persisted bucket index of all prior batches
    (`similarity.incremental_embedding_near_dup`), and appended to the
    index. Same idempotence and mtime-order caveats as the minhash sink.
    Returns the cumulative decisions table (vec_id, ingest_epoch, status,
    matched_id, cosine)."""
    idx_dir = os.path.join(work_dir, "emb_index")
    dec_dir = os.path.join(work_dir, "emb_decisions")
    ckpt = os.path.join(work_dir, "ckpt_emb")
    for d in (idx_dir, dec_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _embedding_near_dup_apply_batch(
            batch_df,
            batch_id,
            idx_dir=idx_dir,
            dec_dir=dec_dir,
            planes=planes,
            threshold=threshold,
        )

    q = (
        vec_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dec_dir)


def compact_ingest_index(
    spark: SparkSession,
    idx_dir: str,
    watermark_epoch: int,
    schema: str,
) -> int:
    """Compact an ingest signature index's epoch partitions — the
    production hygiene a 100 TB/day fold needs (thousands of daily
    ``sig_epoch=N`` slices otherwise accumulate as small-file partitions
    the history read must list and prune forever; the
    Cassandra/LSM-compaction rationale).

    Every COMMITTED slice with ``sig_epoch < watermark_epoch`` is
    rewritten into ONE fresh slice at ``sig_epoch = -(gen + 1)`` (a new
    negative compaction generation, so the write NEVER touches a
    committed partition), and the manifest then atomically swaps those
    source epochs for the new one. Fold semantics are preserved for
    every batch at or above the watermark: compacted epochs are all
    negative, hence strictly below any live batch id, and the readable
    row set is unchanged (proved by the equivalence test and by the
    ``streaming_compacted_ingest`` external query). The caller owns the
    watermark contract: compact only epochs strictly below the smallest
    batch id that could still retry (a retry of batch b needs epochs
    < b individually excludable, which stays true because b's slice is
    never compacted while b can retry).

    Crash protocol (r10 — MANIFEST-gated, no recovery action needed):
    the compacted rows land in a partition no manifest lists, so a crash
    BEFORE the manifest commit leaves an orphan directory that no history
    read ever opens (reads filter to the committed-epoch set); a crash
    AFTER the commit but before source-slice removal leaves orphan SOURCE
    directories that are equally invisible. Either way the next batch's
    decisions are already correct with no re-run required, and the next
    compaction sweeps any unlisted ``sig_epoch=`` directory. This
    supersedes the r9 re-run-and-dedupe rule — and with it the
    unique-id-per-history caveat: compaction no longer deduplicates rows
    (nothing can be duplicated into visibility), so the readable history
    MULTISET is preserved exactly. ``schema`` is the explicit read
    schema (the torn-footer rule). Returns the number of source slices
    folded (0 = nothing to compact).

    A pre-manifest (legacy) index directory is adopted on first contact:
    every listed slice is treated as committed, and this compaction's
    manifest commit makes the protocol explicit from then on."""
    import shutil as _shutil

    if not os.path.isdir(idx_dir):
        return 0
    epochs, gen, last_b = _committed_index_state(idx_dir)
    fold = sorted(e for e in epochs if e < watermark_epoch)
    keep = [e for e in epochs if e >= watermark_epoch]
    if len(fold) <= 1:
        return 0
    target = -(gen + 1)
    compacted = (
        spark.read.schema(schema)
        .parquet(idx_dir)
        .filter(F.col("sig_epoch").isin(fold))
        .drop("sig_epoch")
        .withColumn("sig_epoch", F.lit(target).cast("int"))
        # materialize BEFORE the write: the output directory is also the
        # input, and Spark (rightly) refuses to overwrite a path a file
        # source in the same plan is reading — the checkpoint severs the
        # file dependency (stats loss is irrelevant: the next consumer is
        # a fresh spark.read)
        .localCheckpoint(eager=True)
    )
    (
        compacted.write.mode("overwrite")
        .partitionBy("sig_epoch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(idx_dir)
    )
    # THE commit: swap the folded epochs for the new generation slice
    committed = sorted([target] + keep)
    commit_index_manifest(idx_dir, committed, gen + 1, last_b)
    # garbage collection — folded sources AND any orphan from an earlier
    # torn attempt (everything not in the committed set); purely
    # physical, the manifest already made them invisible
    for e in _listed_epochs(idx_dir):
        if e not in committed:
            _shutil.rmtree(
                os.path.join(idx_dir, f"sig_epoch={e}"), ignore_errors=True
            )
    return len(fold)


def run_near_dup_ingest_sink(
    spark: SparkSession,
    doc_stream: DataFrame,
    work_dir: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Continuous-ingest NEAR dedup as a streaming fold: each micro-batch
    of documents is shingled and MinHash-signed, classified against the
    PERSISTED signature index of every previously ingested batch
    (`dedup.incremental_near_dup` — history precedence, signature-
    agreement verify), and then its own signatures are appended to the
    index — the per-day loop `multi_epoch_ingest_near_dup` replays as a
    one-shot backfill, driven here through foreachBatch the way a Kafka
    topic of new documents would be at 100 TB/day.

    Idempotence (the exactly-once half a sink owns): BOTH state tables
    are parquet directories partitioned by the micro-batch id with
    dynamic partition overwrite — a retried batch (same batchId after a
    failure) REPLACES its own decisions and its own index slice rather
    than duplicating them, and the history read is filtered to
    ``sig_epoch < batch_id`` so a failed attempt's own partially-written
    index slice can never count as history on the retry
    (``_near_dup_apply_batch``; exercised by the retry test). Per-trigger cost is O(batch × index-bucket
    collisions): only the new batch is ever shingled; history
    contributes 16 smallints + 4 band keys per doc, read back as a
    bucketable equi-join side. Returns the cumulative decisions table
    (doc_id, ingest_epoch, status, matched_id, est_jaccard).

    ORDER CAVEAT (the streaming_session_counts lesson): a multi-file
    replay orders files by (mtime, path) and same-write mtimes tie, so a
    caller replaying epoch files must give them strictly increasing
    mtimes for the fold to be deterministic — the epoch-order dependence
    is intrinsic to ingest dedup (history precedence), not an artifact
    of this sink.
    """
    idx_dir = os.path.join(work_dir, "sig_index")
    dec_dir = os.path.join(work_dir, "decisions")
    ckpt = os.path.join(work_dir, "ckpt")
    for d in (idx_dir, dec_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _near_dup_apply_batch(
            batch_df,
            batch_id,
            idx_dir=idx_dir,
            dec_dir=dec_dir,
            n_hashes=n_hashes,
            bands=bands,
            min_est_jaccard=min_est_jaccard,
        )

    q = (
        doc_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dec_dir)
