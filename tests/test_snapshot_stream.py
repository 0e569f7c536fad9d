"""Streaming extraction → snapshot-log sink (extraction_stream_to_snapshots):
one atomic manifest commit per micro-batch with extraction metrics, replay
idempotence by epoch_id, incremental continuation across restarts."""

from __future__ import annotations

import os

from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents
from deepseek_ocr_api_rs_spark.sources.snapshots import history, read_snapshot
from deepseek_ocr_api_rs_spark.streaming.jobs import extraction_stream_to_snapshots


def _stage(spark, landing: str, lo: int, hi: int, name: str) -> None:
    pdf = make_documents(hi - lo, start_id=lo)
    df = spark.createDataFrame(pdf)
    df.coalesce(1).write.parquet(os.path.join(landing, "_tmp_" + name))
    # move the part file in as a single landing file
    tmp = os.path.join(landing, "_tmp_" + name)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(landing, name + ".parquet"))
    import shutil

    shutil.rmtree(tmp)


def test_stream_commits_snapshots_with_lineage(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, landing, 0, 60, "a")

    extraction_stream_to_snapshots(spark, landing, table, ckpt)
    h1 = history(table)
    assert len(h1) >= 1
    # the sink records per-file warc_ts min/max for manifest-prune reads
    from deepseek_ocr_api_rs_spark.sources.snapshots import read_manifest

    stats = read_manifest(table).get("file_stats", {})
    assert stats and all("warc_ts" in v for v in stats.values())
    assert sum(x["metrics"]["n_docs"] for x in h1) == 60
    assert all("epoch_id" in x["metrics"] for x in h1)
    assert read_snapshot(spark, table).count() == 60

    # re-run with NO new input: no new epochs, no new commits (exactly-once)
    extraction_stream_to_snapshots(spark, landing, table, ckpt)
    assert len(history(table)) == len(h1)

    # new landing file → new epoch appends on top of the same lineage
    _stage(spark, landing, 60, 90, "b")
    extraction_stream_to_snapshots(spark, landing, table, ckpt)
    h2 = history(table)
    assert len(h2) == len(h1) + 1
    assert h2[0]["metrics"]["n_docs"] == 30
    assert read_snapshot(spark, table).count() == 90
    # epochs are distinct — the idempotence key for replayed batches
    epochs = [x["metrics"]["epoch_id"] for x in h2]
    assert len(set(epochs)) == len(epochs)
    # batch-equivalence: snapshot contents equal the batch extraction
    from deepseek_ocr_api_rs_spark.operators.extract import extract_documents

    batch = extract_documents(spark.read.parquet(landing))
    snap = read_snapshot(spark, table)
    assert snap.count() == batch.count()
    assert (
        snap.selectExpr("url", "n_chars")
        .exceptAll(batch.selectExpr("url", "n_chars"))
        .count()
        == 0
    )


def test_epoch_dedup_o1_reads_and_survives_expiry(spark, tmp_path):
    """The stream sink's replay dedup reads O(1) manifests (the CURRENT
    manifest carries stream_max_epoch), compaction carries the marker
    forward, and the marker survives expire_snapshots — so a crash-replay
    of an epoch older than the retention horizon still dedups (ADVICE
    r4)."""
    import deepseek_ocr_api_rs_spark.sources.snapshots as snap

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for i, name in enumerate("abcd"):
        _stage(spark, landing, i * 20, (i + 1) * 20, name)
        extraction_stream_to_snapshots(spark, landing, table, ckpt)
    max_epoch = max(x["metrics"]["epoch_id"] for x in history(table))
    assert snap.last_stream_epoch(table) == max_epoch

    # O(1): resolving the marker must read exactly ONE manifest
    reads = {"n": 0}
    real = snap.read_manifest

    def counting(table_dir, version=None):
        reads["n"] += 1
        return real(table_dir, version)

    snap.read_manifest, orig = counting, snap.read_manifest
    try:
        assert snap.last_stream_epoch(table) == max_epoch
        assert reads["n"] == 1
    finally:
        snap.read_manifest = orig

    # compaction carries the marker forward...
    snap.compact(spark, table, target_files=1)
    assert snap.last_stream_epoch(table) == max_epoch
    # ...and expiry cannot lose it (current manifest always survives)
    snap.expire_snapshots(table, keep_last=1)
    assert snap.last_stream_epoch(table) == max_epoch
    n_versions = len(history(table))
    rows = read_snapshot(spark, table).count()
    # replaying the whole stream after expiry (same checkpoint, no new
    # data) must commit nothing — the pre-horizon epochs all dedup
    extraction_stream_to_snapshots(spark, landing, table, ckpt)
    assert len(history(table)) == n_versions
    assert read_snapshot(spark, table).count() == rows


def test_cdc_stream_merge_on_read(spark, tmp_path):
    """CDC sink: upserts replace, deletes remove, delete-then-reinsert
    across epochs works (scoped MOR), replay is exactly-once, and
    maintenance (apply_deletes + compact) converges to the same table."""
    import shutil

    from deepseek_ocr_api_rs_spark.sources.snapshots import (
        apply_deletes,
        compact,
        read_manifest,
    )
    from deepseek_ocr_api_rs_spark.streaming.jobs import cdc_stream_to_snapshots

    landing = str(tmp_path / "changes")
    os.makedirs(landing)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def stage(name, rows):
        df = spark.createDataFrame(rows, "op string, id long, v long")
        tmp = os.path.join(landing, "_tmp_" + name)
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part),
                   os.path.join(landing, name + ".parquet"))
        shutil.rmtree(tmp)

    # epoch 0: initial inserts
    stage("a", [("upsert", i, i * 10) for i in range(8)])
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    got = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert got == {i: i * 10 for i in range(8)}

    # replay with no new input: nothing changes
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    assert len(history(table)) == len(history(table))
    n_versions = len(history(table))

    # epoch 1: update 2 keys, delete 2, insert 1
    stage("b", [("upsert", 1, 111), ("upsert", 2, 222),
                ("delete", 3, 0), ("delete", 4, 0),
                ("upsert", 99, 990)])
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    got = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert got == {0: 0, 1: 111, 2: 222, 5: 50, 6: 60, 7: 70, 99: 990}

    # epoch 2: re-insert a previously deleted key
    stage("c", [("upsert", 3, 333)])
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    got = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert got[3] == 333 and 4 not in got

    # epoch 3: delete-only epoch still advances the idempotence marker
    stage("d", [("delete", 99, 0)])
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    got = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert 99 not in got
    m = read_manifest(table)
    assert m["metrics"].get("stream_max_epoch") is not None

    # maintenance: materialize + compact → identical contents
    before = dict(got)
    apply_deletes(spark, table)
    compact(spark, table, target_files=1)
    after = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert after == before
    assert not read_manifest(table).get("deletes")


def test_cdc_crash_between_delete_and_append_replays_upserts(spark, tmp_path):
    """Code-review r6 #1: the epoch's delete batch must not advance the
    idempotence marker while the append is still due — simulate the
    crash window by committing the delete batch exactly as the sink
    does and asserting last_stream_epoch still reports the PRIOR epoch
    (so a replay re-runs the whole epoch, including the upserts)."""
    from deepseek_ocr_api_rs_spark.sources.snapshots import (
        delete_keys,
        last_stream_epoch,
        write_snapshot,
    )

    t = str(tmp_path / "table")
    write_snapshot(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
        t, mode="append",
        metrics={"epoch_id": 0, "stream_max_epoch": 0},
    )
    assert last_stream_epoch(t) == 0
    # epoch 1 "crashes" after the delete commit (upserts still pending):
    # the sink stamps cdc_epoch, NOT epoch_id/stream_max_epoch
    delete_keys(
        spark, t, spark.createDataFrame([(1,)], "id long"), "id",
        metrics={"cdc_epoch": 1, "cdc_changes": 2},
    )
    assert last_stream_epoch(t) == 0  # replay of epoch 1 NOT skipped
    # the replayed append then completes the epoch
    write_snapshot(
        spark.createDataFrame([(1, 11)], "id long, v long"),
        t, mode="append",
        metrics={"epoch_id": 1, "stream_max_epoch": 1},
    )
    assert last_stream_epoch(t) == 1
    got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
    assert got == {1: 11, 2: 20}


def test_cdc_null_op_upserts_instead_of_vanishing(spark, tmp_path):
    """Code-review r6 #5: a NULL op row must upsert ('every other op
    value upserts'), not silently delete its key."""
    import shutil

    from deepseek_ocr_api_rs_spark.streaming.jobs import cdc_stream_to_snapshots

    landing = str(tmp_path / "changes")
    os.makedirs(landing)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def stage(name, rows):
        df = spark.createDataFrame(rows, "op string, id long, v long")
        tmp = os.path.join(landing, "_tmp_" + name)
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part),
                   os.path.join(landing, name + ".parquet"))
        shutil.rmtree(tmp)

    stage("a", [("upsert", 1, 10), ("upsert", 2, 20)])
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    stage("b", [(None, 1, 111)])  # writer omitted op: means upsert
    cdc_stream_to_snapshots(spark, landing, table, ckpt)
    got = {r.id: r.v for r in read_snapshot(spark, table).collect()}
    assert got == {1: 111, 2: 20}
