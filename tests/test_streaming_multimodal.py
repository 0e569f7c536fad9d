"""Streaming + multimodal operator tests (tier-3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.multimodal import image_metadata
from deepseek_ocr_api_rs_spark.streaming.jobs import (
    extraction_stream,
    hourly_event_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    got = hourly_event_counts_stream(spark, f"{SF}/events.parquet")
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
    )
    g = got.withColumn("window_start", F.col("window_start").cast("string"))
    b = batch.withColumn("window_start", F.col("window_start").cast("string"))
    assert g.count() == b.count()
    assert g.exceptAll(b).count() == 0


def test_extraction_stream_incremental(spark, tmp_path, corpus_path):
    """Documents are extracted exactly once across stream restarts
    (streaming checkpoint = the continuous-ingestion resume story)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet(corpus_path)
    docs.limit(100).write.mode("overwrite").parquet(str(landing))

    extraction_stream(spark, str(landing), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    # restart with NO new files → nothing reprocessed
    extraction_stream(spark, str(landing), out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # a new file lands → only it is processed on the next restart
    docs.limit(150).filter("url like '%page/1%'").write.mode("overwrite").parquet(
        str(tmp_path / "b2")
    )
    import shutil

    for i, f in enumerate((tmp_path / "b2").glob("*.parquet")):
        shutil.copy(str(f), str(landing / f"late_{i}.parquet"))
    extraction_stream(spark, str(landing), out, ckpt)
    assert spark.read.parquet(out).count() > n1


def test_image_metadata_batching(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    meta = image_metadata(docs, binary_col="payload")
    rows = meta.orderBy("doc_id").limit(5).collect()
    src = {r.doc_id: r for r in spark.read.parquet(f"{SF}/documents.parquet").limit(5).collect()}
    for r in rows:
        n = len(src[r.doc_id].text.encode("utf-8"))
        assert r.n_bytes == n
        assert r.width == n % 640 + 1
        assert r.height == n % 480 + 1
        assert r.mode == ("RGB" if n > 0 else "EMPTY")


def test_real_decode_stub_is_gone():
    """The historical ``real_decode_stub`` seam is deleted (VERDICT r7 #6):
    every supported format has a REAL pixel decode in
    extraction.raster.decode_image_pixels, and the package must contain no
    NotImplementedError placeholders — an ImportError is the honest signal
    for retired names."""
    from deepseek_ocr_api_rs_spark.operators import multimodal

    assert not hasattr(multimodal, "real_decode_stub")


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a duplicate arriving in a
    LATER micro-batch is suppressed by keyed state (KV-cache-as-state
    analogue, crates/core/src/cache.rs:358-401)."""
    import glob
    import shutil

    from deepseek_ocr_api_rs_spark.streaming.jobs import streaming_dedup

    docs = spark.createDataFrame(
        [
            (1, "en", "hello world"),
            (2, "en", "something else entirely"),
            (3, "en", "HELLO   world"),   # dup of 1, later batch
            (4, "de", "hello world"),     # same text, different group → kept
        ],
        "doc_id long, lang string, text string",
    )
    tmp = str(tmp_path)
    docs.filter("doc_id <= 2").coalesce(1).write.parquet(f"{tmp}/a")
    docs.filter("doc_id >= 3").coalesce(1).write.parquet(f"{tmp}/b")
    land = f"{tmp}/land"
    import os

    os.makedirs(land)
    import time

    now = time.time()
    for i, f in enumerate(
        sorted(glob.glob(f"{tmp}/a/*.parquet")) + sorted(glob.glob(f"{tmp}/b/*.parquet"))
    ):
        dst = f"{land}/f{i}.parquet"
        shutil.copy(f, dst)
        # the file stream source orders batches by modification time —
        # pin distinct mtimes so batch order (and thus first-seen) is fixed
        os.utime(dst, (now - 100 + i, now - 100 + i))

    res = streaming_dedup(spark, land, f"{tmp}/ckpt")
    kept = sorted(r.doc_id for r in res.collect())
    assert kept == [1, 2, 4]


def test_resize_banker_rounding(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import resize_images

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    rows = resize_images(docs, max_side=100).limit(20).collect()
    for r in rows:
        assert max(r.out_width, r.out_height) <= 100
        assert r.out_width <= r.width and r.out_height <= r.height


def test_frame_sampling_fanout(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import sample_frames

    docs = spark.createDataFrame(
        [(1, b"x" * 100), (2, b"y" * 3), (3, None), (4, b"")],
        "doc_id long, payload binary",
    )
    rows = sample_frames(docs, n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.byte_offset))
    assert sorted(by_doc[1]) == [(0, 0), (1, 25), (2, 50), (3, 75)]
    assert len(by_doc[2]) == 3  # capped at payload size
    assert 3 not in by_doc and 4 not in by_doc  # empty/null yield no frames


def test_audio_features_deterministic(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import audio_features

    docs = spark.createDataFrame(
        [(1, bytes([1, 2, 3])), (2, None)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in audio_features(docs).collect()}
    assert rows[1].energy == 6 and rows[1].n_bytes == 3
    assert rows[2].energy == 0 and rows[2].n_bytes == 0


def test_stream_append_mode_equals_batch(spark, tmp_path):
    """Append-mode file sink: closed windows emitted exactly once equal the
    batch rollup (no complete-mode full-aggregate state)."""
    from deepseek_ocr_api_rs_spark.streaming.jobs import (
        hourly_event_counts_stream_append,
    )

    got = hourly_event_counts_stream_append(
        spark, f"{SF}/events.parquet", str(tmp_path / "work")
    )
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
    )
    g = got.withColumn("window_start", F.col("window_start").cast("string"))
    b = batch.withColumn("window_start", F.col("window_start").cast("string"))
    assert g.count() == b.count()
    assert g.exceptAll(b).count() == 0
    # exactly-once: re-reading the sink (idempotent call reuses staged
    # landing + checkpoint -> no duplicate windows appended)
    again = hourly_event_counts_stream_append(
        spark, f"{SF}/events.parquet", str(tmp_path / "work")
    )
    assert again.count() == b.count()


def test_dedup_state_grows_by_new_fingerprints_only():
    """KV-cache growth discipline: state work is O(new fps); no-new batches
    write nothing; existing state is appended to, never re-sorted."""
    from deepseek_ocr_api_rs_spark.streaming.jobs import _dedup_batch

    fp1, fp2, fp3 = b"\x01" * 16, b"\x02" * 16, b"\x03" * 16
    state0 = [fp2]  # arrival order preserved, unsorted
    new_state, ids, fps = _dedup_batch(state0, [10, 11, 12], [fp3, fp2, fp1])
    assert ids == [10, 12]
    assert fps == [fp3.hex(), fp1.hex()]
    assert new_state == [fp2, fp3, fp1]  # appended tail == first-seen order
    # all-duplicate batch -> None: the caller skips the state write
    no_change, ids2, _ = _dedup_batch(new_state, [13], [fp2])
    assert no_change is None and ids2 == []


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """Stateful streaming sessionization (EventTimeTimeout flush) equals the
    batch gap-sessionizer exactly — state survives across micro-batches and
    open sessions are emitted by the watermark, not by data."""
    from deepseek_ocr_api_rs_spark.operators.sessions import session_stats
    from deepseek_ocr_api_rs_spark.streaming.jobs import sessionize_stream

    got = sessionize_stream(
        spark, f"{SF}/events.parquet", str(tmp_path / "w"), n_slices=3
    )
    batch = session_stats(spark.read.parquet(f"{SF}/events.parquet"), 30)
    g = got.orderBy("user_id", "session_seq").collect()
    b = batch.orderBy("user_id", "session_seq").collect()
    assert len(g) == len(b) and len(g) > 0
    for rg, rb in zip(g, b):
        assert (rg.user_id, rg.session_seq) == (rb.user_id, rb.session_seq)
        assert rg.n_events == rb.n_events
        assert rg.span_seconds == rb.span_seconds
        assert rg.sum_value == float(rb.sum_value)


def test_sessionize_events_pure_step():
    from deepseek_ocr_api_rs_spark.streaming.jobs import _sessionize_events

    gap = 1800
    # one continuing session then a gap -> close with seq carried
    st, closed = _sessionize_events(None, [(0, 1, 100), (60, 2, 50)], gap)
    assert closed == [] and st == (0, 60, 2, 150, 1)
    st, closed = _sessionize_events(st, [(60 + 1801, 3, 25)], gap)
    assert closed == [(0, 60, 2, 150, 1)]
    assert st == (1861, 1861, 1, 25, 2)  # seq advanced to 2
    # boundary: exactly gap seconds is the SAME session (> gap closes)
    st2, closed2 = _sessionize_events(None, [(0, 1, 1), (1800, 2, 1)], gap)
    assert closed2 == [] and st2[2] == 2


def test_stream_left_outer_join_equals_batch(spark, tmp_path):
    """r7: the watermarked LEFT OUTER stream-stream join flushes every
    unmatched purchase as a NULL-click row (sentinel pair advances both
    watermarks) and the final table equals the batch left join."""
    from pyspark.sql import functions as F

    from deepseek_ocr_api_rs_spark.streaming.jobs import (
        click_purchase_stream_left_join,
    )

    events_path = "/root/testdata/sf0.001/events.parquet"
    out = click_purchase_stream_left_join(
        spark, events_path, str(tmp_path / "lj")
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_seconds)
        for r in out.collect()
    }
    ev = spark.read.parquet(events_path)
    p = ev.filter("event_type='purchase'").selectExpr(
        "user_id pu", "event_id pid", "ts pts"
    )
    c = ev.filter("event_type='click'").selectExpr(
        "user_id cu", "event_id cid", "ts cts"
    )
    batch = p.join(
        c,
        F.expr("cu = pu AND cts <= pts AND cts >= pts - INTERVAL 1 hour"),
        "left",
    ).select(
        "pu", "cid", "pid",
        (F.unix_timestamp("pts") - F.unix_timestamp("cts")).alias("gap"),
    )
    want = {(r.pu, r.cid, r.pid, r.gap) for r in batch.collect()}
    assert got == want
    # the outer semantics actually fire: some purchases have no click
    assert any(cid is None for _, cid, _, _ in got)
    # no sentinel leakage
    assert all(u >= 0 for u, _, _, _ in got)
