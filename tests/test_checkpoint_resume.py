"""Resume semantics: a killed run continues from the last committed bucket
and the final output equals a clean one-shot run (north_rule: 'resumable
from checkpoint with per-partition lineage + metrics')."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.checkpoint import (
    committed_buckets,
    run_resumable_extraction,
    with_bucket,
)


def test_resume_after_kill(spark, corpus_path, tmp_path):
    docs = spark.read.parquet(corpus_path)
    out1 = str(tmp_path / "out_resumed")
    ckpt = str(tmp_path / "ckpt")

    # run 1: killed after 3 buckets
    done1 = run_resumable_extraction(
        spark, docs, out1, ckpt, n_buckets=8, run_id="r1", fail_after_buckets=3
    )
    assert done1 == 3
    assert len(committed_buckets(spark, ckpt)) == 3

    # run 2: resumes — must process exactly the remaining 5
    done2 = run_resumable_extraction(spark, docs, out1, ckpt, n_buckets=8, run_id="r2")
    assert done2 == 5
    assert len(committed_buckets(spark, ckpt)) == 8

    # resumed output == one-shot output, row for row
    out2 = str(tmp_path / "out_oneshot")
    run_resumable_extraction(
        spark, docs, out2, str(tmp_path / "ckpt2"), n_buckets=8, run_id="clean"
    )
    a = spark.read.parquet(out1).select("url", "extracted_text")
    b = spark.read.parquet(out2).select("url", "extracted_text")
    assert a.count() == b.count() == docs.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    # lineage: manifest rows carry per-bucket metrics that reconcile with data
    manifest = spark.read.parquet(f"{ckpt}/_checkpoints")
    total_docs = manifest.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == docs.count()
    runs = {r.run_id for r in manifest.select("run_id").distinct().collect()}
    assert runs == {"r1", "r2"}


def test_rerun_noop_when_complete(spark, corpus_path, tmp_path):
    docs = spark.read.parquet(corpus_path).limit(50)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    assert run_resumable_extraction(spark, docs, out, ckpt, n_buckets=4) == 4
    assert run_resumable_extraction(spark, docs, out, ckpt, n_buckets=4) == 0


def test_bucket_assignment_stable(spark, corpus_path):
    """Bucket = pmod(xxhash64(url), n) must be scheduling-independent."""
    docs = spark.read.parquet(corpus_path)
    a = with_bucket(docs, 8).select("url", "bucket")
    b = with_bucket(docs.repartition(13), 8).select("url", "bucket")
    assert a.exceptAll(b).count() == 0
