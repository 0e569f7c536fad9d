"""Per-partition checkpoint manifests + resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Design (the KV-cache idea at job granularity — incremental computation,
crates/core/src/cache.rs:78-116, applied to partitions instead of tokens):

- the input is bucketed into ``n_buckets`` deterministic url-hash buckets
  (``pmod(xxhash64(url), n_buckets)`` — stable across runs, unlike
  ``spark_partition_id`` which depends on scheduling);
- each completed bucket appends one manifest row
  ``(bucket, run_id, n_docs, n_chars, n_accepted, committed_ts)`` to the
  ``_checkpoints`` table (on Iceberg this is an atomic append per commit);
- resume = anti-join the input's buckets against committed manifest rows,
  so a killed run re-reads only uncommitted buckets.

Output data for a bucket is written under ``bucket=<k>`` directories and the
manifest row is appended AFTER the data write succeeds — a bucket is either
fully committed (manifest row exists) or will be re-done; re-doing an
uncommitted bucket just overwrites its directory (idempotent).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "bucket int, run_id string, n_docs long, n_chars long, "
    "n_blocks_accepted long, committed_ts double"
)


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")
    )


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "_checkpoints")


def committed_buckets(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    path = manifest_path(checkpoint_dir)
    try:
        rows = spark.read.parquet(path).select("bucket").distinct().collect()
    except Exception:
        return set()
    return {r.bucket for r in rows}


def commit_bucket(
    spark: SparkSession,
    checkpoint_dir: str,
    bucket: int,
    run_id: str,
    n_docs: int,
    n_chars: int,
    n_blocks_accepted: int,
) -> None:
    row = [(bucket, run_id, n_docs, n_chars, n_blocks_accepted, time.time())]
    spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(manifest_path(checkpoint_dir))


def resume_filter(
    docs_bucketed: DataFrame, spark: SparkSession, checkpoint_dir: str
) -> DataFrame:
    """Drop rows of already-committed buckets.

    Implemented as an IN-filter on the (small) committed-bucket set rather
    than a join — the bucket list is tiny metadata, so this prunes with a
    pushed-down predicate instead of a shuffle.
    """
    done = committed_buckets(spark, checkpoint_dir)
    if not done:
        return docs_bucketed
    return docs_bucketed.filter(~F.col("bucket").isin(sorted(done)))


def run_resumable_extraction(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
    run_id: str = "run",
    fail_after_buckets: int | None = None,
) -> int:
    """Extract bucket by bucket with manifest commits; returns #buckets done
    this run. ``fail_after_buckets`` injects a mid-run kill for tests.

    At cluster scale each "bucket" is a large slice (thousands of tasks);
    one spark action per bucket is the commit granularity, matching how a
    real run would chain Iceberg append commits.
    """
    from deepseek_ocr_api_rs_spark.operators.extract import extract_documents

    bucketed = with_bucket(docs, n_buckets)
    todo = resume_filter(bucketed, spark, checkpoint_dir)
    remaining = sorted(
        r.bucket for r in todo.select("bucket").distinct().collect()
    )
    done = 0
    for bucket in remaining:
        part = todo.filter(F.col("bucket") == bucket).drop("bucket")
        extracted = extract_documents(part)
        out_path = os.path.join(output_dir, f"bucket={bucket}")
        extracted.write.mode("overwrite").parquet(out_path)
        stats = (
            spark.read.parquet(out_path)
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"),
                F.coalesce(F.sum("n_blocks_accepted"), F.lit(0)).alias("a"),
            )
            .collect()[0]
        )
        commit_bucket(
            spark, checkpoint_dir, bucket, run_id,
            int(stats.n), int(stats.c), int(stats.a),
        )
        done += 1
        if fail_after_buckets is not None and done >= fail_after_buckets:
            break
    return done
