"""Salted url-hash partitioning: hot hosts must spread across many
partitions while the exchange stays a single planned hash shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.partitioning import (
    repartition_by_url,
    salted_key,
    with_host,
)


def test_hot_host_spreads_over_partitions(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    parts = repartition_by_url(docs, 16, salt_buckets=16).withColumn(
        "pid", F.spark_partition_id()
    )
    hot = parts.filter(F.col("url").contains("bigportal.example.com"))
    n_pids = hot.select("pid").distinct().count()
    # ~30 hot-host rows in the 300-row corpus; unsalted they'd land in 1
    # partition — salted they must spread widely.
    assert n_pids >= 8, f"hot host only reached {n_pids} partitions"


def test_salt_preserves_all_rows(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    assert repartition_by_url(docs, 16).count() == docs.count()


def test_single_exchange_in_plan(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    plan = (
        repartition_by_url(docs, 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_skew_balance(spark, corpus_path):
    """Max partition size should be within ~4x of mean after salting (300
    rows over 16 partitions is noisy; at scale the bound tightens)."""
    docs = spark.read.parquet(corpus_path)
    sizes = (
        repartition_by_url(docs, 16, salt_buckets=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 4 * (sum(counts) / len(counts))
