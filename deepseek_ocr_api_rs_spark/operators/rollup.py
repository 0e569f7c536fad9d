"""Hypertable-style continuous aggregate: an hourly rollup table partitioned
by date, refreshed INCREMENTALLY — only date partitions whose inputs changed
are recomputed (TimescaleDB continuous-aggregate / materialized-view-refresh
pattern, restated on parquet partitions + dynamic partition overwrite).

Scale shape: the refresh never rescans history. Changed dates are found by
comparing per-date input row counts against the previous manifest (one
pruned aggregate over the scan), the recompute filters the input to those
dates (partition/predicate pushdown does the skipping), and
``partitionOverwriteMode=dynamic`` swaps ONLY the affected date directories
atomically-per-partition — the Iceberg-snapshot-append analogue available on
plain parquet. Same job-granularity resume idea as operators.checkpoint
(reference KV-cache incrementality, crates/core/src/cache.rs:78-116).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hourly_rollup(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.to_date("ts").alias("date"),
            F.date_trunc("hour", "ts").alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def refresh_hourly_rollup(
    spark: SparkSession, events: DataFrame, out_dir: str
) -> dict:
    """Refresh the rollup at ``out_dir`` from the current ``events`` table.

    Returns {"refreshed_dates": [...], "skipped_dates": n} — the caller (and
    tests) can verify no-change dates were not recomputed. Never silent: the
    returned accounting IS the log.
    """
    manifest_path = os.path.join(out_dir, "_rollup_manifest.json")
    prev: dict[str, int] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)

    per_date = {
        str(r.date): r.n
        for r in events.groupBy(F.to_date("ts").alias("date"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    changed = sorted(d for d, n in per_date.items() if prev.get(d) != n)
    if changed:
        subset = events.filter(F.to_date("ts").isin(changed))
        writer = (
            _hourly_rollup(subset)
            .repartition("date")
            .write.mode("overwrite")
            .partitionBy("date")
            .option("partitionOverwriteMode", "dynamic")
        )
        writer.parquet(os.path.join(out_dir, "rollup"))
        with open(manifest_path, "w") as f:
            json.dump(per_date, f)
    return {
        "refreshed_dates": changed,
        "skipped_dates": len(per_date) - len(changed),
    }


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "rollup"))
