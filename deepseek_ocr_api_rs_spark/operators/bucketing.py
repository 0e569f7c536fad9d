"""Bucketed tables for shuffle-free co-located joins.

At 10^12 rows the fact-to-fact join (e.g. lineitem⋈orders, or extracted
docs ⋈ dedup verdicts) dominates shuffle volume. Writing both sides
bucketed by the join key (``bucketBy`` — Spark's hash-bucketed table
layout) makes the join a per-bucket zip: NO exchange on either side, ever
again, for any query joining on that key. This is the "repartition() /
bucketing for co-located joins" half of the engine's partitioning story
(the salted-repartition half lives in operators/partitioning.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table. Sorting within
    buckets upgrades the join to a merge without a sort step. ``path``
    makes it an external table (bucketing metadata still applies)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planned with zero
    Exchange operators (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key)
