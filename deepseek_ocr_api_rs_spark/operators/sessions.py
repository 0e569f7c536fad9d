"""Sessionization + duplicate-cluster resolution.

Sessionize: the classic event-stream window operator (gap-based session
ids) — lag + cumulative new-session flags, all built-ins, exact integer/
timestamp arithmetic (oracle-checkable).

Connected components: resolve near-dup candidate PAIRS into canonical dup
CLUSTERS (the step after MinHash-LSH in a real dedup pipeline) by iterative
smallest-label propagation — the representative iterative Spark algorithm
(not SQL-expressible; driver records the weaker rows-only check, pytest
verifies against a scalar union-find).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign gap-based session ids per user.

    session boundary = event more than `gap_minutes` after the previous
    event of the same user; session_seq = running count of boundaries.
    One window spec reused for both steps → ONE shuffle on user_id.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc("event_id"))
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("is_new_session", new_session)
        .withColumn("session_seq", F.sum("is_new_session").over(w))
        .drop("is_new_session")
    )


def session_stats(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-session rollup: events, span seconds, total value."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("span_seconds"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Dup-pair graph → (id, component) labels, component = min id reachable.

    Iterative label propagation (large-star/small-star simplified): each
    round joins labels across edges and keeps the min; stops when no label
    changes. Converges in O(log n) rounds on typical dup clusters (which
    are small and dense). Each round is one shuffle on id; intermediate
    label frames are persisted and replaced (the loop-state discipline of
    iterative Spark algorithms).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    for _ in range(max_iter):
        # candidate labels flowing across edges
        prop = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        new_labels = (
            labels.select("id", F.col("component").alias("old"))
            .join(prop.select("id", F.col("component").alias("new")), "id", "left")
            .select(
                "id",
                F.least(F.col("old"), F.coalesce(F.col("new"), F.col("old"))).alias(
                    "component"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", "component")
