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
    max_iter: int = 25,
    checkpoint_every: int = 2,
    strict: bool = True,
    checkpoint_dir: str | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Dup-pair graph → (id, component) labels, component = min id reachable.

    Each round does (1) min-label propagation across edges, then (2)
    POINTER JUMPING — every node re-labels to its label's label
    (Shiloach–Vishkin-style path halving, the same doubling trick as
    large-star/small-star): propagation distance doubles per round, so a
    diameter-d component converges in O(log d) rounds, not O(d). A chain of
    10^6 near-dup docs needs ~20 rounds, not 10^6.

    Loop-state discipline: label frames are persisted and replaced each
    round, and ``localCheckpoint()`` every ``checkpoint_every`` rounds cuts
    the plan LINEAGE. Growth between cuts is EXPONENTIAL, not linear —
    each round's plan embeds the prior frame's plan ~5× (the propagation
    join, the pointer-jump self-reference, the change probe), so k
    uncut rounds cost ~5^k copies of the base plan in analyzer work;
    at the old default of 5 the analyzed plan still reached ~26 MB of
    tree string even with checkpointed inputs. The default of 2 bounds
    it at ~25× base (a localCheckpoint of the tiny label frame per two
    rounds is far cheaper than the analyzer walk it avoids). Note localCheckpoint is NOT fault-tolerant — blocks
    live on executors and cannot be recomputed after executor loss (lineage
    is truncated), so a lost executor fails the job; pass
    ``checkpoint_dir`` to use reliable ``checkpoint()`` instead — label
    blocks are materialized to that (shared/HDFS-visible) directory, so the
    iteration survives executor loss at the cost of a write per cut. On
    exhaustion without convergence the result would be silently WRONG, so
    ``strict=True`` raises; ``strict=False`` logs a warning and returns the
    partial labels.

    ``shuffle_partitions`` scopes every per-round shuffle (the min-label
    groupBy, the pointer-jump join, the change probe) to the PAIR-GRAPH
    cardinality instead of the session's corpus-sized default — the same
    lever as ``hits_fixed_point``/``bpe_learn``: a dup-pair graph is
    orders of magnitude smaller than the corpus that produced it, and
    eagerly-materialized loop frames bypass AQE coalescing, so without
    the scope each of the O(log d) rounds pays empty-partition task
    overhead at the corpus width (the 161 s q_canonical_docs pathology;
    VERDICT r7 #2). Size it to the pair count (e.g. 8–32 for ≤10^6
    pairs, corpus-default only when the graph itself is corpus-sized).
    """
    from deepseek_ocr_api_rs_spark.operators.partitioning import (
        scoped_shuffle_partitions,
    )

    if checkpoint_dir is not None:
        # ONCE, before the loop: setCheckpointDir stores a fully-qualified
        # <dir>/<uuid> path, so comparing getCheckpointDir() against the
        # raw argument can never match (a per-cut guard would re-set every
        # time and spray UUID subdirectories)
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # CHECKPOINT (not merely persist) the loop inputs at entry: persist
    # caches the DATA but the LOGICAL plan still carries the caller's
    # entire candidate-generation lineage (an LSH-banding pass over the
    # full corpus — ~10^5 plan-tree nodes), and each loop round embeds
    # the prior frame's plan ~5×, so by round 4 the ANALYZED plan reaches
    # hundreds of MB and the driver spends minutes copying/walking trees
    # (the real q_canonical_docs 161 s pathology — executor work was
    # never the bottleneck). A lineage CUT here makes the loop's base
    # plan one LogicalRDD node; growth then starts from ~1 KB and the
    # periodic in-loop cut keeps it bounded. This materializes under the
    # CALLER's conf — corpus-width shuffles for corpus-sized lineage —
    # before any scoped-width loop shuffles.
    edges = (
        edges.checkpoint(eager=True)
        if checkpoint_dir is not None
        else edges.localCheckpoint(eager=True)
    )
    # Initialize each label to min(id, min neighbor) instead of id: the
    # same one-aggregation cost as the old distinct-ids init (edges carry
    # both directions, so every node appears as src), but it pre-applies
    # what round 1's propagation would compute — star/clique-shaped dup
    # clusters (the LSH norm) then converge a full round earlier. Any
    # init that is a ≥-component upper bound reached by propagation
    # yields the identical fixpoint.
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("component"))
        .persist()
    )
    with scoped_shuffle_partitions(pairs.sparkSession, shuffle_partitions):
        return _cc_loop(
            edges, labels, max_iter, checkpoint_every, strict,
            checkpoint_dir,
        )


def _cc_loop(
    edges: DataFrame,
    labels: DataFrame,
    max_iter: int,
    checkpoint_every: int,
    strict: bool,
    checkpoint_dir: str | None,
) -> DataFrame:
    import logging

    converged = False
    mat = labels  # the materialized frame backing ``labels`` (unpersist target)
    for it in range(max_iter):
        # (1) candidate labels flowing across edges
        prop = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # the pre-round label rides along as ``old`` so the convergence
        # probe below is a FILTER on the materialized round frame instead
        # of a join back against the previous labels (one fewer shuffle
        # per round)
        propagated = (
            labels.select("id", F.col("component").alias("old"))
            .join(prop.select("id", F.col("component").alias("new")), "id", "left")
            .select(
                "id",
                "old",
                F.least(F.col("old"), F.coalesce(F.col("new"), F.col("old"))).alias(
                    "mid"
                ),
            )
        )
        # (2) pointer jumping: component ← label(component). Labels only
        # decrease, so the grandparent label is always ≤ the parent label.
        parents = propagated.select(
            F.col("id").alias("mid"), F.col("mid").alias("gp")
        )
        new_round = (
            propagated.join(parents, "mid", "left")
            .select(
                "id", "old", F.coalesce("gp", "mid").alias("component")
            )
        )
        if (it + 1) % checkpoint_every == 0:
            if checkpoint_dir is not None:
                new_round = new_round.checkpoint(eager=True)
            else:
                new_round = new_round.localCheckpoint(eager=True)
        else:
            new_round = new_round.persist()
        changed = (
            new_round.filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        mat.unpersist()
        mat = new_round
        labels = new_round.select("id", "component")
        if changed == 0:
            converged = True
            break
    # Do NOT unpersist edges here: it is a lineage-CUT frame
    # (localCheckpoint/checkpoint at entry), so its cached blocks are the
    # ONLY source of its data — releasing them while the returned labels
    # frame is still lazy would make any eviction-triggered recompute of
    # a downstream consumer fail (the classic localCheckpoint+unpersist
    # footgun). The blocks are reclaimed by the ContextCleaner when the
    # frame goes out of scope.
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter="
            f"{max_iter}; labels would be incorrect for long chains"
        )
        if strict:
            raise RuntimeError(msg)
        logging.getLogger(__name__).warning(msg)
    return labels.select("id", "component")
