"""Integer fixed-point HITS (hubs & authorities) over a link graph (r7).

The second classic link-analysis pass next to PageRank
(operators/pagerank.py): Kleinberg's HITS (JACM 1999, public) restated
with the same exactness discipline — scores held in BIGINT MICRO-UNITS
(1.0 == 1_000_000) and every step pure integer arithmetic:

    auth_raw(v) = sum over edges u->v of hub(u)
    auth(v)     = auth_raw(v) * 1_000_000 DIV max_w(auth_raw(w))
    hub_raw(u)  = sum over edges u->v of auth(v)
    hub(u)      = hub_raw(u) * 1_000_000 DIV max_w(hub_raw(w))

Normalization by the MAX (not the float L2 norm) keeps the recurrence
closed over integers: integer sums are associative, so the result is
BIT-IDENTICAL across engines, partitionings, and parallelism — the
property that lets the DuckDB oracle replay the identical recurrence as
programmatically chained CTEs and the driver hash-compare values.
The top-scoring node's score is exactly FP_ONE each iteration, so
scores are directly comparable across iterations and graphs.

Magnitude bound (documented, not checked per-row): auth_raw ≤
max_in_degree * FP_ONE and the scaling multiply stays < 2^63 while
max degree < ~9.2e6 — far above any per-host link graph this engine
builds (ANSI mode would THROW on overflow rather than corrupt, the
fail-safe default).

Scale shape: two shuffles per iteration (the groupBy(dst) and
groupBy(src) sums); the max is a broadcast-sized 1-row crossJoin (no
driver action). Unlike PageRank, each half-iteration's sum table
feeds TWO consumers (join + normalizer), so it is persisted and the
joined result eagerly checkpointed — the lazy plan stays one level
deep no matter how many iterations run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.partitioning import (
    scoped_shuffle_partitions as _scoped_shuffle_partitions,
)

FP_ONE = 1_000_000


def hits_fixed_point(
    edges: DataFrame,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src, dst) edge frame → (node, auth_fp, hub_fp) in BIGINT
    micro-units after ``n_iter`` exact integer iterations. Duplicate
    edges count twice (multigraph convention, mirrored by the oracle);
    nodes with no in-edges get auth 0, no out-edges hub 0.

    Precondition: at least one edge (the max-normalizer is then ≥ 1;
    an empty graph would divide by zero on both engines alike).

    ``checkpoint_dir`` switches the per-iteration lineage cut from
    ``localCheckpoint`` (executor-local blocks — executor loss kills the
    job, lineage is already truncated) to fault-tolerant ``checkpoint()``
    into that (shared/HDFS-visible) directory — same contract as
    ``connected_components(checkpoint_dir=…)``: on a 1000-node cluster a
    lost executor mid-iteration recovers from the checkpointed blocks at
    the cost of one distributed write per iteration.
    """
    if checkpoint_dir is not None:
        # ONCE, up front: setCheckpointDir stores <dir>/<uuid>, so a
        # per-iteration equality guard could never match (see
        # connected_components)
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    # Lineage-cut the edge table BEFORE entering the shuffle scope (the
    # connected_components lesson): persist caches data but the caller's
    # link-extraction lineage stays in the LOGICAL plan and every
    # iteration's analysis re-walks it — the checkpoint makes each
    # iteration's plan O(iteration), independent of how edges were
    # derived, and the eager materialization runs the corpus-sized
    # lineage under the CALLER's (corpus-width) conf.
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    e = (
        e.checkpoint(eager=True)
        if checkpoint_dir is not None
        else e.localCheckpoint(eager=True)
    )
    with _scoped_shuffle_partitions(
        edges.sparkSession, shuffle_partitions
    ):
        return _hits_loop(e, n_iter, checkpoint_dir)


def _hits_loop(
    e: DataFrame,
    n_iter: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    from deepseek_ocr_api_rs_spark.operators.dedup import _persist

    # NOTE (r9): the redirects/BPE "stay lazy, one terminal action" trick
    # does NOT transfer here — each HITS iteration embeds TWO broadcast
    # max-normalizers, and a lazy 8-iteration chain nests 16 broadcast
    # builds inside one action (each build recomputing the chain below
    # it on the broadcast-exchange thread pool): observed as a hang, the
    # classic nested-broadcast deadlock. The per-iteration eager cut
    # stays; ``nodes`` is now registered for end-of-action release
    # (previously a persist leak).
    nodes = _persist(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    scores = nodes.select(
        "node",
        F.lit(FP_ONE).cast("long").alias("auth_fp"),
        F.lit(FP_ONE).cast("long").alias("hub_fp"),
    )
    for i in range(n_iter):
        # each *_raw frame feeds TWO consumers (the left join and the
        # max-normalizer) — persist it so the half-iteration computes
        # once, and eagerly checkpoint the joined result so the lazy
        # plan never stacks across iterations (iterative-loop
        # discipline: materialize BEFORE unpersisting the producer).
        auth_raw = (
            e.join(
                scores.select(F.col("node").alias("src"), "hub_fp"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_fp").alias("raw"))
            .persist()
        )
        auth = (
            nodes.join(auth_raw, "node", "left")
            .crossJoin(
                F.broadcast(auth_raw.agg(F.max("raw").alias("m")))
            )
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0L) * {FP_ONE} DIV m"
                ).alias("auth_fp"),
            )
            .persist()
        )
        hub_raw = (
            e.join(auth.select(F.col("node").alias("dst"), "auth_fp"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_fp").alias("raw"))
            .persist()
        )
        # ONE eager materialization per iteration: the scores checkpoint
        # computes through the persisted auth/hub_raw (each hit by two
        # consumers, cached on first touch), after which all three
        # intermediates can be released — half the job count of
        # checkpointing every half-iteration at the same plan depth.
        scores = (
            auth.join(hub_raw, "node", "left")
            .crossJoin(
                F.broadcast(hub_raw.agg(F.max("raw").alias("m")))
            )
            .select(
                "node",
                "auth_fp",
                F.expr(
                    f"coalesce(raw, 0L) * {FP_ONE} DIV m"
                ).alias("hub_fp"),
            )
        )
        scores = (
            scores.checkpoint(eager=True)
            if checkpoint_dir is not None
            else scores.localCheckpoint(eager=True)
        )
        auth_raw.unpersist()
        hub_raw.unpersist()
        auth.unpersist()
    return scores


def hits_oracle_sql(edges_cte: str, n_iter: int = 8) -> str:
    """The identical recurrence as chained DuckDB CTEs. ``edges_cte``
    selects (src, dst).

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines CTEs by default,
    and unlike the PageRank chain (each CTE referenced ONCE — linear),
    HITS references each half-iteration twice (the left join and the
    max-normalizer scalar subquery), so inlining expands ~8× per
    iteration — 8^n copies of the edge scan and an EMFILE blow-up at
    n_iter 8. Materialization makes the oracle linear, matching the
    Spark side's persist/checkpoint structure."""
    parts = [
        f"with e as materialized ({edges_cte})",
        "nodes as materialized (select distinct node from "
        "(select src as node from e union select dst from e))",
        f"s0 as materialized (select node, "
        f"cast({FP_ONE} as bigint) as auth_fp, "
        f"cast({FP_ONE} as bigint) as hub_fp from nodes)",
    ]
    for i in range(n_iter):
        p, n = i, i + 1
        parts.append(
            f"ar{n} as materialized (select e.dst as node, "
            f"cast(sum(s{p}.hub_fp) as bigint) as raw "
            f"from e join s{p} on e.src = s{p}.node group by e.dst)"
        )
        parts.append(
            f"a{n} as materialized (select nodes.node, "
            f"cast(coalesce(ar{n}.raw, 0) "
            f"* {FP_ONE} // (select max(raw) from ar{n}) as bigint) "
            f"as auth_fp from nodes left join ar{n} "
            f"on nodes.node = ar{n}.node)"
        )
        parts.append(
            f"hr{n} as materialized (select e.src as node, "
            f"cast(sum(a{n}.auth_fp) as bigint) as raw "
            f"from e join a{n} on e.dst = a{n}.node group by e.src)"
        )
        parts.append(
            f"s{n} as materialized (select a{n}.node, a{n}.auth_fp, "
            f"cast(coalesce(hr{n}.raw, 0) * {FP_ONE} "
            f"// (select max(raw) from hr{n}) as bigint) as hub_fp "
            f"from a{n} left join hr{n} on a{n}.node = hr{n}.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nselect node, auth_fp, hub_fp from s{n_iter} order by node"
    )
