"""Integer fixed-point PageRank over a link graph (r7).

The crawl-side ranking pass next to the link-graph extraction: classic
PageRank (Page et al. 1999, public) with ranks held in BIGINT
MICRO-UNITS (1.0 == 1_000_000) and every per-iteration step pure
integer arithmetic —

    contrib(edge u->v)   = rank(u) DIV out_degree(u)
    rank'(v)             = 150_000 + (17 * incoming_sum(v)) DIV 20

(0.15 / 0.85 damping as the exact rationals 3/20 and 17/20). Integer
sums are associative, so the result is BIT-IDENTICAL regardless of
partitioning, parallelism, or engine — unlike a float PageRank, whose
shuffle-order reassociation breaks exact cross-engine comparison. The
DuckDB oracle is the same recurrence as programmatically chained CTEs.

Variant notes (documented, mirrored by the oracle): dangling nodes
(no out-links) keep receiving the teleport term but their mass is NOT
redistributed (the "drop dangling mass" simplification); DIV floors
toward zero, which on non-negative ranks equals floor division in both
engines.

Scale shape: one shuffle per iteration (the groupBy(dst) sum) plus one
broadcast-sized join against the degree table; lineage is cut with
localCheckpoint every few iterations exactly like the
connected-components operator, so 10 iterations do not stack a
10-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_ONE = 1_000_000  # 1.0 rank in micro-units
TELEPORT_FP = 150_000  # 0.15
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src, dst) edge frame → (node, rank_fp) with ranks in BIGINT
    micro-units after ``n_iter`` exact integer iterations. Duplicate
    edges count twice (the multigraph convention — the oracle mirrors
    it); self-loops are legal.

    ``checkpoint_dir`` switches the periodic lineage cut from
    ``localCheckpoint`` (executor-local blocks; executor loss kills the
    job) to fault-tolerant ``checkpoint()`` into that (shared/
    HDFS-visible) directory — same contract as
    ``connected_components(checkpoint_dir=…)``: a 10-iteration job on a
    1000-node cluster survives executor loss at the cost of one
    distributed write per ``checkpoint_every`` iterations."""
    if checkpoint_dir is not None:
        # ONCE, up front: setCheckpointDir stores <dir>/<uuid>, so a
        # per-cut equality guard could never match (see
        # connected_components)
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    # Lineage-cut the edge table at entry (the connected_components
    # lesson): persist caches data but the caller's link-extraction
    # lineage stays in the LOGICAL plan and each iteration's analysis
    # re-walks it — the checkpoint makes per-iteration plans
    # O(iteration), independent of how edges were derived.
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    e = (
        e.checkpoint(eager=True)
        if checkpoint_dir is not None
        else e.localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    degrees = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    ranks = nodes.withColumn("rank_fp", F.lit(FP_ONE).cast("long"))
    try:
        for i in range(n_iter):
            contribs = (
                e.join(ranks, e.src == ranks.node)
                .join(degrees, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank_fp DIV deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("in_sum"))
            )
            ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(TELEPORT_FP)
                        + F.expr(
                            f"({DAMP_NUM} * coalesce(in_sum, 0L)) "
                            f"DIV {DAMP_DEN}"
                        )
                    ).cast("long").alias("rank_fp"),
                )
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
                ranks = (
                    ranks.checkpoint(eager=True)
                    if checkpoint_dir is not None
                    else ranks.localCheckpoint(eager=True)
                )
        return ranks
    finally:
        pass  # persisted inputs are released by the caller's session GC


def pagerank_oracle_sql(
    edges_cte: str, n_iter: int = 10
) -> str:
    """The identical recurrence as chained DuckDB CTEs. ``edges_cte`` is
    a SQL body selecting (src, dst)."""
    parts = [
        f"with e as ({edges_cte})",
        "nodes as (select distinct node from "
        "(select src as node from e union select dst from e))",
        "deg as (select src, count(*) as deg from e group by src)",
        f"r0 as (select node, cast({FP_ONE} as bigint) as rank_fp "
        "from nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"c{i + 1} as (select e.dst as node, "
            f"sum(r{i}.rank_fp // deg.deg) as in_sum "
            f"from e join r{i} on e.src = r{i}.node "
            "join deg on e.src = deg.src group by e.dst)"
        )
        parts.append(
            f"r{i + 1} as (select nodes.node, "
            f"cast({TELEPORT_FP} + ({DAMP_NUM} * coalesce(c{i + 1}.in_sum, 0)) "
            f"// {DAMP_DEN} as bigint) as rank_fp "
            f"from nodes left join c{i + 1} on nodes.node = c{i + 1}.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nselect node, rank_fp from r{n_iter} order by node"
    )
