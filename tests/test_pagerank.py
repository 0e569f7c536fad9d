"""Integer fixed-point PageRank (operators/pagerank.py, r7): exact
integer recurrence, bit-identical across engines and partitionings."""

from __future__ import annotations

import duckdb

from deepseek_ocr_api_rs_spark.operators.pagerank import (
    FP_ONE,
    TELEPORT_FP,
    pagerank_fixed_point,
    pagerank_oracle_sql,
)

EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 1), (3, 0),
    (0, 2), (4, 4), (1, 0), (5, 2), (3, 2),
]


def _duck(edges, n_iter):
    cte = (
        "select * from (values "
        + ",".join(f"({s},{d})" for s, d in edges)
        + ") as t(src,dst)"
    )
    return dict(
        duckdb.connect().execute(pagerank_oracle_sql(cte, n_iter)).fetchall()
    )


def test_matches_oracle_and_partition_invariant(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank_fixed_point(e, 10).collect()}
    assert got == _duck(EDGES, 10)
    got2 = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(e.repartition(7), 10).collect()
    }
    assert got2 == got  # integer sums are associative


def test_hand_computed_single_iteration(spark):
    """0 -> 1, 0 -> 2, 1 -> 2: after one iteration from all-1.0,
    rank(0) = teleport only; rank(1) = teleport + 0.85 * (1/2);
    rank(2) = teleport + 0.85 * (1/2 + 1/1) — all in exact integers."""
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    got = {r.node: r.rank_fp for r in pagerank_fixed_point(e, 1).collect()}
    half = FP_ONE // 2
    assert got[0] == TELEPORT_FP
    assert got[1] == TELEPORT_FP + (17 * half) // 20
    assert got[2] == TELEPORT_FP + (17 * (half + FP_ONE)) // 20


def test_dangling_and_sink_semantics(spark):
    """A node with no out-links contributes nothing (documented
    drop-dangling-mass variant) but still receives the teleport term;
    a node with no in-links converges to exactly the teleport rank."""
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank_fixed_point(e, 10).collect()}
    assert got[0] == TELEPORT_FP  # no in-links after iteration 1
    assert set(got) == {0, 1, 2}
    assert got == _duck([(0, 1), (1, 2)], 10)


def test_multigraph_duplicate_edges_count_twice(spark):
    """A duplicated edge raises the out-degree AND delivers two
    contributions — the multigraph convention, mirrored by the oracle.
    With an odd rank the two floored halves lose one unit vs a single
    full-rank edge, so the convention is observable."""
    doubled = [(0, 1), (0, 1), (1, 0)]
    e = spark.createDataFrame(doubled, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank_fixed_point(e, 5).collect()}
    assert got == _duck(doubled, 5)


def test_total_rank_bounded(spark):
    """With dangling mass dropped, total rank never exceeds
    n * FP_ONE after any iteration (mass only leaks, never appears)."""
    e = spark.createDataFrame(EDGES, "src long, dst long")
    for it in (1, 3, 10):
        total = sum(
            r.rank_fp for r in pagerank_fixed_point(e, it).collect()
        )
        assert total <= 6 * FP_ONE


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    """``checkpoint_dir`` switches the periodic lineage cut to
    fault-tolerant ``checkpoint()``: ranks identical to the default
    path, and checkpoint blocks actually land under the given directory
    (proof the cut went through the reliable path)."""
    import os

    e = spark.createDataFrame(EDGES, "src long, dst long")
    ckpt = str(tmp_path / "pr_ckpt")
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(
            e, 10, checkpoint_every=2, checkpoint_dir=ckpt
        ).collect()
    }
    base = {r.node: r.rank_fp for r in pagerank_fixed_point(e, 10).collect()}
    assert got == base
    files = [os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs]
    assert files, "checkpoint() should have written blocks under checkpoint_dir"
