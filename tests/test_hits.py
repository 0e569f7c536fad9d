"""HITS fixed point (operators/hits.py): hand-computed small-graph
iterations, dangling-node zeros, and multigraph edge weighting.
Cross-engine value-exactness of q_hits is covered by
test_queries_oracle.py."""

from __future__ import annotations

from deepseek_ocr_api_rs_spark.operators.hits import (
    FP_ONE,
    hits_fixed_point,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _run(spark, pairs, n_iter):
    rows = hits_fixed_point(_edges(spark, pairs), n_iter=n_iter).collect()
    return {r.node: (r.auth_fp, r.hub_fp) for r in rows}


def test_hand_computed_two_iterations(spark):
    """a->b, a->c, b->c.  Iteration 1: auth_raw b=1e6, c=2e6 → auth
    (0, 500000, 1e6); hub_raw a=1.5e6, b=1e6 → hub (1e6, 666666, 0).
    Iteration 2: auth_raw b=1e6, c=1666666 → auth (0, 600000, 1e6);
    hub_raw a=1600000, b=1e6 → hub (1e6, 625000, 0)."""
    a, b, c = 1, 2, 3
    got = _run(spark, [(a, b), (a, c), (b, c)], n_iter=2)
    assert got == {
        a: (0, FP_ONE),
        b: (600000, 625000),
        c: (FP_ONE, 0),
    }


def test_max_node_pinned_at_one(spark):
    """The best authority and best hub are exactly FP_ONE every
    iteration (max-normalization invariant)."""
    got = _run(spark, [(1, 2), (1, 3), (4, 3), (3, 2)], n_iter=5)
    assert max(v[0] for v in got.values()) == FP_ONE
    assert max(v[1] for v in got.values()) == FP_ONE


def test_duplicate_edges_count_twice(spark):
    """Multigraph convention: (1,2)x2 beats (3,4)x1, so node 2 is the
    max authority and node 4 scores half of it."""
    got = _run(spark, [(1, 2), (1, 2), (3, 4)], n_iter=1)
    assert got[2][0] == FP_ONE
    assert got[4][0] == FP_ONE // 2


def test_dangling_nodes_zero(spark):
    """No in-edges → auth 0; no out-edges → hub 0."""
    got = _run(spark, [(1, 2)], n_iter=3)
    assert got[1][0] == 0 and got[2][1] == 0
    assert got[1][1] == FP_ONE and got[2][0] == FP_ONE


def test_hits_reliable_checkpoint_dir(spark, tmp_path):
    """``checkpoint_dir`` switches the per-iteration lineage cut to
    fault-tolerant ``checkpoint()``: scores identical to the default
    path, and checkpoint blocks actually land under the given directory
    (proof the cut went through the reliable path)."""
    import os

    from deepseek_ocr_api_rs_spark.operators.hits import hits_fixed_point

    edges = [(1, 2), (1, 3), (4, 3), (3, 2), (2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ckpt = str(tmp_path / "hits_ckpt")
    got = {
        r.node: (r.auth_fp, r.hub_fp)
        for r in hits_fixed_point(e, 4, checkpoint_dir=ckpt).collect()
    }
    base = {
        r.node: (r.auth_fp, r.hub_fp)
        for r in hits_fixed_point(e, 4).collect()
    }
    assert got == base
    files = [os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs]
    assert files, "checkpoint() should have written blocks under checkpoint_dir"
