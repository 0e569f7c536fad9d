"""Trained quality-classifier (distributed CART) operator tests (r8)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_quality_tree_matches_duckdb_recurrence(spark, docs):
    """Training is bit-identical cross-engine: the Spark tree (features,
    split arg-max, routing, leaf votes) equals the DuckDB SQL replay of
    the same integer recurrence, row for row."""
    from deepseek_ocr_api_rs_spark.operators.classifier import (
        quality_tree_dispositions,
        quality_tree_sql,
    )

    got = quality_tree_dispositions(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    exp = con.sql(quality_tree_sql()).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    x = exp.sort_values("doc_id").reset_index(drop=True).astype(
        g.dtypes.to_dict()
    )
    assert g.equals(x)


def test_quality_tree_learns_above_base_rate(spark, docs):
    """The tree must beat majority-class guessing by a clear margin —
    proof it rediscovers the stopword-ratio rule from hashed buckets
    (hash collisions cap accuracy below 1.0; the margin is the honest
    signal that training, not memorization, happened)."""
    from deepseek_ocr_api_rs_spark.operators.classifier import (
        quality_tree_dispositions,
    )

    out = quality_tree_dispositions(docs).toPandas()
    base_rate = max(out.label.mean(), 1 - out.label.mean())
    acc = (out.label == out.pred).mean()
    assert acc >= base_rate + 0.10, (acc, base_rate)
    # depth-2 structure: at most 4 leaves, each a root-to-leaf L/R path
    leaves = set(out.leaf.unique())
    assert leaves <= {"rootLL", "rootLR", "rootRL", "rootRR", "rootL", "rootR", "root"}
    assert len(leaves) >= 2


def test_quality_tree_deterministic_and_no_cartesian(spark, docs):
    """Rerun-stable (pure integer training, no RNG) and the plan holds
    the scale contract: no cartesian/nested-loop join anywhere — node
    state and winning splits ride as broadcasts."""
    from deepseek_ocr_api_rs_spark.operators.classifier import (
        quality_tree_dispositions,
    )
    from deepseek_ocr_api_rs_spark.plans.explain import physical_plan

    df1 = quality_tree_dispositions(docs)
    r1 = df1.collect()
    r2 = quality_tree_dispositions(docs).collect()
    assert r1 == r2
    plan = physical_plan(df1)
    assert "CartesianProduct" not in plan
