"""Redirect-chain resolution (r7): pointer-doubling resolver semantics —
exact hop counts, external exits, cycles, rho shapes, the hop cap."""

from __future__ import annotations

import pyspark.sql.functions as F

from deepseek_ocr_api_rs_spark.operators.redirects import resolve_redirects

SCHEMA = "url string, status int, location string"


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = resolve_redirects(df, **kw).collect()
    return {r.url: (r.final_url, r.final_status, r.hops, r.disposition)
            for r in got}


def test_linear_chain_exact_hops(spark):
    rows = [
        ("a", 301, "b"), ("b", 302, "c"), ("c", 308, "d"), ("d", 200, None),
    ]
    out = _resolve(spark, rows)
    assert out["a"] == ("d", 200, 3, "ok")
    assert out["b"] == ("d", 200, 2, "ok")
    assert out["c"] == ("d", 200, 1, "ok")
    assert out["d"] == ("d", 200, 0, "ok")


def test_terminal_keeps_own_status(spark):
    out = _resolve(spark, [("x", 404, None)])
    assert out["x"] == ("x", 404, 0, "ok")


def test_external_exit_counts_the_exit_hop(spark):
    rows = [("a", 301, "b"), ("b", 302, "https://off.example.net/")]
    out = _resolve(spark, rows)
    assert out["a"] == ("https://off.example.net/", None, 2, "external")
    assert out["b"] == ("https://off.example.net/", None, 1, "external")


def test_two_cycle_and_self_loop_unresolved(spark):
    rows = [("a", 301, "b"), ("b", 301, "a"), ("s", 301, "s")]
    out = _resolve(spark, rows)
    assert out["a"][3] == "unresolved" and out["a"][0] is None
    assert out["b"][3] == "unresolved"
    assert out["s"][3] == "unresolved"
    # unresolved reports exactly the cap
    assert out["a"][2] == 16


def test_tail_into_cycle_unresolved(spark):
    rows = [("t", 301, "a"), ("a", 301, "b"), ("b", 301, "a")]
    out = _resolve(spark, rows)
    assert out["t"][3] == "unresolved"


def test_chain_longer_than_cap_unresolved_but_tail_resolves(spark):
    n = 20  # u0 -> u1 -> ... -> u20(terminal): 20 hops > 16 cap
    rows = [(f"u{i}", 301, f"u{i+1}") for i in range(n)] + [
        (f"u{n}", 200, None)
    ]
    out = _resolve(spark, rows)
    assert out["u0"][3] == "unresolved"
    # within-cap suffix resolves with exact hop counts
    assert out["u5"] == (f"u{n}", 200, 15, "ok")
    assert out[f"u{n}"] == (f"u{n}", 200, 0, "ok")


def test_chain_of_exactly_cap_resolves(spark):
    n = 16
    rows = [(f"u{i}", 301, f"u{i+1}") for i in range(n)] + [
        (f"u{n}", 200, None)
    ]
    out = _resolve(spark, rows)
    assert out["u0"] == (f"u{n}", 200, 16, "ok")


def test_rounds_are_logarithmic_not_linear(spark):
    """A 16-hop cap costs 4 jump rounds; assert the plan's join count is
    bounded (each round adds a fixed number of joins — a linear walk
    would add one per hop)."""
    from deepseek_ocr_api_rs_spark.plans.explain import physical_plan

    rows = [("a", 301, "b"), ("b", 200, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = physical_plan(resolve_redirects(df))
    # every jump round was materialized into cache, so the plan the
    # final action executes is ONE classification join over an
    # InMemoryTableScan — everything below the cache boundary is
    # explain's recursive print of already-computed history
    top = plan.split("InMemoryRelation", 1)[0]
    assert top.count("Join") <= 2, top
    assert "InMemoryTableScan" in plan
