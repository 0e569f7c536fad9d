"""Max-min fair crawl-budget allocation (r7): waterfilling semantics
against a brute-force reference, edge cases, budget conservation."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_api_rs_spark.operators.robots import allocate_crawl_budget


def _requests(spark, demands: dict[str, int]):
    rows = [(h,) for h, d in demands.items() for _ in range(d)]
    return spark.createDataFrame(rows, "host string")


def _reference(demands: dict[str, int], budget: int) -> dict[str, int]:
    """Brute-force water level: largest integer T with
    sum(min(d, T)) <= budget; grant min(d, T) unless everyone fits."""
    if sum(demands.values()) <= budget:
        return dict(demands)
    t = 0
    while sum(min(d, t + 1) for d in demands.values()) <= budget:
        t += 1
    return {h: min(d, t) for h, d in demands.items()}


def _run(spark, demands: dict[str, int], budget: int) -> dict[str, int]:
    out = allocate_crawl_budget(_requests(spark, demands), budget)
    return {r.host: r.granted for r in out.collect()}


def test_everyone_fits_when_budget_covers_total(spark):
    d = {"a": 5, "b": 3, "c": 9}
    assert _run(spark, d, 17) == d
    assert _run(spark, d, 100) == d


def test_big_hosts_capped_small_served(spark):
    d = {"small": 2, "mid": 10, "big": 100}
    got = _run(spark, d, 20)
    assert got == _reference(d, 20)
    assert got["small"] == 2  # fully served
    assert got["big"] == got["mid"]  # capped at one fair level


def test_zero_budget(spark):
    assert _run(spark, {"a": 4, "b": 1}, 0) == {"a": 0, "b": 0}


@settings(max_examples=12, deadline=None)
@given(
    demands=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    budget=st.integers(0, 120),
)
def test_matches_reference_waterfilling(spark, demands, budget):
    d = {f"h{i}": v for i, v in enumerate(demands)}
    got = _run(spark, d, budget)
    ref = _reference(d, budget)
    assert got == ref, (d, budget)
    assert sum(got.values()) <= budget or sum(d.values()) <= budget


def test_conserves_budget_within_floor_remainder(spark):
    d = {"a": 50, "b": 50, "c": 50, "d": 1}
    budget = 100
    got = _run(spark, d, budget)
    assert sum(got.values()) <= budget
    # remainder loss bounded by hosts - 1
    assert sum(got.values()) >= budget - (len(d) - 1)
