"""Top-k / cumulative-share window operators (reference §2.6 K4/K5 family).

K4 (top-k filter, crates/core/src/sampling.rs:151-165)  → per-group
row_number ≤ k over a deterministic (value desc, id asc) order.
K5 (top-p nucleus, sampling.rs:167-214)                 → per-group running
share cut: keep the smallest prefix covering ≥ p of the group mass, always
keeping ≥ 1 row (the "keep at least one" rule at sampling.rs:205-208).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """K4: deterministic per-group top-k (desc value, asc tiebreak)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cumulative_share_cut(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    order_col: str,
    tiebreak_col: str,
    p_numerator: int,
    p_denominator: int,
) -> DataFrame:
    """K5: keep the smallest per-group prefix whose weight share reaches
    p (= p_numerator/p_denominator).

    Kept-row rule in INTEGER arithmetic (cross-engine exact when the weight
    column is integral): a row is kept iff the running sum *before* it has
    not yet reached p — i.e. (cum - w) * den < total * num. The top row is
    always kept (cum - w = 0 < total·num for any non-empty group).
    """
    w = Window.partitionBy(*group_cols).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    total_w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_cum", F.sum(weight_col).over(w))
        .withColumn("_total", F.sum(weight_col).over(total_w))
        .filter(
            (F.col("_cum") - F.col(weight_col)) * p_denominator
            < F.col("_total") * p_numerator
        )
        .drop("_cum", "_total")
    )
