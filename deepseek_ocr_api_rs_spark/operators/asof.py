"""AS-OF JOIN — each left row matched to the LATEST right row with
``right.ts <= left.ts`` per key (time-series point-in-time join; the classic
operator vanilla Spark lacks — kdb aj / pandas merge_asof / DuckDB ASOF).

Scale-right implementation: NOT a range join (no interval explosion, no
per-key cross product). Tag both sides, union, ONE shuffle on (key), sort
within partition by (ts, tag, …), and carry the last-seen right payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. Wall cost ≈ a groupBy of the combined stream; works unchanged at
10^12 rows because the window never materializes more than the running
carry value per row.

Determinism: right rows are first reduced to ONE row per (key, ts) keeping
the max ``tiebreak`` (so equal-timestamp matches are well-defined), and at
equal (ts) the right row sorts BEFORE the left row (tag order), giving the
inclusive ``right.ts <= left.ts`` semantics DuckDB's ASOF JOIN / the SQL
``order by ts desc limit 1`` correlated form produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    tiebreak: str,
    left_id: str = "event_id",
) -> DataFrame:
    """Return ``left.*`` plus each ``right_payload`` column from the as-of
    matched right row (null when no right row precedes the left row).

    ``tiebreak`` must be a right column unique per (key, ts) — the max one
    wins when several right rows share a timestamp. ``left_id`` must be a
    UNIQUE left column (a generated monotonically_increasing_id is
    nondeterministic across recomputations and would corrupt the re-join).
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    r1 = (
        right.withColumn("_rn", F.row_number().over(
            Window.partitionBy(key, ts).orderBy(F.desc(tiebreak))
        ))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key).alias("_k"),
            F.col(ts).alias("_ts"),
            F.lit(0).alias("_tag"),
            F.lit(None).cast(dict(left.dtypes)[left_id]).alias("_lid"),
            payload_struct.alias("_payload"),
        )
    )
    l1 = left.withColumn("_lid", F.col(left_id))
    l_u = l1.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.col("_lid"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in right_payload
            ) + ">"
        ).alias("_payload"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r1.unionByName(l_u)
        .withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .select("_lid", "_asof")
    )
    out = l1.join(carried, "_lid", "left")
    for c in right_payload:
        out = out.withColumn(c, F.col("_asof")[c])
    return out.drop("_lid", "_asof")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """RANGE (interval-overlap) JOIN: all (interval, point) pairs with
    ``start_ts <= point_ts <= end_ts`` per key — the other time-series join
    vanilla Spark only offers as a cross-product-with-filter.

    Scale shape: BINNING. Each interval explodes to the time bins it
    overlaps (a constant ≈ span/bin fan-out), each point maps to one bin,
    and the join becomes an equi-join on (key, bin) + an exact filter — no
    per-key cross product, shuffle volume ≈ points + intervals × bins/interval.
    Pick ``bin_seconds`` near the typical interval span so the fan-out stays
    ≈ 2. Columns of the two inputs must be disjoint apart from ``key``.
    """
    bin_lit = F.lit(bin_seconds)
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts).cast("timestamp")) / bin_lit),
                F.floor(F.unix_timestamp(F.col(end_ts).cast("timestamp")) / bin_lit),
            )
        ),
    )
    p = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts).cast("timestamp")) / bin_lit)
    )
    return (
        i.join(p, [key, "_bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )
