"""Trained document-quality classifier — distributed CART on hashed
ratio features (r8).

Real LLM data pipelines gate web text with a TRAINED classifier (the
fastText wiki-vs-crawl filter in CCNet/LLaMA, the RefinedWeb quality
model) rather than hand rules alone. This module supplies that pipeline
stage Spark-first, with the repo's exactness discipline: a depth-2
classification tree grown by EXACT INTEGER split search, so training is
bit-identical across engines, partitionings, and reruns, and the DuckDB
oracle replays the identical recurrence in SQL.

Why a tree and not gradient descent: logistic GD on this feature family
is ill-conditioned (hundreds of epochs ⇒ hundreds of shuffle rounds) and
sigmoid/step-size arithmetic drags floats in; batch perceptron 2-cycles.
CART's split search is a pure integer ARG-MAX — the same shape as the
BPE merge learner: one aggregation per tree level, lexicographic
tie-breaks, no transcendental anywhere. Depth 2 = three integer
aggregations total.

Features (the fastText shape, exact): token w → bucket
``word_key(w) % 32`` (the repo's cross-engine polynomial hash), per-doc
RATIO features ``x_d = (count_d * 1024) DIV n_tokens`` — ratios make the
target (a stopword-ratio rule) exactly expressible, and the integer DIV
on non-negative operands floors identically in Spark and DuckDB.

Labels: the classic distant-supervision proxy — a deterministic rule on
raw text (here: database-stopword ratio ≥ 1/6) stands in for
wiki-vs-crawl labels; the classifier must REDISCOVER it from hashed
buckets only (hash collisions cap attainable accuracy — the honest gap
tests assert around).

Split criterion: correctly-classified count after the split (integer;
Gini would need rational compares), candidates = present (dim,
threshold) pairs over a fixed threshold grid, winner by
(correct DESC, dim ASC, threshold ASC). Each level is ONE shuffle over
the doc-feature table (never the corpus text) + a broadcast of the ≤2
winning splits — no driver action anywhere in the plan.

Scale shape at 10^12 docs: the feature build is one corpus pass + one
(doc, dim) agg; level aggregations move (node, dim, t) cells — at most
nodes × 32 dims × 16 thresholds rows. Tree state is a ≤3-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.functions.hashing import (
    word_key_duckdb,
    word_key_spark,
)

D_BUCKETS = 32
RATIO_SCALE = 1024
THRESHOLDS: tuple[int, ...] = tuple(range(8, 136, 8))  # 1/1024 ratio units
STOP_WORDS: tuple[str, ...] = ("scan", "join", "merge", "hash", "sort")

_TOKEN_RE = "[a-z0-9]+"


def _base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    stop_list = ", ".join(f"'{w}'" for w in STOP_WORDS)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)"
            ).alias("toks"),
        )
        .withColumn("nt", F.greatest(F.size("toks"), F.lit(1)).cast("long"))
        .withColumn(
            "y",
            (
                F.expr(
                    f"size(filter(toks, t -> array_contains(array({stop_list}), t)))"
                )
                * 6
                >= F.col("nt")
            ).cast("long"),
        )
    )


def _node_split(
    fe: DataFrame, assigned: DataFrame, thr: DataFrame
) -> DataFrame:
    """Per current node: the winning (dim, threshold) by the exact
    correct-count criterion. ``assigned`` is (doc_id, node, y)."""
    from pyspark.sql.window import Window

    totals = assigned.groupBy("node").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    cand = (
        fe.join(assigned, "doc_id")
        .join(F.broadcast(thr), F.col("x") >= F.col("t"))
        .groupBy("node", "dim", "t")
        .agg(F.count("*").alias("n_ge"), F.sum("y").alias("pos_ge"))
        .join(F.broadcast(totals), "node")
        .withColumn(
            "corr",
            F.greatest(F.col("pos_ge"), F.col("n_ge") - F.col("pos_ge"))
            + F.greatest(
                F.col("pos") - F.col("pos_ge"),
                (F.col("n") - F.col("n_ge"))
                - (F.col("pos") - F.col("pos_ge")),
            ),
        )
    )
    win = Window.partitionBy("node").orderBy(
        F.col("corr").desc(), "dim", "t"
    )
    return (
        cand.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("node", F.col("dim").alias("pdim"), F.col("t").alias("pt"))
    )


def _descend(fe: DataFrame, assigned: DataFrame, pick: DataFrame) -> DataFrame:
    """Route every doc one level down its node's winning split. Nodes
    without a split row (an empty side never generates candidates) keep
    their docs at the current node — the left join's null guard."""
    picked = assigned.join(F.broadcast(pick), "node", "left")
    fx = fe.select(
        F.col("doc_id").alias("fid"), F.col("dim").alias("fdim"), "x"
    )
    joined = picked.join(
        fx,
        (F.col("doc_id") == F.col("fid")) & (F.col("fdim") == F.col("pdim")),
        "left",
    )
    return joined.select(
        "doc_id",
        "y",
        F.when(F.col("pdim").isNull(), F.col("node"))
        .otherwise(
            F.concat(
                F.col("node"),
                F.when(
                    F.coalesce(F.col("x"), F.lit(0)) >= F.col("pt"),
                    F.lit("R"),
                ).otherwise(F.lit("L")),
            )
        )
        .alias("node"),
    )


def quality_tree_dispositions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train the depth-2 tree on the corpus and return one disposition
    row per document: (doc_id, label, leaf, pred) ordered by doc_id —
    label is the distant-supervision rule, leaf the root-to-leaf L/R
    path, pred the leaf's majority vote (ties → 1)."""
    from deepseek_ocr_api_rs_spark.operators.dedup import _persist

    spark = docs.sparkSession
    # registry-tracked persists: the old raw .persist() frames were
    # never released by release_persisted() and outlived the query
    base = _persist(_base(docs, id_col, text_col))
    labels = base.select("doc_id", "y")
    fe = (
        base.select("doc_id", "nt", F.explode("toks").alias("w"))
        .withColumn(
            "dim",
            F.expr(f"cast(({word_key_spark('w')}) % {D_BUCKETS} as int)"),
        )
        .groupBy("doc_id", "nt", "dim")
        .agg(F.count("*").alias("c"))
        .select(
            "doc_id",
            "dim",
            F.expr(f"(c * {RATIO_SCALE}) DIV nt").alias("x"),
        )
    )
    fe = _persist(fe)
    thr = spark.createDataFrame([(t,) for t in THRESHOLDS], "t long")

    level0 = labels.withColumn("node", F.lit("root")).select(
        "doc_id", "node", "y"
    )
    pick1 = _node_split(fe, level0, thr)
    level1 = _descend(fe, level0, pick1)
    pick2 = _node_split(fe, level1, thr)
    level2 = _descend(fe, level1, pick2)

    leaves = level2.groupBy("node").agg(
        ((F.sum("y") * 2) >= F.count("*")).cast("long").alias("pred")
    )
    return (
        level2.join(F.broadcast(leaves), "node")
        .select(
            "doc_id",
            F.col("y").alias("label"),
            F.col("node").alias("leaf"),
            "pred",
        )
        .orderBy("doc_id")
    )


def quality_tree_sql(docs_table: str = "documents") -> str:
    """The identical training recurrence as DuckDB SQL (materialized
    CTEs — pick1/fx are each referenced several times)."""
    stop_list = ", ".join(f"'{w}'" for w in STOP_WORDS)
    thr_values = ", ".join(f"({t})" for t in THRESHOLDS)
    wk = word_key_duckdb("w")
    return f"""
with base as materialized (
  select doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE}') as toks
  from {docs_table}
),
lab as materialized (
  select doc_id,
    cast(greatest(len(toks), 1) as bigint) as nt,
    cast(case when 6 * len(list_filter(toks, t -> t in ({stop_list})))
              >= greatest(len(toks), 1) then 1 else 0 end as bigint) as y
  from base
),
tok as (select doc_id, unnest(toks) as w from base),
fe as materialized (
  select doc_id, cast(({wk}) % {D_BUCKETS} as int) as dim,
         cast(count(*) as bigint) as c
  from tok group by 1, 2
),
fx as materialized (
  select fe.doc_id, fe.dim, (fe.c * {RATIO_SCALE}) // lab.nt as x
  from fe join lab using (doc_id)
),
thr(t) as (values {thr_values}),
lvl0 as materialized (
  select doc_id, 'root' as node, y from lab
),
tot1 as (select node, count(*) as n, sum(y) as pos from lvl0 group by node),
cand1 as (
  select l.node, fx.dim, thr.t,
         cast(count(*) as bigint) as n_ge, sum(l.y) as pos_ge
  from fx join lvl0 l using (doc_id) join thr on fx.x >= thr.t
  group by 1, 2, 3
),
pick1 as materialized (
  select node, dim as pdim, t as pt from (
    select c.node, c.dim, c.t,
      row_number() over (
        partition by c.node
        order by greatest(c.pos_ge, c.n_ge - c.pos_ge)
               + greatest(t1.pos - c.pos_ge,
                          (t1.n - c.n_ge) - (t1.pos - c.pos_ge)) desc,
               c.dim, c.t
      ) as rn
    from cand1 c join tot1 t1 using (node)
  ) where rn = 1
),
lvl1 as materialized (
  select l.doc_id, l.y,
    case when p.pdim is null then l.node
         else l.node ||
           case when coalesce(f.x, 0) >= p.pt then 'R' else 'L' end
    end as node
  from lvl0 l
  left join pick1 p using (node)
  left join fx f on f.doc_id = l.doc_id and f.dim = p.pdim
),
tot2 as (select node, count(*) as n, sum(y) as pos from lvl1 group by node),
cand2 as (
  select l.node, fx.dim, thr.t,
         cast(count(*) as bigint) as n_ge, sum(l.y) as pos_ge
  from fx join lvl1 l using (doc_id) join thr on fx.x >= thr.t
  group by 1, 2, 3
),
pick2 as materialized (
  select node, dim as pdim, t as pt from (
    select c.node, c.dim, c.t,
      row_number() over (
        partition by c.node
        order by greatest(c.pos_ge, c.n_ge - c.pos_ge)
               + greatest(t2.pos - c.pos_ge,
                          (t2.n - c.n_ge) - (t2.pos - c.pos_ge)) desc,
               c.dim, c.t
      ) as rn
    from cand2 c join tot2 t2 using (node)
  ) where rn = 1
),
lvl2 as materialized (
  select l.doc_id, l.y,
    case when p.pdim is null then l.node
         else l.node ||
           case when coalesce(f.x, 0) >= p.pt then 'R' else 'L' end
    end as node
  from lvl1 l
  left join pick2 p using (node)
  left join fx f on f.doc_id = l.doc_id and f.dim = p.pdim
),
leaves as (
  select node, cast(case when 2 * sum(y) >= count(*) then 1 else 0 end
                    as bigint) as pred
  from lvl2 group by node
)
select l.doc_id, l.y as label, l.node as leaf, lv.pred
from lvl2 l join leaves lv using (node)
order by l.doc_id
"""
