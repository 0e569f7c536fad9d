"""Deterministic data-mixture sampling — the Dolma/Pile/LLaMA mixing
step (r8).

After filtering and dedup, a training-data build samples each SOURCE
(crawl, news, code, books …) to a target token share: rate
``r_s = (w_s · B) / T_s`` where ``B`` is the total token budget, ``w_s``
the source's mixture weight, and ``T_s`` the source's available tokens.
Sources above their share are down-sampled (``r_s < 1``); prized small
sources are UP-sampled (``r_s > 1`` → documents repeat, the standard
epoch-multiplier trick).

Exactness discipline: every quantity is integer arithmetic on BIGINTs —
the rate is never a float. With ``FRAC = 2^20``:

    q_s        = (B * w_num_s) DIV w_den_s          target tokens
    r_fp(s)    = (q_s * FRAC) DIV T_s               rate in 1/FRAC units
    base(s)    = r_fp DIV FRAC                      whole copies per doc
    frac(s)    = r_fp % FRAC                        extra-copy probability
    keep extra ⇔ (A·doc_id + C) % P % FRAC < frac(s)

so two engines (and two cluster sizes) produce the SAME copy count per
document. Domain bound (documented, asserted): ``B * w_num ≤ 2^43`` and
``q_s * FRAC ≤ 2^63`` — per-source targets up to ~8.8e12 tokens, enough
for current LLM budgets; beyond that, split sources.

Plan shape at 10^12 docs: one map-side token count per doc, ONE tiny
per-source aggregation (broadcast back), and a map-only keep/copy
decision — the corpus never shuffles for the mixture. Expected realized
tokens per source ≈ q_s with per-doc Bernoulli variance; the expectation
is exact by construction (sum of r_fp/FRAC over docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.functions.hashing import P
from deepseek_ocr_api_rs_spark.functions.text import (
    token_count,
    token_count_duckdb,
)

FRAC = 1 << 20
# pinned universal-hash parameters for the per-doc Bernoulli draw
MIX_A = 1103515245
MIX_C = 12345


def mixture_sample(
    docs: DataFrame,
    budget_tokens: int,
    weights: dict[str, tuple[int, int]] | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    tokens_col: str | None = None,
    ordered: bool = True,
) -> DataFrame:
    """One row per document: (doc_id, source, n_tokens, rate_fp,
    n_copies) where n_copies ∈ {0, 1, 2, …} is the deterministic
    sample multiplicity under the budget. ``weights`` maps source →
    (num, den) mixture weight; omitted sources (and the default) get
    equal weight 1/n_sources.

    ``tokens_col`` names an already-computed per-doc token count (skips
    the ``token_count(text_col)`` projection — callers that counted
    tokens upstream, e.g. the corpus build, avoid re-tokenizing).
    ``ordered=False`` skips the final corpus-wide orderBy for callers
    that re-shuffle the output anyway (a window or join follows).

    The per-source aggregation is collected ONCE (≤ n_sources rows) and
    the finished integer rates are computed driver-side, then broadcast
    back — one corpus pass for the totals, one for the tagging join
    (the previous layout evaluated the totals three times at plan
    build: count(), collect(), and again inside the rates join)."""
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        (
            F.col(tokens_col).cast("long")
            if tokens_col is not None
            else token_count(text_col)
        ).alias("n_tokens"),
    )
    totals_rows = base.groupBy("source").agg(
        F.sum("n_tokens").alias("t_s")
    ).collect()  # bounded driver read: one row per source
    n_sources = len(totals_rows)
    if weights is None:
        weights = {}
    rate_rows = []
    for row in totals_rows:
        num, den = weights.get(row.source, (1, n_sources))
        # the documented bigint domain bound: q_s * FRAC must stay
        # STRICTLY below 2^63, i.e. per-source targets ≤ ~8.8e12 tokens
        assert budget_tokens * num < 1 << 43, (
            f"mixture_sample domain bound exceeded for source "
            f"{row.source!r}: budget * w_num = {budget_tokens * num} "
            f">= 2^43 — split the source or scale the weight down"
        )
        q_s = (budget_tokens * num) // den  # nonneg: // == DIV
        t_s = row.t_s
        rate_fp = (
            None if t_s is None else (0 if t_s == 0 else (q_s * FRAC) // t_s)
        )
        rate_rows.append((row.source, rate_fp))
    rates = spark.createDataFrame(
        rate_rows, "source string, rate_fp long"
    )
    # doc_id is reduced mod P BEFORE the multiply: mathematically identical
    # for every nonnegative doc_id ((a·x + c) mod P == (a·(x mod P) + c)
    # mod P), but keeps the intermediate below 2^61 so the draw is exact
    # for doc_id ≥ 2^33 too (the raw product overflows int64 at doc_id
    # ≳ 8.4e9 and Spark would wrap silently). The DuckDB oracle keeps the
    # raw form: it raises loudly on overflow rather than wrapping, so the
    # engines can never silently disagree.
    draw = f"((({MIX_A}L * (doc_id % {P}) + {MIX_C}) % {P}) % {FRAC})"
    out = (
        base.join(F.broadcast(rates), "source")
        .withColumn(
            "n_copies",
            F.expr(
                f"rate_fp DIV {FRAC} + "
                f"if({draw} < rate_fp % {FRAC}, 1L, 0L)"
            ),
        )
        .select("doc_id", "source", "n_tokens", "rate_fp", "n_copies")
    )
    return out.orderBy("doc_id") if ordered else out


def mixture_sample_sql(
    budget_tokens: int, docs_table: str = "documents"
) -> str:
    """The identical arithmetic in DuckDB (equal weights 1/n_sources)."""
    tc = token_count_duckdb("text")
    return f"""
with base as (
  select doc_id, source, {tc} as n_tokens from {docs_table}
),
tot as (
  select source, cast(sum(n_tokens) as bigint) as t_s from base group by source
),
nsrc as (select count(*) as k from tot),
rates as (
  select source,
    case when t_s = 0 then 0
         else ((({budget_tokens} * 1) // k) * {FRAC}) // t_s
    end as rate_fp
  from tot cross join nsrc
)
select b.doc_id, b.source, b.n_tokens, cast(r.rate_fp as bigint) as rate_fp,
  cast(r.rate_fp // {FRAC}
       + case when ((({MIX_A} * b.doc_id + {MIX_C}) % {P}) % {FRAC})
                   < r.rate_fp % {FRAC} then 1 else 0 end as bigint)
    as n_copies
from base b join rates r using (source)
order by b.doc_id
"""
