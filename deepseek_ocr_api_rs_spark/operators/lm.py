"""Corpus-trained character-trigram LM quality scoring (the CCNet shape).

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data") buckets Common-Crawl documents into head/middle/tail
by the perplexity of a language model trained on a trusted seed corpus.
This operator reproduces that *pipeline shape* Spark-first:

  1. TRAIN — one hash-agg counts character trigrams over the seed slice
     (map-side combine; the model is the count table, ≤ ~50k rows for the
     [a-z0-9 ] alphabet — trivially broadcastable);
  2. SCORE — every document's trigrams join the broadcast model and fold
     into a per-document negative log likelihood; the corpus never
     shuffles for the model.

Engine exactness: a float ``ln`` differs between the JVM and libm in the
last ulp (the repo-wide discipline avoids it — BM25 ships its idf core
rationally for the same reason), so the per-trigram cost is DYADICALLY
QUANTIZED to whole bits:

    nll_bits(g) = floor(log2(T div c(g)))   computed as
                  length(bin(T div c(g))) - 1

`bin()` renders a positive BIGINT identically in Spark and DuckDB, so the
cost table is integer-exact cross-engine — no transcendental anywhere.
(`floor(log2(x))` via doubles is NOT safe: Spark evaluates log2 as
ln(x)/ln(2), which lands below the integer at exact powers of two.)
Unseen trigrams cost ``floor(log2(T)) + 1`` bits — one bit worse than a
count-1 trigram, the add-half smoothing floor. A production deployment
would swap the count table for a KenLM export; the Spark plan (train agg →
broadcast join → per-doc fold) is unchanged by that substitution.

The per-document score is ``sum_bits / n_ngrams`` — a single IEEE division
of two exact integers (the established float discipline), bucketed
head/middle/tail on fixed thresholds (CCNet uses corpus quantiles; fixed
cuts keep the oracle independent of a second global pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.dedup import _persist, _with_deps

# Bucket cuts in bits-per-trigram. A trigram drawn uniformly from the
# ~46k-type alphabet costs ~15.5 bits; seed-typical text compresses far
# below that. Cuts are deliberately round constants, not learned.
HEAD_MAX_BITS = 8.0
MIDDLE_MAX_BITS = 11.0

_NORM = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' '))"


def _trigrams_spark(col: str) -> str:
    # The length-3 filter guards texts shorter than one trigram: Spark's
    # sequence(1, 0) is DESCENDING [1, 0] (it never returns empty), which
    # would emit phantom sub-trigram slices on empty/short normalized text.
    s = _NORM.format(col=col)
    return (
        f"filter(transform(sequence(1, greatest(length({s}) - 2, 0)), "
        f"i -> substr({s}, i, 3)), x -> length(x) = 3)"
    )


def _trigrams_duckdb(col: str) -> str:
    s = _NORM.format(col=col)
    return (
        f"list_filter(list_transform(range(1, greatest(length({s}) - 2, 0) + 1), "
        f"i -> substr({s}, i, 3)), x -> length(x) = 3)"
    )


def train_trigram_counts(seed: DataFrame, text_col: str = "text") -> DataFrame:
    """Count table (g: string, c: long) over the seed slice — the model."""
    return (
        seed.select(F.explode(F.expr(_trigrams_spark(text_col))).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c"))
    )


def score_documents(docs: DataFrame, model: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document dyadic NLL under a trained count table.

    Returns (id, n_ngrams, sum_bits, bits_per_ngram, bucket). The model and
    its total fold in as broadcasts — the document side's only shuffle is
    its own per-doc regroup."""
    total = model.agg(F.sum("c").cast("long").alias("T"))
    grams = docs.select(
        F.col(id_col), F.explode(F.expr(_trigrams_spark(text_col))).alias("g")
    )
    costed = (
        grams.join(F.broadcast(model), "g", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.expr(
                "cast(case when c is not null then length(bin(T div c)) - 1 "
                "else length(bin(T)) end as bigint)"
            ).alias("bits"),
        )
    )
    scored = costed.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.sum("bits").alias("sum_bits"),
    )
    docs_all = docs.select(id_col)
    return (
        docs_all.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("sum_bits", F.lit(0)).cast("long").alias("sum_bits"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.col("sum_bits") / F.col("n_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("bits_per_ngram"),
        )
        .withColumn(
            "bucket",
            F.when(F.col("n_ngrams") == 0, F.lit("tail"))
            .when(F.col("bits_per_ngram") < HEAD_MAX_BITS, F.lit("head"))
            .when(F.col("bits_per_ngram") < MIDDLE_MAX_BITS, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
    )


def lm_score_sql(seed_where: str, text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    """DuckDB mirror: identical counts, identical dyadic costs, identical
    single-division score and buckets."""
    tg = _trigrams_duckdb(text_col)
    return f"""
with model as (
  select g, count(*) as c
  from (select unnest({tg}) as g from documents where {seed_where})
  group by g
), tot as (
  select cast(sum(c) as bigint) as T from model
), grams as (
  select {id_col}, unnest({tg}) as g from documents
), costed as (
  select {id_col},
         cast(case when m.c is not null then length(bin(t.T // m.c)) - 1
              else length(bin(t.T)) end as bigint) as bits
  from grams left join model m using (g) cross join tot t
), scored as (
  select {id_col}, cast(count(*) as bigint) as n_ngrams,
         cast(sum(bits) as bigint) as sum_bits
  from costed group by {id_col}
)
select d.{id_col},
       coalesce(s.n_ngrams, 0) as n_ngrams,
       coalesce(s.sum_bits, 0) as sum_bits,
       case when coalesce(s.n_ngrams, 0) > 0
            then s.sum_bits / s.n_ngrams else 0.0 end as bits_per_ngram,
       case when coalesce(s.n_ngrams, 0) = 0 then 'tail'
            when s.sum_bits / s.n_ngrams < {HEAD_MAX_BITS} then 'head'
            when s.sum_bits / s.n_ngrams < {MIDDLE_MAX_BITS} then 'middle'
            else 'tail' end as bucket
from (select {id_col} from documents) d
left join scored s using ({id_col})
order by d.{id_col}
"""


def dsir_weights(docs: DataFrame, target: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling"): log w(x) = log p_target(x) −
    log p_source(x), estimated with hashed n-gram models. Here both models
    are trigram count tables (target = the trusted seed slice, source = the
    full pool) and the log-ratio is the dyadic-bit difference

        weight_bits(x) = Σ_g [bits_source(g) − bits_target(g)]

    — integer-exact cross-engine for the same reason as score_documents
    (no transcendental; see the module docstring). One pass: each
    document's trigrams join BOTH broadcast models; the pool never
    shuffles for either model.

    Returns (id, n_ngrams, weight_bits). Positive = more target-like than
    pool-typical; DSIR resamples proportionally to w — the deterministic
    analogue selects the top weight quantile (see q_dsir_select).
    """
    tgt = target.select(F.col("g"), F.col("c").alias("c_tgt"))
    src = _persist(
        train_trigram_counts(docs, text_col).select(
            F.col("g"), F.col("c").alias("c_src")
        )
    )
    t_tgt = target.agg(F.sum("c").cast("long").alias("T_tgt"))
    t_src = src.agg(F.sum("c_src").cast("long").alias("T_src"))
    grams = docs.select(
        F.col(id_col), F.explode(F.expr(_trigrams_spark(text_col))).alias("g")
    )
    costed = (
        grams.join(F.broadcast(tgt), "g", "left")
        .join(F.broadcast(src), "g", "left")
        .crossJoin(F.broadcast(t_tgt))
        .crossJoin(F.broadcast(t_src))
        .select(
            id_col,
            F.expr(
                "cast((case when c_src is not null then length(bin(T_src div c_src)) - 1 "
                "else length(bin(T_src)) end) - "
                "(case when c_tgt is not null then length(bin(T_tgt div c_tgt)) - 1 "
                "else length(bin(T_tgt)) end) as bigint)"
            ).alias("dbits"),
        )
    )
    scored = costed.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"), F.sum("dbits").alias("weight_bits")
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("weight_bits", F.lit(0)).cast("long").alias("weight_bits"),
        )
    )
    return _with_deps(out, src)


def dsir_sql(seed_where: str, id_col: str = "doc_id",
             text_col: str = "text") -> str:
    """DuckDB mirror of dsir_weights + top-quartile selection."""
    tg = _trigrams_duckdb(text_col)
    return f"""
with tgt as (
  select g, count(*) as c_tgt
  from (select unnest({tg}) as g from documents where {seed_where})
  group by g
), src as (
  select g, count(*) as c_src
  from (select unnest({tg}) as g from documents)
  group by g
), tt as (select cast(sum(c_tgt) as bigint) as T_tgt from tgt),
ts as (select cast(sum(c_src) as bigint) as T_src from src),
grams as (
  select {id_col}, unnest({tg}) as g from documents
), costed as (
  select {id_col},
    cast((case when s.c_src is not null then length(bin(ts.T_src // s.c_src)) - 1
          else length(bin(ts.T_src)) end) -
         (case when t.c_tgt is not null then length(bin(tt.T_tgt // t.c_tgt)) - 1
          else length(bin(tt.T_tgt)) end) as bigint) as dbits
  from grams left join tgt t using (g) left join src s using (g)
  cross join tt cross join ts
), scored as (
  select {id_col}, cast(count(*) as bigint) as n_ngrams,
         cast(sum(dbits) as bigint) as weight_bits
  from costed group by {id_col}
), weights as (
  select d.{id_col},
         coalesce(s.n_ngrams, 0) as n_ngrams,
         coalesce(s.weight_bits, 0) as weight_bits
  from (select {id_col} from documents) d
  left join scored s using ({id_col})
)
select *,
  cast(ntile(4) over (order by weight_bits desc, {id_col}) as int) as quartile,
  cast(ntile(4) over (order by weight_bits desc, {id_col}) = 1 as int) as selected
from weights
order by {id_col}
"""
