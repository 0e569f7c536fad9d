"""Distributed BPE merge learning (r7) — tokenizer training as a Spark job.

The missing corpus-side half of the tokenizer story: ``q_bpe_tokens``
counts tokens with a fixed BPE-ish regex; this module LEARNS the merge
table itself (Sennrich et al. 2016, public) from the corpus, the way a
SentencePiece/HuggingFace trainer would, restated as a DataFrame
fixed-point:

1. pre-tokenize once: the corpus collapses to a (word, freq) table —
   the standard trick that makes BPE training tractable at 100 TB
   (pair statistics are a function of the DISTINCT-word frequency
   table, ~10^7 rows for web text, not of the 10^12-document corpus;
   the only corpus-sized pass is the initial word count);
2. each merge round is ONE shuffle over that small table: explode
   adjacent token pairs weighted by word frequency, aggregate, and
   take the arg-max pair (ties broken lexicographically, so the
   result is engine- and partitioning-independent — counts are
   integer sums, hence associative and exact);
3. apply the merge with a greedy left-to-right fold
   (``F.aggregate`` over the char array, accumulator = separator-
   joined token string) — the same fold DuckDB runs via
   ``list_reduce``, so the oracle replays the IDENTICAL recurrence
   end-to-end in SQL (chained CTEs, arg-max via ORDER BY .. LIMIT 1,
   no driver state).

Scale shape: the word table persists across rounds (each round's
frame is materialized by the arg-max action before the previous one
is unpersisted — the iterative-loop discipline shared with
connected-components and PageRank); per-round driver traffic is ONE
row (the winning pair), the bounded-manifest-read pattern. k merge
rounds = k shuffles of the word table, the accepted cost model of
every distributed BPE trainer.

Reference anchor: the reference tokenizes with a FIXED shipped vocab
(crates/server/src/generation.rs tokenizer load); learning the table
is the corpus-pipeline extension SURVEY §2's training-data mandate
calls for (token counting family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

# U+001F unit separator: regex-metachar-free, never appears in word
# tokens (pre-tokenization splits on whitespace; control chars are not
# produced by the corpus grammar, and a word containing U+001F would
# merely mis-segment that one word's fold on both engines identically).
SEP = "\x1f"

_MERGES_SCHEMA = Ty.StructType(
    [
        Ty.StructField("merge_rank", Ty.IntegerType(), False),
        Ty.StructField("lhs", Ty.StringType(), False),
        Ty.StructField("rhs", Ty.StringType(), False),
        Ty.StructField("pair_count", Ty.LongType(), False),
    ]
)


def _char_toks(word_col: str) -> F.Column:
    """word → SEP-joined single-char token string."""
    return F.array_join(F.expr(f"split({word_col}, '')"), SEP)


def _pairs(w: DataFrame) -> DataFrame:
    """(freq, toks) → exploded adjacent (l, r, freq) pairs, overlapping
    occurrences counted (the BPE convention: 'aaa' yields (a,a) twice)."""
    ts = f"split(toks, '{SEP}')"
    z = F.expr(
        f"arrays_zip(slice({ts}, 1, size({ts}) - 1), "
        f"slice({ts}, 2, size({ts}) - 1))"
    )
    return w.select("freq", F.explode(z).alias("z")).select(
        "freq", F.col("z.0").alias("l"), F.col("z.1").alias("r")
    )


def _apply_merge(w: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of the pair (left, right) in every
    word's token string. Merging appends ``right`` to an accumulator
    that already ends with the full token ``left`` — the merged token
    is their concatenation, and because ``left || right != left`` the
    fold never chain-merges through an overlap ('aaa' + (a,a) →
    ['aa','a'], the reference greedy semantics). All columns other
    than ``toks`` pass through."""
    ts = F.split(F.col("toks"), SEP)
    merged = F.aggregate(
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
        F.element_at(ts, 1),
        lambda acc, x: F.when(
            (F.element_at(F.split(acc, SEP), -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return w.withColumn("toks", merged)


def bpe_learn(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    shuffle_partitions: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """(word, freq) frame → learned merge list
    [(merge_rank, lhs, rhs, pair_count), ...] (≤ n_merges entries;
    stops early when no adjacent pair remains). Each round collects
    exactly ONE row (the arg-max pair). ``shuffle_partitions`` scopes
    the per-round pair-count shuffles to the WORD-table cardinality —
    far smaller than the corpus at any scale (the iterative-operator
    lever shared with HITS)."""
    from deepseek_ocr_api_rs_spark.operators.partitioning import (
        scoped_shuffle_partitions,
    )

    with scoped_shuffle_partitions(words.sparkSession, shuffle_partitions):
        return _bpe_learn_loop(words, n_merges, word_col, freq_col)


def _bpe_learn_loop(
    words: DataFrame,
    n_merges: int,
    word_col: str,
    freq_col: str,
) -> list[tuple[int, str, str, int]]:
    w = words.select(
        F.col(freq_col).cast("long").alias("freq"),
        _char_toks(word_col).alias("toks"),
    ).persist()
    merges: list[tuple[int, str, str, int]] = []
    # Each round's arg-max job is ALSO the materialization barrier for the
    # current word frame (persist marks are honored mid-action): the old
    # explicit count() per round doubled the job count for no extra
    # safety. The parent frame is released one round LATE (after the
    # arg-max that consumed its cached child has run), so no frame is
    # ever dropped while still the only source of an unmaterialized
    # persist. Plan depth stays O(1): the cache manager substitutes the
    # parent's InMemoryRelation into each new round's plan.
    parent: DataFrame | None = None
    try:
        for rank in range(1, n_merges + 1):
            best = (
                _pairs(w)
                .groupBy("l", "r")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "l", "r")
                .limit(1)
                .collect()
            )
            if parent is not None:
                parent.unpersist()
                parent = None
            if not best:
                break
            l, r, cnt = best[0].l, best[0].r, int(best[0].cnt)
            merges.append((rank, l, r, cnt))
            if rank == n_merges:
                break
            w_next = _apply_merge(w, l, r).persist()
            parent = w
            w = w_next
    finally:
        if parent is not None:
            parent.unpersist()
        w.unpersist()
    return merges


def bpe_learn_df(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """bpe_learn as a small (≤ n_merges)-row result frame."""
    rows = bpe_learn(words, n_merges, word_col, freq_col,
                     shuffle_partitions)
    return spark.createDataFrame(rows, _MERGES_SCHEMA)


def _bpe_chain_ctes(
    words_cte: str, n_merges: int, final_word_table: bool
) -> list[str]:
    """The shared CTE chain of the learn/encode oracles. Every CTE is
    ``AS MATERIALIZED``: w{k-1} is referenced by BOTH p{k} and w{k}
    (and b{k} by w{k} and the final projection), so default inlining
    would expand the word table 2^n times — the HITS lesson.
    ``final_word_table`` additionally emits w{n_merges} (the encode
    oracle needs the post-merge token strings; the learn oracle stops
    at b{n_merges})."""
    parts = [
        f"with wf as materialized ({words_cte})",
        "w0 as materialized (select word, freq, array_to_string("
        "list_transform(range(length(word)), i -> word[i + 1]),"
        " chr(31)) as toks from wf)",
    ]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        parts.append(
            f"p{k} as materialized (select l, r, "
            "cast(sum(freq) as bigint) as cnt "
            f"from (select freq, ts[i] as l, ts[i + 1] as r from "
            f"(select freq, string_split(toks, chr(31)) as ts from {prev}),"
            " unnest(range(1, len(ts))) as u(i)) group by l, r)"
        )
        parts.append(
            f"b{k} as materialized (select l, r, cnt from p{k} "
            "order by cnt desc, l, r limit 1)"
        )
        if k < n_merges or final_word_table:
            parts.append(
                f"w{k} as materialized (select word, freq, list_reduce("
                f"string_split(w.toks, chr(31)), (acc, x) -> case when "
                f"string_split(acc, chr(31))[-1] = b.l and x = b.r "
                "then acc || x else acc || chr(31) || x end) as toks "
                f"from {prev} w cross join b{k} b)"
            )
    return parts


def bpe_oracle_sql(words_cte: str, n_merges: int) -> str:
    """The identical recurrence as chained DuckDB CTEs — pair stats via
    a lateral unnest over 1-based positions, arg-max via ORDER BY ..
    LIMIT 1, greedy merge via ``list_reduce`` (left fold, accumulator =
    first element: exactly Spark's ``aggregate`` with init toks[0]).
    ``words_cte`` selects (word, freq)."""
    parts = _bpe_chain_ctes(words_cte, n_merges, final_word_table=False)
    union = " union all ".join(
        f"select {k} as merge_rank, l as lhs, r as rhs, cnt as pair_count "
        f"from b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        ",\n".join(parts)
        + f"\nselect * from ({union}) order by merge_rank"
    )


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[int, str, str, int]],
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Apply a learned merge list to a (word, freq) table in rank order
    (the standard BPE encode: each merge applies globally before the
    next) → (word, freq, toks, n_tokens). Runs entirely as chained
    codegen folds over the DISTINCT-word table — the corpus is
    tokenized by joining this small result back, never by folding
    every document."""
    w = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
        _char_toks(word_col).alias("toks"),
    )
    for _rank, l, r, _cnt in merges:
        w = _apply_merge(w, l, r)
    return w.withColumn("n_tokens", F.size(F.split("toks", SEP)))


def bpe_encode_tokens_sql(words_cte: str, n_merges: int) -> str:
    """Oracle half of bpe_apply: the same CTE chain, ending in the
    final word table with per-word token counts."""
    parts = _bpe_chain_ctes(words_cte, n_merges, final_word_table=True)
    return (
        ",\n".join(parts)
        + f"\nselect word, freq, "
        "cast(len(string_split(toks, chr(31))) as int) as n_tokens "
        f"from w{n_merges}"
    )
