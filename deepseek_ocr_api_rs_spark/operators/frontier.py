"""URL-frontier membership via a deterministic Bloom filter.

A crawl frontier at 10^12-URL scale cannot afford an exact anti-join against
the full crawled set on every batch; the standard structure is a Bloom
filter over crawled URLs consulted before enqueueing (the reference's crawl
loop keeps an in-process HashSet for the same purpose — the no-repeat
history map of crates/core/src/sampling.rs:132-149 is the per-request
analogue). Spark ships a driver-side ``DataFrame.stat.bloomFilter``, but its
hash mixing is JVM-private — no other engine can reproduce which bits are
set, so a correctness oracle could only check the exact side, never the
filter itself. Here the filter is pinned:

    key(url)   = fold(chars, acc0=7, acc -> (acc*31 + codepoint) % P)
    bit_i(url) = ((A_i * key + B_i) % P) % m_bits      (k universal hashes)

with the bit array materialized as ``m_bits/32`` little-endian 32-bit words
(``word = bit >> 5``, ``mask = 1 << (bit & 31)`` — masks stay < 2^31, so no
64-bit-shift overflow in either engine's ANSI mode). DuckDB rebuilds the
identical words and therefore the identical membership verdicts, INCLUDING
false positives — the filter's honesty (fp = bloom-hit ∧ ¬crawled) is itself
under the value-exact gate.

Scale shape:
- build: one projection explodes k (word, mask) pairs per crawled URL, one
  ``bit_or`` hash-agg over at most m/32 groups — map-side combine collapses
  each partition to ≤ m/32 rows before the (tiny) shuffle;
- probe: the words table (m/32 rows) broadcasts; candidates take a
  broadcast LEFT join per hash slot and a per-url ALL-slots-set aggregate —
  the candidate table itself never shuffles on a key wider than its url
  grouping. At 10^12 crawled URLs m grows to RAM (1.25 GB per 10^10 bits,
  still broadcastable) or the probe flips to a co-partitioned join on
  ``word`` — the plan shape survives either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.functions import hashing as H

# k universal-hash parameters, drawn from the same pinned LCG family as
# MinHash but further down the stream (offset so the two operator families
# never share a hash function).
_BLOOM_K = 3
BLOOM_PARAMS: list[tuple[int, int]] = H._lcg_params(H._N_HASHES + _BLOOM_K)[
    H._N_HASHES :
]
DEFAULT_M_BITS = 8192  # test-scale default; callers size by expected n


def _key_spark(col: str) -> str:
    """Polynomial key over the RAW url string (no lowercase/tokenize —
    frontier identity is byte precise).

    Empty-string guard (ADVICE r7, same footgun operators/lm.py
    documents): Spark's ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``
    — an unguarded fold would accumulate ascii('')=0 twice, while the
    DuckDB mirror's ``range(1, 1)`` is empty and leaves the key at
    KEY_INIT. Guard so both engines agree: key('') = KEY_INIT."""
    return (
        f"if(length({col}) = 0, cast({H.KEY_INIT} as bigint), "
        f"aggregate(sequence(1, length({col})), cast({H.KEY_INIT} as bigint), "
        f"(acc, i) -> (acc * {H.KEY_MULT} + ascii(substr({col}, i, 1))) % {H.P}))"
    )


def _key_duckdb(col: str) -> str:
    return (
        f"list_reduce(list_prepend(cast({H.KEY_INIT} as bigint), "
        f"list_transform(range(1, length({col}) + 1), "
        f"i -> cast(ascii(substr({col}, i, 1)) as bigint))), "
        f"(a, b) -> (a * {H.KEY_MULT} + b) % {H.P})"
    )


def _bits_spark(key_expr: str, m_bits: int) -> str:
    slots = ", ".join(
        f"(({a} * ({key_expr}) + {b}) % {H.P}) % {m_bits}" for a, b in BLOOM_PARAMS
    )
    return f"array({slots})"


def _bits_duckdb(key_expr: str, m_bits: int) -> str:
    slots = ", ".join(
        f"(({a} * ({key_expr}) + {b}) % {H.P}) % {m_bits}" for a, b in BLOOM_PARAMS
    )
    return f"[{slots}]"


def build_bloom(crawled: DataFrame, url_col: str = "url",
                m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """Bloom bit array over ``crawled[url_col]`` as (word: int, bits: long)
    rows — ≤ m_bits/32 rows regardless of input size."""
    bits = _bits_spark(_key_spark(url_col), m_bits)
    return (
        crawled.select(F.explode(F.expr(bits)).alias("bit"))
        .select(
            F.expr("cast(bit >> 5 as int)").alias("word"),
            F.expr("cast(shiftleft(cast(1 as bigint), cast(bit & 31 as int)) as bigint)").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(candidates: DataFrame, bloom: DataFrame, url_col: str = "url",
                m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """Probe each candidate URL against a built filter. Returns one row per
    candidate with ``bloom_hit`` — true iff EVERY one of its k bits is set.
    The bloom side is broadcast; candidates never shuffle for the probe
    (only for their own final per-url regroup, on the url they already
    carry)."""
    probe_bits = (
        candidates.select(
            url_col, F.posexplode(F.expr(_bits_spark(_key_spark(url_col), m_bits))).alias("slot", "bit")
        )
        .select(
            url_col,
            "slot",
            F.expr("cast(bit >> 5 as int)").alias("word"),
            F.expr("cast(shiftleft(cast(1 as bigint), cast(bit & 31 as int)) as bigint)").alias("mask"),
        )
    )
    joined = probe_bits.join(F.broadcast(bloom), "word", "left").select(
        url_col,
        F.when(
            F.col("bits").isNotNull()
            & (F.expr("bits & mask") != F.lit(0)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("set"),
    )
    return joined.groupBy(url_col).agg(
        (F.min("set") == F.lit(1)).alias("bloom_hit")
    )


def bloom_words_duckdb(crawled_sql: str, url_col: str = "url",
                       m_bits: int = DEFAULT_M_BITS) -> str:
    """DuckDB CTE body reproducing build_bloom bit-for-bit."""
    bits = _bits_duckdb(_key_duckdb(url_col), m_bits)
    return f"""
  select cast(bit >> 5 as int) as word,
         bit_or(cast(1 as bigint) << cast(bit & 31 as int)) as bits
  from (select unnest({bits}) as bit from ({crawled_sql}))
  group by word
"""


def bloom_probe_duckdb(candidates_sql: str, bloom_cte: str = "bloom",
                       url_col: str = "url",
                       m_bits: int = DEFAULT_M_BITS) -> str:
    """DuckDB CTE body reproducing bloom_probe verdicts bit-for-bit."""
    bits = _bits_duckdb(_key_duckdb(url_col), m_bits)
    return f"""
  select {url_col},
         cast(min(case when b.bits is not null
                        and (b.bits & (cast(1 as bigint) << cast(c.bit & 31 as int))) != 0
                  then 1 else 0 end) = 1 as boolean) as bloom_hit
  from (select {url_col}, unnest({bits}) as bit from ({candidates_sql})) c
  left join {bloom_cte} b on cast(c.bit >> 5 as int) = b.word
  group by {url_col}
"""
