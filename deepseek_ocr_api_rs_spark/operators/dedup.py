"""Deduplication family over the documents table (SURVEY build mandate):

- exact:        md5-groupBy on canonicalized text (X1-normalize-then-hash)
- minhash_lsh:  shingle → MinHash signature → band keys → bucket join
- simhash:      per-bit majority vote fingerprint
- ngram_jaccard: exact n-gram set Jaccard on LSH-style candidates

Scale notes (the part that matters at 10^12 docs):
- signatures/fingerprints are computed in ONE projection over the scan —
  arrays + higher-order functions, no explode, no Python, no shuffle;
- candidate generation shuffles only (band_key, doc_id) pairs — tiny vs
  the corpus — then self-joins per bucket (classic MinHash-LSH layout);
- the exact-Jaccard verify runs only on candidates, never all-pairs;
- every hash is the pinned cross-engine polynomial family in
  functions.hashing, so a DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.functions import hashing as H
from deepseek_ocr_api_rs_spark.functions.text import fingerprint


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-equal (post-normalization) documents: one row per
    duplicated fingerprint with the canonical (min) id and group size."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 1
) -> DataFrame:
    keys = H.keys_spark(text_col, shingle_n)
    return docs.select(
        F.col(id_col),
        F.expr(H.minhash_spark(keys)).alias("sig"),
    ).filter(F.expr(f"size({H.tokens_spark(text_col)}) >= {shingle_n}"))


def minhash_lsh_candidates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 1
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band.

    Plan shape: project signatures → posexplode band keys (BANDS rows/doc,
    a constant fan-out, NOT per-token) → shuffle on band_key → per-bucket
    self-join → distinct pairs. The join key cardinality is what bounds
    skew; a degenerate bucket (all-identical docs) is handled by AQE skew
    splitting (conf.py).
    """
    sigs = minhash_signatures(docs, id_col, text_col, shingle_n)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.expr(H.band_key_spark("sig", b)) for b in range(H.MINHASH_BANDS)])
        ).alias("band_key"),
    ).persist()  # both join sides read this — without it the signature
    # computation (the expensive part) runs twice; at scale this is a
    # materialized signature table, not a cache
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col), F.expr(H.simhash_spark(text_col)).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Scale path: block on bit-chunks (pigeonhole — with 2 chunks, any pair
    within max_hamming<=bits/2 shares at least one exact chunk), join per
    block, verify exact Hamming via bit_count(xor). Never all-pairs.
    """
    fps = simhash_fingerprints(docs, id_col, text_col)
    half = H.SIMHASH_BITS // 2
    mask_lo = (1 << half) - 1
    chunks = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.concat_ws(":", F.lit(0), (F.col("simhash") % (mask_lo + 1)).cast("string")),
                F.concat_ws(":", F.lit(1), F.expr(f"shiftright(simhash, {half})").cast("string")),
            )
        ).alias("chunk_key"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, "chunk_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_lsh_candidates_fast(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Production MinHash-LSH: same algorithm as minhash_lsh_candidates but
    hashed with JVM-native xxhash64 (whole-stage-codegen) instead of the
    cross-engine polynomial — ~10-50× faster, same recall characteristics.

    The polynomial variant exists for the DuckDB oracle (exactness);
    THIS is what a 100 TB job runs. Shingles never materialize as strings:
    each token is xxhash64'd ONCE, then n-gram shingle hashes are built
    arithmetically (rotate-xor combine — overflow-free under ANSI mode),
    and the k signature minima come from xxhash64 re-mixes of the shingle
    hash. MinHash over the multiset equals MinHash over the set, so no
    distinct pass is needed either.
    """

    def _rot(e: str, r: int) -> str:
        return f"(shiftleft({e}, {r}) | shiftrightunsigned({e}, {64 - r}))"

    toks = f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)"
    hashes = f"transform({toks}, w -> xxhash64(w))"
    # shingle hash at position i combines the n word hashes with
    # position-distinct rotations: rot(h_i, 7*(n-j)) xor ...
    combine = " ^ ".join(
        _rot(f"element_at(hs, i + {j})", (7 * (shingle_n - j)) % 63 + 1)
        for j in range(shingle_n)
    )
    sh_hashes = (
        f"transform(sequence(1, greatest(size(hs) - {shingle_n - 1}, 0)), "
        f"i -> ({combine}))"
    )
    mins = ", ".join(
        f"array_min(transform(shs, s -> xxhash64(s, {seed})))"
        for seed in range(n_hashes)
    )
    n_bands = n_hashes // rows_per_band
    sigs = (
        docs.select(F.col(id_col), F.expr(hashes).alias("hs"))
        .filter(F.size("hs") >= shingle_n)
        .select(id_col, F.expr(sh_hashes).alias("shs"))
        .select(id_col, F.expr(f"array({mins})").alias("sig"))
    )
    band_exprs = []
    for b in range(n_bands):
        lo = b * rows_per_band
        parts = ", ".join(f"sig[{lo + r}]" for r in range(rows_per_band))
        band_exprs.append(f"concat_ws(':', {b}, {parts})")
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.expr("array(" + ", ".join(band_exprs) + ")")).alias("band_key"),
    ).persist()  # see minhash_lsh_candidates — avoid double signature compute
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash_fast(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Production SimHash: explode tokens → xxhash64 per token (codegen) →
    per-bit integer vote sums in ONE hash aggregate → recompose fingerprint.

    Shuffles (doc_id, token_hash) pairs once; partial aggregation
    (map-side combine) collapses the per-bit sums before the exchange, so
    shuffle volume ≈ docs × bits ints, independent of document length.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)")
        ).alias("tok"),
    ).select(id_col, F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact word-n-gram Jaccard over shingle-sharing candidates.

    inter/union are integer counts; jaccard = inter/union is one float64
    division — engine-exact. Shuffle volume = shingle postings, bounded by
    distinct-shingle fan-out (explode AFTER array_distinct).

    Shingle identity is a 64-bit rotate-xor combine of per-token xxhash64
    (same trick as minhash_lsh_candidates_fast): postings shuffle 8-byte
    ints instead of strings. A cross-shingle hash collision would merge two
    shingles (P ≈ n²/2^65 — negligible); the DuckDB oracle uses literal
    string shingles and stays exactly equal in practice and in tests.
    """

    def _rot(e: str, r: int) -> str:
        return f"(shiftleft({e}, {r}) | shiftrightunsigned({e}, {64 - r}))"

    toks = f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)"
    hashes = f"transform({toks}, w -> xxhash64(w))"
    combine = " ^ ".join(
        _rot(f"element_at(hs, i + {j})", (7 * (n - j)) % 63 + 1) for j in range(n)
    )
    sh_hashes = (
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {n - 1}, 0)), "
        f"i -> ({combine})))"
    )
    shingled = (
        docs.select(F.col(id_col), F.expr(hashes).alias("hs"))
        .filter(F.size("hs") >= n)
        .select(F.col(id_col), F.expr(sh_hashes).alias("sh"))
        .persist()  # feeds sizes + both join sides
    )
    sizes = shingled.select(id_col, F.size("sh").alias("n_sh"))
    posts = shingled.select(id_col, F.explode("sh").alias("shingle")).persist()
    a, b = posts.alias("a"), posts.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
