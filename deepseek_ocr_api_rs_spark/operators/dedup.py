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

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.functions import hashing as H
from deepseek_ocr_api_rs_spark.functions.text import fingerprint

_LOG = logging.getLogger(__name__)

# Max docs sharing one bucket key (band / bit-chunk / shingle) before the key
# is dropped from candidate generation. A key shared by k docs emits k(k-1)/2
# pairs, so one degenerate key (an all-sites boilerplate shingle, an
# all-zeros band) goes quadratic; AQE skew-split redistributes the work but
# cannot shrink the pair count. Dropping hyper-frequent keys is standard
# MinHash-LSH practice (they carry ~no discriminating information) and is
# logged, never silent.
DEFAULT_KEY_CAP = 256


# When more hot keys than this exist, the broadcast anti-join falls back to
# a shuffle anti-join (a corpus where >100k distinct keys each hit >cap docs
# is pathological, but the fallback keeps it correct rather than OOMing the
# driver with the broadcast table).
_HOT_KEY_BROADCAST_LIMIT = 100_000


def _cap_hot_keys(
    df: DataFrame, key_col: str, cap: int | None, label: str
) -> DataFrame:
    """Drop rows whose key's document frequency exceeds ``cap``.

    Hot keys are FEW by construction (each exceeds cap docs), so the drop is
    a broadcast LEFT ANTI join — map-side, no shuffle of the postings. The
    single count action doubles as the log line: the repo's no-silent-caps
    rule. ``df`` must already be persisted by the caller (it is, at every
    call site) so the counting pass doesn't recompute the pipeline.

    EAGER ACTION NOTE: that count() runs at DataFrame-CONSTRUCTION time, so
    merely building a capped operator (minhash_lsh_candidates /
    simhash_near_pairs / ngram_jaccard_pairs) triggers Spark jobs and
    registers persists in _LIVE_PERSISTS until release_persisted() /
    unpersist_deps() is called. Callers that construct plans they may never
    execute should be aware they still pay this pass; the repo's own
    terminal paths (gate, bench, tests) always execute-then-release.
    """
    if cap is None:
        return df
    hot = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select(key_col)
        .persist()
    )
    n_hot = hot.count()
    if n_hot == 0:
        hot.unpersist()
        return df
    _LOG.warning(
        "%s: dropping %d hot %s key(s) with document frequency > %d "
        "from candidate generation", label, n_hot, key_col, cap
    )
    _LIVE_PERSISTS.append(hot)
    if n_hot <= _HOT_KEY_BROADCAST_LIMIT:
        return df.join(F.broadcast(hot), key_col, "left_anti")
    return df.join(hot, key_col, "left_anti")


# Every frame an operator persists is also registered here, because callers
# usually hold a WRAPPER (e.g. operator_result.orderBy(...)) that no longer
# carries the attribute. Long-lived sessions (driver gate, bench loop) call
# release_persisted() after each terminal action.
#
# SINGLE-THREADED ASSUMPTION (documented, relied upon): this registry is
# module-global and shared across all queries in a session. It is correct
# for the sequential build-run-release pattern the driver gate / bench /
# pytest use; if two queries ever interleave on one session, a
# release_persisted() issued after query A would also yank persists query B
# still needs (B then silently recomputes — correct, but the cache win is
# lost). Concurrent callers should use unpersist_deps(df) per result frame
# instead of the global release.
_LIVE_PERSISTS: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df.persist()
    _LIVE_PERSISTS.append(df)
    return df


def release_persisted() -> None:
    """Unpersist every operator-persisted intermediate registered since the
    last call. Safe to call repeatedly; no-op when nothing is live."""
    while _LIVE_PERSISTS:
        _LIVE_PERSISTS.pop().unpersist()


def unpersist_deps(df: DataFrame) -> None:
    """Release intermediate frames an operator persisted while building
    ``df`` (attached as ``df._persisted_deps``). For wrappers that lost the
    attribute, use ``release_persisted()``."""
    for dep in getattr(df, "_persisted_deps", []):
        dep.unpersist()
        try:
            _LIVE_PERSISTS.remove(dep)
        except ValueError:
            pass


def _with_deps(df: DataFrame, *deps: DataFrame) -> DataFrame:
    df._persisted_deps = list(deps)
    return df


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
    # Staged projections: tokenize ONCE, shingle ONCE, key ONCE, then take
    # the k per-hash minima from the bound key column. The single-select
    # form inlined the whole token→shingle→key chain into every one of the
    # k array_min expressions (Spark's subexpression elimination does not
    # reach through nested lambda functions), so each document paid the
    # regexp + polynomial-key work k times. CollapseProject keeps
    # multi-referenced non-cheap aliases un-inlined, so the stages survive
    # optimization as one codegen'd pipeline (~5× faster, values
    # identical — same expressions, evaluated once).
    toks = f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)"
    if shingle_n == 1:
        sh = "array_distinct(__mh_toks)"
    else:
        sh = (
            f"array_distinct(transform(sequence(1, "
            f"greatest(size(__mh_toks) - {shingle_n - 1}, 0)), "
            f"i -> array_join(slice(__mh_toks, i, {shingle_n}), ' ')))"
        )
    mins = ", ".join(
        f"array_min(transform(__mh_keys, k -> ({a} * k + {b}) % {H.P}))"
        for a, b in H.MINHASH_PARAMS
    )
    return (
        docs.select(F.col(id_col), F.expr(toks).alias("__mh_toks"))
        .filter(F.expr(f"size(array_distinct(__mh_toks)) >= {shingle_n}"))
        .select(id_col, F.expr(sh).alias("__mh_sh"))
        .select(
            id_col,
            F.expr(f"transform(__mh_sh, w -> {H.word_key_spark('w')})").alias(
                "__mh_keys"
            ),
        )
        .select(id_col, F.expr(f"array({mins})").alias("sig"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
    band_cap: int | None = DEFAULT_KEY_CAP,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band.

    Plan shape: project signatures → posexplode band keys (BANDS rows/doc,
    a constant fan-out, NOT per-token) → shuffle on band_key → per-bucket
    self-join → distinct pairs. Degenerate bands (one key shared by ≫cap
    docs — quadratic pair blow-up no AQE split can shrink) are dropped and
    logged via ``band_cap``; pass None to disable.

    Caller note: the band table is persisted (both join sides read it);
    call ``unpersist_deps(result)`` after the terminal action in long-lived
    sessions.
    """
    sigs = minhash_signatures(docs, id_col, text_col, shingle_n)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.expr(H.band_key_spark("sig", b)) for b in range(H.MINHASH_BANDS)])
        ).alias("band_key"),
    )
    bands = _persist(bands)  # both join sides read this — without it the signature
    # computation (the expensive part) runs twice; at scale this is a
    # materialized signature table, not a cache
    capped = _cap_hot_keys(bands, "band_key", band_cap, "minhash_lsh_candidates")
    a = capped.alias("a")
    b = capped.alias("b")
    out = (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return _with_deps(out, bands)


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    # Same staging trick as minhash_signatures: compute the polynomial word
    # keys ONCE into a bound column, then run the 24 per-bit vote
    # aggregates over it — the single-expression form re-keyed every token
    # 24 times (once per fingerprint bit).
    toks = f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)"
    bits = " + ".join(
        f"(case when aggregate(__sh_keys, cast(0 as bigint), "
        f"(acc, k) -> acc + ((shiftright(k, {j}) & 1) * 2 - 1)) > 0 "
        f"then cast({1 << j} as bigint) else 0 end)"
        for j in range(H.SIMHASH_BITS)
    )
    return (
        docs.select(F.col(id_col), F.expr(toks).alias("__sh_toks"))
        .select(
            id_col,
            F.expr(
                f"transform(__sh_toks, w -> {H.word_key_spark('w')})"
            ).alias("__sh_keys"),
        )
        .select(id_col, F.expr(f"({bits})").alias("simhash"))
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_cap: int | None = DEFAULT_KEY_CAP,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. FULL recall, never
    all-pairs.

    Scale path: split the fingerprint into ``max_hamming + 1`` bit-chunks —
    by pigeonhole, any pair within max_hamming differing bits leaves at
    least one chunk untouched, so blocking on exact-chunk matches misses
    nothing (n_chunks must EXCEED max_hamming; two halves only guarantee
    Hamming ≤ 1). Join per chunk bucket, verify exact Hamming via
    bit_count(xor). Hot chunk buckets (≫cap docs) are dropped and logged
    via ``chunk_cap`` (recall caveat applies only to members of dropped
    buckets; pass None to disable).
    """
    n_chunks = max_hamming + 1
    if n_chunks > H.SIMHASH_BITS:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_chunks} chunks but the "
            f"fingerprint has only {H.SIMHASH_BITS} bits"
        )
    fps = _persist(simhash_fingerprints(docs, id_col, text_col))
    base, rem = divmod(H.SIMHASH_BITS, n_chunks)
    chunk_exprs = []
    off = 0
    for i in range(n_chunks):
        size = base + (1 if i < rem else 0)
        mask = (1 << size) - 1
        chunk_exprs.append(
            F.concat_ws(
                ":",
                F.lit(i),
                F.expr(f"shiftrightunsigned(simhash, {off}) & {mask}").cast("string"),
            )
        )
        off += size
    chunks = fps.select(
        id_col,
        "simhash",
        F.explode(F.array(*chunk_exprs)).alias("chunk_key"),
    )
    capped = _cap_hot_keys(chunks, "chunk_key", chunk_cap, "simhash_near_pairs")
    a, b = capped.alias("a"), capped.alias("b")
    out = (
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
    return _with_deps(out, fps)


def minhash_lsh_candidates_fast(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 8,
    rows_per_band: int = 2,
    band_cap: int | None = DEFAULT_KEY_CAP,
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
    )
    bands = _persist(bands)  # see minhash_lsh_candidates — avoid double signature compute
    capped = _cap_hot_keys(bands, "band_key", band_cap, "minhash_lsh_candidates_fast")
    a, b = capped.alias("a"), capped.alias("b")
    out = (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return _with_deps(out, bands)


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
    df_cap: int | None = DEFAULT_KEY_CAP,
) -> DataFrame:
    """Exact word-n-gram Jaccard over shingle-sharing candidates.

    inter/union are integer counts; jaccard = inter/union is one float64
    division — engine-exact. Shuffle volume = shingle postings, bounded by
    distinct-shingle fan-out (explode AFTER array_distinct). Hyper-frequent
    shingles (document frequency > ``df_cap`` — boilerplate trigrams shared
    by a large fraction of a web corpus, whose postings self-join is
    O(df²)) are dropped from CANDIDATE GENERATION only and logged; the
    Jaccard numerator/denominator still count every shingle, so reported
    values stay exact — only pairs connected SOLELY by dropped shingles are
    missed. Pass df_cap=None for the oracle-exact all-shingles behavior.

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
    )
    shingled = _persist(shingled)  # feeds candidate postings + the exact-verify joins
    posts = _persist(shingled.select(id_col, F.explode("sh").alias("shingle")))
    capped = _cap_hot_keys(posts, "shingle", df_cap, "ngram_jaccard_pairs")
    if capped is posts:
        # no key exceeded the cap (or cap disabled) → capped == exact, so
        # the single-pass layout applies: intersection counts fall straight
        # out of the postings self-join groupBy, no second verify pass
        sizes = shingled.select(id_col, F.size("sh").alias("n_sh"))
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
        out = (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
        return _with_deps(out, shingled, posts)
    # hot shingles were dropped: candidate pairs come from the CAPPED
    # postings, but jaccard is verified against the FULL shingle sets
    # (array_intersect), so reported values stay exact — only pairs
    # connected SOLELY by dropped shingles are missed
    a, b = capped.alias("a"), capped.alias("b")
    candidates = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = shingled.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    out = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return _with_deps(out, shingled, posts)


# ---------------------------------------------------------------------------
# Exact-substring span dedup (maximal duplicated token spans)

def duplicated_spans(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Maximal duplicated token spans per document — the exact-substring
    dedup output (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): every token range covered by a word ``k``-gram that
    occurs ≥2 times in the corpus (cross-document OR repeated within one
    document), with overlapping/adjacent duplicated windows merged into one
    maximal span. Unlike :func:`__spark_entry__.q_dup_passages` (which only
    COUNTS duplicated windows) this yields the actual ``[start, end]``
    token ranges a scrubbing pass would cut.

    Plan (never all-pairs, no Python):
      1. one projection explodes positioned k-gram windows (pos 1-based);
      2. one hash-agg counts occurrences per shingle (map-side combine);
      3. one semi join keeps positions whose shingle is duplicated —
         semi join never multiplies rows, so a boilerplate shingle shared
         by 10^6 docs still emits one row per position, not pairs;
      4. islands-and-gaps per doc: a window over (doc, pos) starts a new
         span when the previous duplicated window cannot touch this one
         (pos - prev > k), then min/max per island.

    The shingle join key is the raw k-gram string — EXACT semantics (no
    hash collisions can mark a false span). At 10^12 docs the key would be
    a 128-bit content hash to narrow the shuffle; 31-bit hashes (the pinned
    cross-engine family) collide at corpus scale, so exactness here keeps
    the string. Reference analogue: the no-repeat-ngram history map,
    crates/core/src/sampling.rs:132-149, restated corpus-wide.

    Returns one row per maximal span: (doc_id, span_start, span_end,
    span_tokens), token positions 1-based inclusive.
    """
    from pyspark.sql.window import Window

    toks = f"regexp_extract_all(lower({text_col}), '{H.TOKEN_REGEX}', 0)"
    windows = (
        f"transform(sequence(1, greatest(size({toks}) - {k - 1}, 0)), "
        f"i -> struct(i as pos, array_join(slice({toks}, i, {k}), ' ') as s))"
    )
    positioned = _persist(
        docs.select(F.col(id_col), F.explode(F.expr(windows)).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.s").alias("s"))
    )
    dup_keys = positioned.groupBy("s").agg(F.count("*").alias("n")).filter(
        F.col("n") >= 2
    )
    marked = positioned.join(dup_keys.select("s"), "s", "left_semi")
    win = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        marked.withColumn("prev", F.lag("pos").over(win))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_span").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )
    return _with_deps(spans, positioned)
