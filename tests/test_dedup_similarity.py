"""Unit tests for the dedup + similarity operator families (tier-3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators import dedup as D
from deepseek_ocr_api_rs_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_duplicates_finds_planted(spark, docs):
    base = docs.select("doc_id", "text")
    copy = base.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    groups = D.exact_duplicates(base.unionAll(copy)).collect()
    n_docs = base.count()
    assert len(groups) == n_docs
    assert all(g.n_dups == 2 for g in groups)
    # canonical id is always the lower (original) one
    assert all(g.canonical_id < 10_000 for g in groups)


def test_exact_duplicates_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    groups = D.exact_duplicates(df).collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 1 and groups[0].n_dups == 2


def test_minhash_lsh_finds_near_duplicate(spark, docs):
    """A doc and a lightly-perturbed copy must be LSH candidates (both the
    oracle-exact polynomial variant and the fast xxhash64 variant)."""
    row = docs.orderBy("doc_id").first()
    words = row.text.split()
    perturbed = " ".join(words[:-2]) if len(words) > 10 else row.text
    extra = spark.createDataFrame(
        [(99_999, perturbed)], "doc_id long, text string"
    )
    both = docs.select("doc_id", "text").unionAll(extra)
    for fn in (D.minhash_lsh_candidates, D.minhash_lsh_candidates_fast):
        pairs = fn(both, shingle_n=3).filter(
            (F.col("id_b") == 99_999) & (F.col("id_a") == row.doc_id)
        )
        assert pairs.count() == 1, fn.__name__


def test_simhash_variants_close_on_near_dup(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    c = "completely unrelated words about database partitioning strategies"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    for fn in (D.simhash_fingerprints, D.simhash_fast):
        fps = {r.doc_id: r.simhash for r in fn(df).collect()}
        ham_ab = bin(fps[1] ^ fps[2]).count("1")
        ham_ac = bin(fps[1] ^ fps[3]).count("1")
        assert ham_ab < ham_ac, (fn.__name__, ham_ab, ham_ac)


def test_simhash_near_pairs_pigeonhole(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "totally different content here about nothing"),
        ],
        "doc_id long, text string",
    )
    pairs = D.simhash_near_pairs(df, max_hamming=8).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    # 3-gram shingles: {abc,bcd,cde} vs {abc,bcd,cdf} → inter 2, union 4
    rows = D.ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == 0.5


def test_topk_cosine_variants_agree(spark, vecs):
    q = [float(x) for x in vecs.filter("vec_id = 0").first().embedding]
    rest = vecs.filter("vec_id != 0")
    exact = S.topk_cosine(rest, q, k=10).collect()
    pand = S.topk_cosine_pandas(rest, q, k=10).collect()
    assert [r.vec_id for r in exact] == [r.vec_id for r in pand]
    for a, b in zip(exact, pand):
        assert abs(a.cosine - b.cosine) < 1e-9


def test_ann_bucket_contains_self_neighbors(spark, vecs):
    """LSH top-k must return the query bucket's true neighbors (subset of
    exact top-k by construction of the filter + same scoring)."""
    q = [float(x) for x in vecs.filter("vec_id = 0").first().embedding]
    ann = S.ann_lsh_topk(vecs.filter("vec_id != 0"), q, k=5)
    exact = {r.vec_id: r.cosine for r in S.cosine_to_query(vecs.filter("vec_id != 0"), q).collect()}
    for r in ann.collect():
        assert abs(exact[r.vec_id] - r.cosine) < 1e-6


def test_near_dup_lsh_recall_on_planted_dups(spark, vecs):
    """Plant exact duplicates (cosine 1.0) — multi-table SRP must recall
    100% of them (identical vectors share every bucket)."""
    dup = vecs.limit(20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    aug = vecs.select("vec_id", "embedding").unionAll(dup)
    pairs = S.embedding_near_dup_lsh(aug, threshold=0.999)
    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a")) == 100_000
    ).count()
    assert planted == 20


def test_connected_components_vs_union_find(spark):
    """Iterative Spark label propagation == scalar union-find on the same
    pair set (the D2 slow-path cross-check discipline)."""
    from deepseek_ocr_api_rs_spark.operators.sessions import connected_components

    pairs = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 20), (30, 31)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {x: find(x) for x in parent}
    assert got == expected


def test_sessionize_gap_boundaries(spark):
    from deepseek_ocr_api_rs_spark.operators.sessions import sessionize

    rows = [
        (1, 100, "2024-01-01 10:00:00", 1.0),
        (2, 100, "2024-01-01 10:10:00", 1.0),   # same session (10 min)
        (3, 100, "2024-01-01 11:30:00", 1.0),   # new session (80 min gap)
        (4, 200, "2024-01-01 10:05:00", 1.0),   # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r.event_id: r.session_seq for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_ivf_topk_recall(spark, vecs):
    """IVF with nprobe=6/16 must recover most of the exact top-10 (and all
    of the top hits that live in probed lists — scores are exact)."""
    q = [float(x) for x in vecs.filter("vec_id = 0").first().embedding]
    rest = vecs.filter("vec_id != 0")
    exact = [r.vec_id for r in S.topk_cosine(rest, q, k=10).collect()]
    approx = [r.vec_id for r in S.ivf_topk(rest, q, k=10, nprobe=6).collect()]
    overlap = len(set(exact) & set(approx))
    assert overlap >= 5, (exact, approx)
    # scores of returned ids are exact (same cosine arithmetic)
    ex = {r.vec_id: r.cosine for r in S.cosine_to_query(rest, q).collect()}
    for r in S.ivf_topk(rest, q, k=10, nprobe=6).collect():
        assert abs(ex[r.vec_id] - r.cosine) < 1e-5


def test_ivf_assignment_partitions_corpus(spark, vecs):
    assigned = S.ivf_assign(vecs.select("vec_id", "embedding"))
    counts = assigned.groupBy("centroid").count().collect()
    assert sum(r["count"] for r in counts) == vecs.count()
    assert len(counts) > 4  # corpus spreads over many inverted lists


# ---------------------------------------------------------------------------
# round-2: document-frequency caps, pigeonhole recall, persist lifecycle


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """One shingle shared by ALL docs must not go quadratic: with the df cap
    it contributes zero candidate pairs, while normal near-dup pairs keep
    their exact jaccard values."""
    hot = "common boiler plate"  # one trigram shared by every doc
    rows = [(i, f"{hot} unique{i} filler{i} tail{i}") for i in range(50)]
    # plant one real near-dup pair sharing most shingles
    rows.append((100, f"{hot} unique1 filler1 shared tail"))
    rows.append((101, f"{hot} unique1 filler1 shared tails"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.ngram_jaccard_pairs(df, n=3, threshold=0.3, df_cap=10)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    D.unpersist_deps(pairs)
    # the hot shingle alone (jaccard would be tiny anyway) created no pairs;
    # the planted pair survives via its non-hot shared shingles
    assert (100, 101) in got
    assert all(a in (1, 100) or a >= 100 for (a, b) in got), got
    # exactness: values computed over FULL shingle sets, not the capped join
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            df, n=3, threshold=0.3, df_cap=None
        ).collect()
    }
    assert got[(100, 101)] == uncapped[(100, 101)]


def test_minhash_band_cap_bounds_degenerate_bucket(spark):
    """All-identical docs put every doc in the same band buckets; the cap
    must drop those buckets instead of emitting k(k-1)/2 pairs."""
    same = "identical text repeated in every single document here"
    rows = [(i, same) for i in range(40)]
    rows += [(1000, "a distinct document about something else entirely okay"),
             (1001, "a distinct document about something else entirely fine")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = D.minhash_lsh_candidates_fast(df, shingle_n=3, band_cap=10)
    n_capped = capped.count()
    D.unpersist_deps(capped)
    # 40 identical docs would alone emit 780 pairs uncapped
    assert n_capped < 50
    # the normal near-dup pair is still found
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates_fast(df, shingle_n=3, band_cap=10)
        .filter(F.col("id_a") == 1000).collect()
    }
    assert (1000, 1001) in found


def test_simhash_near_pairs_cross_chunk_recall(spark):
    """Pigeonhole with max_hamming+1 chunks: recall holds even when the
    differing bits split across BOTH halves of the fingerprint (the 2-chunk
    layout silently dropped these)."""
    from deepseek_ocr_api_rs_spark.functions import hashing as H

    fps = {1: 0b000000000000000000000000}
    # flip 3 bits spread across the word: 2 in the low half, 1 in the high
    fps[2] = fps[1] ^ (1 << 2) ^ (1 << 5) ^ (1 << 20)
    df = spark.createDataFrame(
        [(k, int(v)) for k, v in fps.items()], "doc_id long, simhash long"
    )
    # drive simhash_near_pairs' blocking directly on planted fingerprints
    import deepseek_ocr_api_rs_spark.operators.dedup as dedup_mod

    orig = dedup_mod.simhash_fingerprints
    try:
        dedup_mod.simhash_fingerprints = lambda d, id_col="doc_id", text_col="text": d
        pairs = dedup_mod.simhash_near_pairs(
            df, max_hamming=3, text_col="simhash"
        ).collect()
    finally:
        dedup_mod.simhash_fingerprints = orig
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    assert pairs[0].hamming == 3


def test_embedding_near_dup_pairs_refuses_large_input(spark, vecs):
    with pytest.raises(ValueError, match="all-pairs oracle baseline"):
        S.embedding_near_dup_pairs(vecs, max_rows=10)


def test_unpersist_deps_releases_cache(spark, docs):
    pairs = D.minhash_lsh_candidates_fast(docs.select("doc_id", "text"))
    pairs.count()
    deps = getattr(pairs, "_persisted_deps", [])
    assert deps, "operator should expose its persisted intermediates"
    assert any(d.storageLevel.useMemory for d in deps)
    D.unpersist_deps(pairs)
    assert all(not d.storageLevel.useMemory for d in deps)


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 600-node chain has diameter 599: one-hop propagation would need
    ~600 rounds; pointer jumping must converge within max_iter=25 (O(log d))
    and label every node with the chain head."""
    from deepseek_ocr_api_rs_spark.operators.sessions import connected_components

    n = 600
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    ).coalesce(4)
    got = {r.id: r.component for r in connected_components(df, max_iter=25).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {0}


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    """``checkpoint_dir`` switches the lineage cut from localCheckpoint to
    fault-tolerant ``checkpoint()``: labels identical to the default path,
    checkpoint files actually land in the given directory (proof the cut
    happened through the reliable path), and the returned frame's plan is
    checkpoint-rooted (lineage cut)."""
    import os

    from deepseek_ocr_api_rs_spark.operators.sessions import connected_components

    n = 200
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    ).coalesce(4)
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        r.id: r.component
        for r in connected_components(
            df, max_iter=25, checkpoint_every=2, checkpoint_dir=ckpt
        ).collect()
    }
    base = {r.id: r.component for r in connected_components(df, max_iter=25).collect()}
    assert got == base
    assert set(got.values()) == {0}
    # reliable checkpoint materialized state under the requested dir
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
    ]
    assert files, "checkpoint() should have written blocks under checkpoint_dir"


def test_connected_components_raises_on_non_convergence(spark):
    from deepseek_ocr_api_rs_spark.operators.sessions import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, strict=True)
    # non-strict returns partial labels with a warning instead
    partial = connected_components(df, max_iter=2, strict=False)
    assert partial.count() == 65


def test_connected_components_scoped_shuffle_partitions(spark):
    """``shuffle_partitions`` scopes the per-round iteration shuffles to the
    pair-graph cardinality (the q_canonical_docs 161 s fix): labels must be
    identical to the default path, and the session conf must be restored
    after the call (the scope is a contextmanager, not a leak)."""
    from deepseek_ocr_api_rs_spark.operators.sessions import connected_components

    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(300)] + [(1000 + i, 1000 + i + 1) for i in range(50)],
        "id_a long, id_b long",
    ).coalesce(4)
    base = {r.id: r.component for r in connected_components(df, max_iter=25).collect()}
    got = {
        r.id: r.component
        for r in connected_components(
            df, max_iter=25, shuffle_partitions=4
        ).collect()
    }
    assert got == base
    assert set(got.values()) == {0, 1000}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_kmv_estimate_accuracy(spark):
    """KMV with k=64 over 1000 planted distinct ids: the estimator must land
    within the ~1/sqrt(k) error band (deterministic — pinned mix hash)."""
    import __spark_entry__ as entrymod

    rows = [(i % 1000, "view", i) for i in range(3000)]  # dupes collapse
    df = spark.createDataFrame(rows, "user_id long, event_type string, event_id long")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = entrymod.q_kmv_distinct_users(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_exact == 1000
    assert abs(r.kmv_estimate - 1000) / 1000 < 0.35, r.kmv_estimate


def test_asof_join_semantics(spark):
    """Point-in-time correctness: inclusive ts match, max-tiebreak on equal
    timestamps, null when no right row precedes, per-key isolation."""
    from deepseek_ocr_api_rs_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, 1000), (1, 50, 1001), (1, 10, 1002), (2, 100, 2000)],
        "user_id long, ts long, event_id long",
    )
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 50, 9), (1, 80, 3), (2, 500, 5)],
        "user_id long, ts long, click_id long",
    )
    out = {
        r.event_id: r.click_id
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_payload=["click_id"], tiebreak="click_id",
        ).collect()
    }
    assert out[1000] == 3      # latest ts <= 100
    assert out[1001] == 9      # inclusive equal-ts match, max tiebreak wins
    assert out[1002] is None   # nothing at or before ts=10
    assert out[2000] is None   # other user's clicks are all later


def test_pq_topk_recall(spark, vecs):
    """PQ+ADC with exact rerank: recall@10 vs brute force stays high even
    with untrained (pinned random) codebooks; an exact corpus vector used as
    the query must return itself at rank 1 (rerank is exact cosine)."""
    base = vecs.filter("vec_id != 0")
    q = [float(v) for v in vecs.filter("vec_id = 5").first().embedding]
    exact = [r.vec_id for r in S.topk_cosine(base, q, k=10).collect()]
    got = S.pq_topk(base, q, k=10, rerank=100).collect()
    recall = len({r.vec_id for r in got} & set(exact)) / 10
    assert recall >= 0.7, recall
    assert got[0].vec_id == 5 and got[0].cosine == 1.0


def test_pq_encode_shape_and_determinism(spark, vecs):
    rows = S.pq_encode(vecs.limit(20)).collect()
    again = {r.vec_id: r.pq_code for r in S.pq_encode(vecs.limit(20)).collect()}
    for r in rows:
        assert len(r.pq_code) == 16
        assert all(0 <= c < 256 for c in r.pq_code)
        assert again[r.vec_id] == r.pq_code


def test_trained_quantizers_beat_or_tie_fixed(spark):
    """Deterministic k-means training (pinned sample, pinned init) must not
    hurt recall vs the untrained pinned tables — and PQ must reach 1.0 on
    the test corpus. Also pins rerun-determinism of the trained tables."""
    import numpy as np
    import pyspark.sql.functions as F

    import deepseek_ocr_api_rs_spark.operators.similarity as S

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    vecs = emb.filter(F.col("vec_id") != 0)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    exact = {r.vec_id for r in S.topk_cosine(vecs, qv, k=10).collect()}

    Ct = S.train_ivf_centroids(vecs)
    Ct2 = S.train_ivf_centroids(vecs)
    assert (Ct == Ct2).all(), "training must be deterministic"
    Bt = S.train_pq_codebooks(vecs)

    def recall(df):
        return len({r.vec_id for r in df.collect()} & exact) / 10

    ivf_fixed = recall(S.ivf_topk(vecs, qv, k=10, nprobe=6))
    ivf_trained = recall(S.ivf_topk(vecs, qv, k=10, nprobe=6, centroids=Ct))
    assert ivf_trained >= ivf_fixed, (ivf_trained, ivf_fixed)

    pq_fixed = recall(S.pq_topk(vecs, qv, k=10, rerank=100))
    pq_trained = recall(S.pq_topk(vecs, qv, k=10, rerank=100, codebooks=Bt))
    assert pq_trained >= pq_fixed, (pq_trained, pq_fixed)
    assert pq_trained == 1.0, pq_trained


def test_duplicated_spans_hand_case(spark):
    """Exact-substring span semantics on a hand-built corpus: a shared
    sentence yields one maximal span per holder covering exactly the shared
    tokens; unique text yields no span; within-doc repetition counts; and
    overlapping duplicated windows merge into ONE island."""
    from deepseek_ocr_api_rs_spark.operators.dedup import (
        duplicated_spans,
        release_persisted,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {shared} delta epsilon"),
            (2, f"{shared} zeta eta theta iota kappa"),
            (3, "totally unique words nobody else repeats anywhere at all"),
            # within-doc repeat: same 5-gram twice, non-adjacent
            (4, "one two three four five STOP filler words here one two three four five"),
        ],
        "doc_id int, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(docs, k=5).collect()
    }
    release_persisted()
    # doc 1: shared tokens occupy positions 4..13 (1-based); doc 2: 1..10.
    # doc 4: "one two three four five" at 1..5 and 10..14 — starts 1 and 10,
    # gap 9 > k=5, so TWO spans (the repeat itself is the duplication).
    assert got == {
        (1, 4, 13, 10),
        (2, 1, 10, 10),
        (4, 1, 5, 5),
        (4, 10, 14, 5),
    }, got


def test_bloom_frontier_properties(spark):
    """Bloom frontier: NO false negatives ever (every crawled url probes
    true — the structural guarantee), the words table is bounded by
    m_bits/32 rows, rebuild is deterministic, and the q_url_frontier
    false-positive column matches a pure-Python recompute of the same
    pinned hashes."""
    import pyspark.sql.functions as F

    from deepseek_ocr_api_rs_spark.operators import frontier as FR

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    crawled = docs.select(
        F.concat(F.lit("https://synth.example.org/doc/"), F.col("doc_id")).alias("url")
    )
    bloom = FR.build_bloom(crawled, m_bits=4096).persist()
    words = {r.word: r.bits for r in bloom.collect()}
    assert len(words) <= 4096 // 32
    words2 = {r.word: r.bits for r in FR.build_bloom(crawled, m_bits=4096).collect()}
    assert words == words2, "bloom build must be deterministic"

    hits = FR.bloom_probe(crawled, bloom, m_bits=4096)
    n_crawled = crawled.count()
    assert hits.filter(F.col("bloom_hit")).count() == n_crawled, "false negative!"

    # pure-Python recompute of probe verdicts for the novel urls
    novel = docs.select(
        F.concat(F.lit("https://synth.example.org/doc/new-"), F.col("doc_id")).alias("url")
    )
    got = {r.url: r.bloom_hit for r in FR.bloom_probe(novel, bloom, m_bits=4096).collect()}
    bloom.unpersist()
    from deepseek_ocr_api_rs_spark.functions.hashing import KEY_INIT, KEY_MULT, P

    def k_(s):
        acc = KEY_INIT
        for ch in s:
            acc = (acc * KEY_MULT + ord(ch)) % P
        return acc

    for url, hit in got.items():
        expect = all(
            words.get((((a * k_(url) + b) % P) % 4096) >> 5, 0)
            & (1 << ((((a * k_(url) + b) % P) % 4096) & 31))
            for a, b in FR.BLOOM_PARAMS
        )
        assert hit == expect, url
    assert sum(got.values()) > 0, "undersized filter should show real FPs"


def test_frontier_key_empty_url_cross_engine(spark):
    """ADVICE r7: Spark's sequence(1, 0) is the DESCENDING [1, 0] — the
    unguarded fold accumulated ascii('')=0 twice for an empty url while
    DuckDB's range(1, 1) is empty (key = KEY_INIT). The guard makes both
    engines return KEY_INIT for ''. Non-empty keys must be untouched."""
    import duckdb
    import pyspark.sql.functions as F

    from deepseek_ocr_api_rs_spark.operators import frontier as FR
    from deepseek_ocr_api_rs_spark.functions.hashing import KEY_INIT, KEY_MULT, P

    urls = ["", "a", "https://x.example/p?q=1"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = {
        r.url: r.k
        for r in df.select("url", F.expr(FR._key_spark("url")).alias("k")).collect()
    }
    con = duckdb.connect()
    got_duck = {
        u: con.execute(
            f"select {FR._key_duckdb('url')} from (select ? as url)", [u]
        ).fetchone()[0]
        for u in urls
    }
    def k_(s):
        acc = KEY_INIT
        for ch in s:
            acc = (acc * KEY_MULT + ord(ch)) % P
        return acc
    for u in urls:
        assert got_spark[u] == got_duck[u] == k_(u), u
    assert got_spark[""] == KEY_INIT


def test_semdedup_planted_duplicates_and_keep_rule(spark):
    """SemDeDup (r8): planted exact-duplicate embeddings land in one
    component and exactly one survives; the survivor is the group member
    with the LOWEST cosine to its cluster centroid (ties by id); vectors
    with no semantic twin keep themselves."""
    import numpy as np

    from deepseek_ocr_api_rs_spark.operators.similarity import semdedup

    rng_free = []
    # 18 distinct singletons (the vector formula has period 19 in i —
    # staying inside one period keeps them pairwise non-identical)
    for i in range(1, 19):
        v = [((i * 37 + j * 11) % 19) - 9.0 for j in range(8)]
        rng_free.append((i, [float(x) for x in v]))
    # plant a duplicate trio: ids 101/102/103 share one direction
    base = [1.0, 2.0, -1.0, 0.5, 0.0, 3.0, -2.0, 1.5]
    for i in (101, 102, 103):
        rng_free.append((i, [float(x) for x in base]))
    df = spark.createDataFrame(rng_free, "vec_id long, embedding array<float>")
    out = semdedup(df, threshold=0.999, dim=8, n_centroids=4).collect()
    rows = {r.vec_id: r for r in out}
    assert len(rows) == 21
    trio = [rows[i] for i in (101, 102, 103)]
    assert len({r.component for r in trio}) == 1
    assert sum(r.keep for r in trio) == 1
    # identical cos_centroid → tie broken by lowest id
    assert rows[101].keep == 1
    singles = [r for i, r in rows.items() if i <= 18]
    assert all(r.keep == 1 for r in singles)


def test_semdedup_plan_broadcast_and_no_all_pairs(spark):
    """Scale-shape assertions (VERDICT r7 #7 'Done' criteria): the
    centroid-score join is a BROADCAST hash join (16-row table), and the
    within-cluster pair join is a hash join keyed on the cluster id —
    the plan contains NO cartesian/nested-loop product anywhere."""
    from deepseek_ocr_api_rs_spark.operators.similarity import semdedup
    from deepseek_ocr_api_rs_spark.plans.explain import physical_plan

    rows = [
        (i, [float(((i * 31 + j * 7) % 17) - 8) for j in range(8)])
        for i in range(1, 60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, threshold=0.95, dim=8, n_centroids=4)
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
