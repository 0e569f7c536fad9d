"""Unit tests for the CCNet-style trigram LM quality scorer (tier-3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators import lm as LM


def test_dyadic_cost_hand_computed(spark):
    """Pin the exact dyadic NLL on a hand-countable corpus: seed 'aaaa'
    gives model {aaa: 2}, T=2 → cost of 'aaa' = length(bin(2 div 2))-1 = 0
    bits; an unseen trigram costs length(bin(2)) = 2 bits."""
    seed = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    model = LM.train_trigram_counts(seed)
    rows = {r.g: r.c for r in model.collect()}
    assert rows == {"aaa": 2}
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "zzz"), (3, "a")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_ngrams, r.sum_bits, r.bucket)
           for r in LM.score_documents(docs, model).collect()}
    assert got[1] == (2, 0, "head")          # two seen trigrams, 0 bits each
    assert got[2] == (1, 2, "head")          # one unseen trigram, 2 bits
    assert got[3] == (0, 0, "tail")          # too short for a trigram
    # mean for doc 2 is exactly 2.0 bits (single IEEE division)
    scored = {r.doc_id: r.bits_per_ngram
              for r in LM.score_documents(docs, model).collect()}
    assert scored[2] == 2.0


def test_ilog2_exact_at_powers_of_two(spark):
    """length(bin(x))-1 must equal floor(log2(x)) INCLUDING exact powers of
    two, where float log2 (ln(x)/ln(2) in Spark) can land just below the
    integer. This is the reason lm.py never uses log2()."""
    df = spark.range(1, 130).select(
        F.col("id"),
        F.expr("length(bin(id)) - 1").alias("ilog2"),
    )
    for r in df.collect():
        assert r.ilog2 == r.id.bit_length() - 1, (r.id, r.ilog2)


def test_junk_scores_worse_than_seed_text(spark):
    """A document made of seed-distribution text must cost fewer
    bits/trigram than line noise under a model trained on the seed."""
    seed_text = "the quick brown fox jumps over the lazy dog and runs away"
    seed = spark.createDataFrame(
        [(i, seed_text) for i in range(5)], "doc_id long, text string"
    )
    model = LM.train_trigram_counts(seed)
    docs = spark.createDataFrame(
        [(1, seed_text), (2, "qxz vkj wqp zzj xxk qqv jjz kkx")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bits_per_ngram
           for r in LM.score_documents(docs, model).collect()}
    assert got[1] < got[2], got


def test_dsir_prefers_target_like_docs(spark):
    """DSIR sanity: under a target model trained on English-ish seed text
    and a pool that also contains noise, the seed-like document's weight
    (bits_source − bits_target) must exceed the noise document's."""
    seed_like = "the cat sat on the mat and then the dog sat on the mat too"
    noise = "zzq wxk vvj pqz kkj zzx qqw jjv zkq xwv"
    # The pool is noise-dominated so p_source of seed trigrams is at least
    # a power of two below p_target (dyadic costs only see ×2 steps).
    docs = spark.createDataFrame(
        [(i, seed_like, "en") for i in range(4)]
        + [(10, seed_like, "de")]
        + [(100 + i, noise, "de") for i in range(15)],
        "doc_id long, text string, lang string",
    )
    from deepseek_ocr_api_rs_spark.operators.dedup import release_persisted
    from pyspark.sql import functions as F

    target = LM.train_trigram_counts(docs.filter(F.col("lang") == "en"))
    got = {r.doc_id: r.weight_bits
           for r in LM.dsir_weights(docs, target).collect()}
    release_persisted()
    assert got[10] > 0 > got[100], got
