"""BPE merge learning (operators/bpe.py): greedy-fold semantics, arg-max
tie-breaks, early stop, and a hand-computed merge chain. Cross-engine
value-exactness of q_bpe_merges is covered by test_queries_oracle.py."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from deepseek_ocr_api_rs_spark.operators.bpe import (
    SEP,
    _apply_merge,
    bpe_learn,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, ["word", "freq"])


def _tok_frame(spark, toks_rows):
    return spark.createDataFrame(
        [(1, SEP.join(t)) for t in toks_rows], ["freq", "toks"]
    )


def test_greedy_merge_overlap(spark):
    """'aaa' + (a,a) merges left-to-right: ['aa','a'], never ['a','aa']
    and never a chain into ['aaa']."""
    w = _tok_frame(spark, [["a", "a", "a"], ["a", "a", "a", "a"]])
    out = [
        r.toks.split(SEP)
        for r in _apply_merge(w, "a", "a").orderBy(F.length("toks")).collect()
    ]
    assert out == [["aa", "a"], ["aa", "aa"]]


def test_merge_respects_token_boundaries(spark):
    """(a,b) must match whole TOKENS: after ab is one token, (a,b) no
    longer matches inside it, and a trailing 'b' after 'ab' does not
    merge with the 'b' suffix of the merged token."""
    w = _tok_frame(spark, [["ab", "a", "b", "b"]])
    out = _apply_merge(w, "a", "b").collect()[0].toks.split(SEP)
    assert out == ["ab", "ab", "b"]


def test_single_char_word_passthrough(spark):
    w = _tok_frame(spark, [["x"]])
    assert _apply_merge(w, "a", "b").collect()[0].toks == "x"


def test_learn_hand_computed_chain(spark):
    """words: 'abab'×2, 'ab'×3. Round 1 pair counts:
    (a,b) = 2·2 + 3 = 7, (b,a) = 2. Winner (a,b). After the merge every
    word is [ab,ab] / [ab]; round 2's only pair is (ab,ab) = 2."""
    merges = bpe_learn(_words(spark, [("abab", 2), ("ab", 3)]), 3)
    assert merges == [(1, "a", "b", 7), (2, "ab", "ab", 2)]
    # round 3 has no pairs left -> early stop after 2 merges


def test_learn_tiebreak_lexicographic(spark):
    """'ab'×2 vs 'ba'×2: equal counts, (a,b) < (b,a) lexicographically."""
    merges = bpe_learn(_words(spark, [("ab", 2), ("ba", 2)]), 1)
    assert merges == [(1, "a", "b", 2)]


def test_learn_no_pairs_returns_empty(spark):
    assert bpe_learn(_words(spark, [("a", 5), ("b", 2)]), 4) == []


def test_learn_weighting_by_freq(spark):
    """Frequency outweighs raw pair multiplicity: 'cd'×10 beats the
    (a,b) pairs from 'abab'×3 (count 6 < 10)."""
    merges = bpe_learn(_words(spark, [("abab", 3), ("cd", 10)]), 1)
    assert merges == [(1, "c", "d", 10)]


def test_apply_learned_merges_in_rank_order(spark):
    """bpe_apply encodes with each merge applied globally in rank
    order: 'abab' under merges [(a,b) then (ab,ab)] collapses to ONE
    token; 'aba' gets ['ab','a']."""
    from deepseek_ocr_api_rs_spark.operators.bpe import bpe_apply

    merges = [(1, "a", "b", 0), (2, "ab", "ab", 0)]
    out = {
        r.word: (r.toks.split(SEP), r.n_tokens)
        for r in bpe_apply(
            _words(spark, [("abab", 1), ("aba", 1), ("ba", 1)]), merges
        ).collect()
    }
    assert out["abab"] == (["abab"], 1)
    assert out["aba"] == (["ab", "a"], 2)
    assert out["ba"] == (["b", "a"], 2)


def _scalar_bpe(words: dict[str, int], k: int):
    """Independent scalar reference: same counting (overlaps included),
    same (count desc, lexicographic) arg-max, same greedy apply."""
    toks = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in words.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for w in toks:
            t, out, i = toks[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges


def test_learn_matches_scalar_reference_on_random_tables(spark):
    import random

    for seed in (7, 40, 1234):
        rng = random.Random(seed)
        vocab = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7)))
            for _ in range(30)
        ]
        words = {}
        for w in vocab:
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        expected = _scalar_bpe(dict(words), 6)
        got = bpe_learn(_words(spark, list(words.items())), 6)
        assert got == expected, (seed, got, expected)
