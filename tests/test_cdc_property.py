"""Content-defined chunking properties (q_cdc_chunks' boundary rule).

The boundary predicate is a pure function of the trailing 8-char
window, so a scalar Python mirror of the exact expression can carry
the hypothesis load (hundreds of cases, no Spark job per example);
one batched Spark run then pins the mirror to the real operator's
expression on a diverse fixed set.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

W = 8
MOD = 64
POW = [31 ** (W - 1 - k) for k in range(W)]


def boundaries(s: str) -> list[int]:
    """1-based positions i ≥ W where hash(window ending at i) ≡ 0."""
    out = []
    for i in range(W, len(s) + 1):
        h = sum(ord(s[i - W + k]) * POW[k] for k in range(W))
        if h % MOD == 0:
            out.append(i)
    return out


def chunks(s: str) -> list[str]:
    b = boundaries(s)
    starts = [1] + [x + 1 for x in b]
    ends = b + [len(s)]
    return [s[a - 1 : e] for a, e in zip(starts, ends) if e >= a]


_text = st.text(alphabet=string.ascii_lowercase + " ", min_size=0,
                max_size=300)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_chunks_reassemble_exactly(s):
    assert "".join(chunks(s)) == s


@given(_text.filter(lambda s: len(s) >= 1), _text)
@settings(max_examples=300, deadline=None)
def test_interior_chunks_survive_prefix_insertion(p, s):
    """THE content-defined property (LBFS): boundaries depend only on
    the local window, so every interior chunk of s (both endpoints are
    content boundaries) reappears verbatim among the chunks of p+s —
    a fixed-size chunker has no such guarantee."""
    b = boundaries(s)
    if len(b) < 2:
        return  # no interior chunk exists
    cs = chunks(s)
    interior = cs[1:-1]
    combined = chunks(p + s)
    for c in interior:
        assert c in combined, (p, s, c)


def test_spark_expression_matches_scalar_mirror(spark):
    """The mirror above IS the operator's rule: run the entry-file
    boundary/chunk expressions over a diverse fixed batch and hold the
    chunk lists equal to the scalar implementation."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    cases = [
        "",
        "a",
        "abcdefg",           # shorter than the window
        "abcdefgh",
        "the quick brown fox jumps over the lazy dog " * 6,
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "footer host3 promo deal " * 12,
        ("mixed 123 payload with digits and  double spaces " * 4).strip(),
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "page"])
    terms = entrymod._cdc_hash_terms("cps", "i", "spark")
    bpos = (
        f"filter(if(length(page) >= {entrymod._CDC_W}, "
        f"sequence({entrymod._CDC_W}, length(page)), array()), "
        f"i -> ({terms}) % {entrymod._CDC_MOD} = 0)"
    )
    staged = df.select(
        "i",
        "page",
        F.expr(
            "transform(split(page, ''), c -> cast(ascii(c) as bigint))"
        ).alias("cps"),
    ).select("i", "page", F.expr(bpos).alias("bpos"))
    chunks_expr = (
        "filter(transform(arrays_zip("
        "concat(array(1), transform(bpos, b -> b + 1)), "
        "concat(bpos, array(length(page)))), "
        "z -> substr(page, z.`0`, z.`1` - z.`0` + 1)), c -> c <> '')"
    )
    rows = staged.select("i", F.expr(chunks_expr).alias("cs")).collect()
    got = {r.i: list(r.cs) for r in rows}
    for i, c in enumerate(cases):
        assert got[i] == [x for x in chunks(c) if x != ""], (i, c)
