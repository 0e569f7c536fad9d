"""Similarity search over embedding columns (array<float>).

- brute-force cosine: F.aggregate/zip_with dot products — JVM-side, exact,
  the correctness baseline (and the verify stage for ANN);
- LSH-bucketed ANN (sign-random-projection): the scale path — buckets
  computed in one projection, candidate search touches one bucket (± probes)
  instead of the full corpus.

Float discipline: all arithmetic promoted to float64, accumulation in array
order (F.aggregate folds left-to-right; DuckDB list functions likewise), so
the DuckDB oracle matches bitwise; query layers round for cushion anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def cosine_to_query(
    vecs: DataFrame, query_vec: list[float], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Similarity of every row to one query vector (broadcast as a literal
    array — the S6 broadcast-small-read-only-state pattern)."""
    q = "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in query_vec) + ")"
    return vecs.select(
        F.col(id_col),
        F.expr(cosine_expr(vec_col, q)).alias("cosine"),
    )


def topk_cosine(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine (K4 top-k analogue: ORDER BY ... LIMIT k,
    ties broken by id for determinism). At scale this is a map + TakeOrdered
    — no shuffle of the vectors themselves."""
    return (
        cosine_to_query(vecs, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def srp_bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """Sign-random-projection bucket id: bit b = sign(dot(vec, plane_b)).
    Deterministic pinned planes (no runtime randomness — K6/K8 discipline)."""
    bits = []
    for b, plane in enumerate(planes):
        p = "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in plane) + ")"
        bits.append(f"(case when {_dot(vec_col, p)} > 0 then {1 << b} else 0 end)")
    return "(" + " + ".join(bits) + ")"


def fixed_planes(dim: int, n_planes: int = 8) -> list[list[float]]:
    """Pinned pseudo-random hyperplanes from the same LCG family as
    functions.hashing (seed-free at call time — deterministic forever)."""
    state = 1469598103934665603
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append(((state >> 16) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def ann_lsh_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's SRP bucket.

    At 10^12 scale the bucket column is precomputed+partitioned-by; here the
    projection is inline. Recall is approximate by design — verified in
    tests against the brute-force baseline, not against the oracle.
    """
    dim = len(query_vec)
    planes = fixed_planes(dim, n_planes)
    bucketed = vecs.withColumn("bucket", F.expr(srp_bucket_expr(vec_col, planes)))
    # compute the query's bucket driver-side with the same fold arithmetic
    qv = [float(v) for v in query_vec]
    qb = 0
    for b, plane in enumerate(planes):
        acc = 0.0
        for x, y in zip(qv, plane):
            acc = acc + float(x) * float(y)
        if acc > 0:
            qb += 1 << b
    candidates = bucketed.filter(F.col("bucket") == qb)
    return topk_cosine(candidates, query_vec, k, id_col, vec_col)


def embedding_near_dup_lsh(
    vecs: DataFrame,
    threshold: float = 0.45,
    n_tables: int = 4,
    planes_per_table: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production near-dup pairs: multi-table SRP bucket join + exact verify.

    OR-amplification across ``n_tables`` independent SRP tables (the same
    band trick as MinHash-LSH): a pair is a candidate if it collides in ANY
    table — recall for cos≥0.95 pairs ≈ 1-(1-(1-θ/π)^planes)^tables ≈ 0.95
    at the defaults. Plan shape at 10^12 rows: one projection computes all
    table buckets, explode is a constant ``n_tables`` fan-out, the join
    shuffles (bucket_key, id, vec) grouped by key, exact cosine verifies
    candidates only. Recall measured against the exact baseline in tests.
    """
    from pyspark.sql.functions import pandas_udf

    all_planes = fixed_planes(dim, n_tables * planes_per_table)
    # one Arrow-batched matmul computes ALL table buckets: X @ P.T > 0 →
    # bit matrix → per-table bucket ints (the vectorized path; the pure-SQL
    # fold variant srp_bucket_expr remains for ann_lsh_topk)
    P = np.asarray(all_planes, dtype=np.float64).T  # (dim, tables*ppt)
    weights = (1 << np.arange(planes_per_table, dtype=np.int64))

    @pandas_udf("array<string>")
    def srp_keys(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        bits = (X @ P > 0).astype(np.int64)  # (n, tables*ppt)
        out = []
        per_table = bits.reshape(len(X), n_tables, planes_per_table) @ weights
        for row in per_table:
            out.append([f"{t}:{int(b)}" for t, b in enumerate(row)])
        return pd.Series(out)

    from deepseek_ocr_api_rs_spark.operators.dedup import _persist

    bucketed = _persist(
        vecs.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(srp_keys(F.col(vec_col))).alias("bucket_key"),
        )
    )  # both join sides — one bucket computation, not two; callers release
    # it via dedup.unpersist_deps(result) / release_persisted() post-action
    a = bucketed.select(
        "bucket_key", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = bucketed.select(
        "bucket_key", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    out = (
        a.join(b, "bucket_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.expr(cosine_expr("va", "vb")).alias("cosine"),
        )
        # a pair colliding in k tables appears k times with the same exact
        # cosine — one distinct after the (cheap) filter dedupes them
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )
    out._persisted_deps = [bucketed]
    return out


def topk_cosine_pandas(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k with the heavy math in numpy (Arrow-batched
    matmul) — the vectorized production path for wide scans: per-batch
    X @ q is SIMD, per-partition top-k, then a global TakeOrdered over
    (partitions × k) rows only."""
    from collections.abc import Iterator

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_ids: list = []
        best_sims: list = []
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (X @ q) / (np.sqrt(np.einsum("ij,ij->i", X, X)) * qn)
            order = np.lexsort((pdf[id_col].to_numpy(), -sims))[:k]
            best_ids.extend(pdf[id_col].to_numpy()[order])
            best_sims.extend(sims[order])
        out = pd.DataFrame({id_col: best_ids, "cosine": best_sims})
        yield out.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

    partial = vecs.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, cosine double"
    )
    return (
        partial.orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def fixed_centroids(dim: int, n_centroids: int = 16) -> np.ndarray:
    """Pinned pseudo-random IVF centroids (unit-normalized), same LCG
    family as fixed_planes — deterministic forever. A production deployment
    would train them with k-means over a sample; the *plumbing* (assign →
    bucket → probe) is identical either way."""
    state = 2862933555777941757
    rows = []
    for _ in range(n_centroids * dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        rows.append(((state >> 16) % 2001 - 1000) / 1000.0)
    C = np.asarray(rows, dtype=np.float64).reshape(n_centroids, dim)
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_assign(vecs: DataFrame, dim: int = 64, n_centroids: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: "np.ndarray | None" = None) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid — the IVF
    coarse quantizer, one Arrow-batched matmul. ``centroids`` overrides the
    pinned table (pass train_ivf_centroids(...) for the trained path)."""
    from pyspark.sql.functions import pandas_udf

    C = fixed_centroids(dim, n_centroids) if centroids is None else centroids

    @pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xn @ C.T, axis=1).astype(np.int32))

    return vecs.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("centroid")
    )


def ivf_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` centroids nearest the query, brute-
    force only their inverted lists. At 10^12 scale the assignment column
    is precomputed and the table partitioned by it → a probe reads nprobe/
    n_centroids of the data (partition pruning does the skipping). Recall
    vs the exact baseline is measured in tests. Pass
    ``centroids=train_ivf_centroids(...)`` for the trained quantizer."""
    dim = len(query_vec)
    C = fixed_centroids(dim, n_centroids) if centroids is None else centroids
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    probes = np.argsort(-(C @ qn), kind="stable")[:nprobe].tolist()
    assigned = ivf_assign(vecs, dim, n_centroids, id_col, vec_col, centroids)
    candidates = assigned.filter(F.col("centroid").isin([int(p) for p in probes]))
    return topk_cosine(candidates, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact near-dup pairs by cosine ≥ threshold — ORACLE BASELINE ONLY.

    This is an all-pairs cross join (O(n²)): it exists as the exactness
    baseline the LSH path (``embedding_near_dup_lsh``) is measured against,
    and it REFUSES inputs larger than ``max_rows`` so it cannot be run on a
    real table by accident (pass max_rows=None to override knowingly).
    """
    if max_rows is not None:
        n = vecs.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs is the all-pairs oracle baseline "
                f"(O(n²)); input has {n} rows > max_rows={max_rows}. Use "
                f"embedding_near_dup_lsh for real tables, or pass "
                f"max_rows=None to override."
            )
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(cosine_expr("va", "vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN


def fixed_pq_codebooks(
    dim: int, n_sub: int = 16, n_codes: int = 256
) -> np.ndarray:
    """Pinned pseudo-random PQ codebooks, one per subspace:
    (n_sub, n_codes, dim // n_sub) float64. Same LCG family as
    fixed_centroids — deterministic forever; a production deployment trains
    them with per-subspace k-means, the encode/score plumbing is identical."""
    if dim % n_sub:
        raise ValueError(f"dim={dim} not divisible by n_sub={n_sub}")
    sub = dim // n_sub
    state = 88172645463325252
    vals = []
    for _ in range(n_sub * n_codes * sub):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        vals.append(((state >> 16) % 2001 - 1000) / 1000.0)
    return np.asarray(vals, dtype=np.float64).reshape(n_sub, n_codes, sub)


def pq_encode(
    vecs: DataFrame,
    dim: int = 64,
    n_sub: int = 16,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """Encode each (unit-normalized) vector into ``n_sub`` one-byte codes —
    a 64-dim float32 embedding (256 B) compresses to 16 B, the trick that
    lets 10^12 vectors' index fit a cluster's RAM. One Arrow-batched pass:
    per subspace, argmin L2 distance to the codebook. ``codebooks``
    overrides the pinned tables (train_pq_codebooks for the trained path)."""
    from pyspark.sql.functions import pandas_udf

    C = fixed_pq_codebooks(dim, n_sub, n_codes) if codebooks is None else codebooks

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        parts = Xn.reshape(len(X), n_sub, dim // n_sub)
        codes = np.empty((len(X), n_sub), dtype=np.int32)
        for m in range(n_sub):
            # (n, 256) squared L2 via the expansion trick, argmin per row
            d2 = (
                np.einsum("ij,ij->i", parts[:, m], parts[:, m])[:, None]
                - 2.0 * parts[:, m] @ C[m].T
                + np.einsum("ij,ij->i", C[m], C[m])[None, :]
            )
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return vecs.select(
        F.col(id_col), F.col(vec_col), encode(F.col(vec_col)).alias("pq_code")
    )


def pq_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 100,
    dim: int = 64,
    n_sub: int = 16,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """PQ ANN: asymmetric-distance (ADC) scan over the one-byte codes —
    per-subspace query→codebook inner-product TABLES (m × 256 floats,
    broadcast) turn scoring into table lookups — then EXACT cosine re-rank
    of the top ``rerank`` ADC candidates. At 10^12 scale the ADC pass reads
    only the 8-byte codes (no vectors shuffle, no vectors even scanned);
    recall is measured in tests against the brute-force baseline."""
    from pyspark.sql.functions import pandas_udf

    C = fixed_pq_codebooks(dim, n_sub, n_codes) if codebooks is None else codebooks
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    qparts = qn.reshape(n_sub, dim // n_sub)
    # ADC lookup tables: approximate cosine = Σ_m <q_m, C[m][code_m]>
    tables = np.stack([C[m] @ qparts[m] for m in range(n_sub)])  # (m, 256)

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        K = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        score = np.zeros(len(K), dtype=np.float64)
        for m in range(n_sub):
            score += tables[m][K[:, m]]
        return pd.Series(score)

    encoded = pq_encode(vecs, dim, n_sub, n_codes, id_col, vec_col, codebooks)
    candidates = (
        encoded.withColumn("adc_score", adc(F.col("pq_code")))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(rerank)
        .select(id_col, vec_col)
    )
    return topk_cosine(candidates, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# trained quantizers — deterministic Lloyd k-means on a pinned sample


_SAMPLE_MULT = 1103515245
_SAMPLE_ADD = 12345


def _pinned_sample(
    vecs: DataFrame, sample_n: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic unit-normalized sample: the ``sample_n`` rows with the
    smallest pinned-hash ids (TakeOrdered — no full sort, no RNG), stacked
    driver-side. Bounded: sample_n × dim floats regardless of table size."""
    from deepseek_ocr_api_rs_spark.functions import hashing as H

    rows = (
        vecs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", (F.col("_id") * _SAMPLE_MULT + _SAMPLE_ADD) % H.P)
        .orderBy("_h", "_id")
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r._v, dtype=np.float64) for r in rows])
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def train_ivf_centroids(
    vecs: DataFrame,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 8,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (Lloyd) from the pinned fixed_centroids init over
    the pinned sample — fully deterministic (no RNG, fixed numpy reduction
    order), so trained queries stay rerun-stable. Empty clusters keep their
    previous centroid. Returns (n_centroids, dim) unit rows."""
    Xn = _pinned_sample(vecs, sample_n, id_col, vec_col)
    C = fixed_centroids(dim, n_centroids).copy()
    for _ in range(n_iter):
        a = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_centroids):
            members = Xn[a == c]
            if len(members):
                v = members.sum(axis=0)
                nv = float(np.linalg.norm(v))
                if nv > 1e-12:
                    C[c] = v / nv
    return C


def train_pq_codebooks(
    vecs: DataFrame,
    dim: int = 64,
    n_sub: int = 16,
    n_codes: int = 256,
    n_iter: int = 6,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace L2 k-means from the pinned fixed_pq_codebooks init over
    the pinned sample (the production way to build PQ codebooks; same
    determinism guarantees as train_ivf_centroids). Returns
    (n_sub, n_codes, dim // n_sub)."""
    Xn = _pinned_sample(vecs, sample_n, id_col, vec_col)
    parts = Xn.reshape(len(Xn), n_sub, dim // n_sub)
    C = fixed_pq_codebooks(dim, n_sub, n_codes).copy()
    for m in range(n_sub):
        P = parts[:, m]
        pn = np.einsum("ij,ij->i", P, P)
        for _ in range(n_iter):
            d2 = pn[:, None] - 2.0 * (P @ C[m].T) + np.einsum(
                "ij,ij->i", C[m], C[m]
            )[None, :]
            a = np.argmin(d2, axis=1)
            for c in np.unique(a):
                C[m][c] = P[a == c].mean(axis=0)
    return C


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) near-duplicate pruning


def semdedup(
    vecs: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
    cc_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540
    — public): the pruning step real LLM pipelines run AFTER MinHash,
    catching paraphrases that share no shingles.

    Pipeline (every stage bucketed — never an all-pairs join):

    1. assign each embedding to its nearest centroid (``ivf_assign``; the
       trained spherical-k-means centroids ride into the Arrow UDF as a
       task broadcast — map-only, zero shuffle);
    2. WITHIN-CLUSTER near-dup pairs only: self-join keyed on the cluster
       id, cosine ≥ ``threshold`` via the in-order JVM fold
       (``cosine_expr`` — deterministic, engine-exact). Work is
       O(sum cluster² ) not O(n²); at 10^12 rows n_centroids scales with
       the corpus so each inverted list stays bounded, and the join
       shuffles on the cluster id (hash-bucketed, AQE-skew-splittable);
    3. duplicate groups = connected components over the pair graph
       (pointer jumping, shuffles scoped to the PAIR-graph cardinality
       via ``cc_shuffle_partitions`` — the q_canonical_docs lever);
    4. per group keep ONE representative — the member with the LOWEST
       cosine to its cluster centroid (the paper's diversity-keeping
       rule), ties broken by id. The ranking window moves only
       (component, rounded scalar) pairs, never embeddings.

    cos_centroid is computed through a 16-row BROADCAST join against the
    centroid table using the same in-order fold (NOT a numpy matmul —
    BLAS reassociates, the fold is bit-stable across batch splits).

    Returns one disposition row per vector: (id, centroid, component,
    cos_centroid ROUND 6, keep) ordered by id.
    """
    from pyspark.sql.window import Window

    from deepseek_ocr_api_rs_spark.operators.sessions import (
        connected_components,
    )

    spark = vecs.sparkSession
    C = fixed_centroids(dim, n_centroids) if centroids is None else centroids
    assigned = ivf_assign(
        vecs, dim, n_centroids, id_col, vec_col, centroids=C
    ).persist()

    cent_rows = [(int(i), [float(x) for x in C[i]]) for i in range(len(C))]
    cent_df = spark.createDataFrame(
        cent_rows, "centroid int, cvec array<double>"
    )
    scored = assigned.join(F.broadcast(cent_df), "centroid").select(
        F.col(id_col),
        "centroid",
        F.round(F.expr(cosine_expr(vec_col, "cvec")), 6).alias(
            "cos_centroid"
        ),
    )

    a = assigned.select(
        "centroid", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        "centroid", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = (
        a.join(b, "centroid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr(cosine_expr("va", "vb")) >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(
        pairs, shuffle_partitions=cc_shuffle_partitions
    )
    labeled = scored.join(
        comp, scored[id_col] == comp.id, "left"
    ).select(
        F.col(id_col),
        "centroid",
        F.coalesce("component", F.col(id_col)).alias("component"),
        "cos_centroid",
    )
    win = Window.partitionBy("component").orderBy("cos_centroid", id_col)
    return (
        labeled.withColumn(
            "keep", (F.row_number().over(win) == 1).cast("int")
        )
        .orderBy(id_col)
    )
