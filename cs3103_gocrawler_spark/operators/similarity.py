"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: the correctness baseline. The
  dot products run entirely JVM-side (``zip_with``/``aggregate`` — no Python),
  and the quadratic blow-up is bounded by restricting the query side, with
  the neighbor side broadcast when it fits.
* ``hyperplane_lsh_buckets`` / ``bucketed_cosine_topk`` — the scale path:
  sign-random-projection LSH. Plane b's component for dimension d is a
  deterministic ±1 from the shared md5 hash (seedless, reproducible on any
  engine). At 10^9 vectors the bucket join replaces the cross join; recall
  is tunable via n_planes / n_tables.
* ``embedding_neardup_pairs`` — embedding-cosine near-duplicate detection
  (dedup modality E in the training-data pipeline).

Cosine values are rounded to 6 dp so the DuckDB oracle twin compares stably
(both engines accumulate in float64 over the same element order).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def with_cosine(df: DataFrame, a: str = "a_vec", b: str = "b_vec",
                out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out,
        F.round(_dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))), 6),
    )


def cosine_topk(emb: DataFrame, k: int = 5, query_mod: int = 50,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for the query subset (id % query_mod == 0)
    against ALL vectors. Neighbor side is broadcast if small; ties broken by
    neighbor id for full determinism."""
    q = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("a_vec")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"))
    pairs = q.join(F.broadcast(n), F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs).drop("a_vec", "b_vec")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup dedup.
    Quadratic: use only at verify scale or behind LSH buckets."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("a_vec"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("b_vec"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


_MAX_DIM = 64  # sign literals cover embeddings up to this many dimensions


def _plane_sign_py(plane: int, d: int, table: int = 0) -> float:
    """Deterministic ±1 for (plane, dim[, table]): parity of the shared
    60-bit md5-prefix hash — same formula as operators.dedup.hash64, computed
    driver-side so the sign matrix folds to literals."""
    key = f"plane{plane}|{d}" if table == 0 else f"plane{table}.{plane}|{d}"
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def hyperplane_lsh_buckets(emb: DataFrame, n_planes: int = 8,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           table: int = 0) -> DataFrame:
    """Sign-random-projection bucket id per vector: bit b = sign(v · p_b).

    The hyperplane signs are constants, so they are baked in as array
    LITERALS (sliced to the vector length) rather than computed by a
    ``transform(sequence(...))`` lambda. Besides folding 64 hash calls out of
    the per-row path, this avoids triple-nested higher-order-function lambdas
    (transform inside zip_with inside aggregate, repeated per plane in one
    projection), whose lambda-variable binding proved session-nondeterministic
    — identical input produced different buckets across runs."""
    sig = None
    for b in range(n_planes):
        signs = F.array(
            *[F.lit(_plane_sign_py(b, d, table)) for d in range(_MAX_DIM)]
        )
        proj = _dot(
            F.col(vec_col), F.slice(signs, 1, F.size(F.col(vec_col)))
        )
        bit = F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select(id_col, vec_col, sig.cast("int").alias("bucket"))


def bucketed_cosine_topk(emb: DataFrame, k: int = 5, query_mod: int = 50,
                         n_planes: int = 6, n_tables: int = 3,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket —
    the join shuffles on bucket instead of crossing everything. Standard
    multi-table LSH: ``n_tables`` independent hyperplane sets, candidate
    pairs unioned across tables (recall ≈ 1-(1-p^b)^T), cosine scored once
    per distinct pair."""
    cands = None
    for t in range(n_tables):
        bucketed = hyperplane_lsh_buckets(emb, n_planes, id_col, vec_col, table=t)
        q = bucketed.filter(F.col(id_col) % query_mod == 0).select(
            F.col(id_col).alias("query_id"), "bucket"
        )
        n = bucketed.select(F.col(id_col).alias("neighbor_id"), "bucket")
        p = q.join(n, ["bucket"]).filter(
            F.col("query_id") != F.col("neighbor_id")
        ).select("query_id", "neighbor_id")
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    vecs_q = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("a_vec")
    )
    vecs_n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"))
    pairs = cands.join(F.broadcast(vecs_q), "query_id").join(vecs_n, "neighbor_id")
    scored = with_cosine(pairs).drop("a_vec", "b_vec")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
