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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from .dedup import hash64


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


def _plane_sign(plane: int, dim_index):
    """Deterministic ±1 for (plane, dim) via the shared md5-prefix hash —
    reproducible without RNG state on any engine."""
    h = hash64(F.concat(F.lit(f"plane{plane}|"), dim_index.cast("string")))
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def hyperplane_lsh_buckets(emb: DataFrame, n_planes: int = 8,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection bucket id per vector: bit b = sign(v · p_b)."""
    sig = None
    for b in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda i, b=b: _plane_sign(b, i),
                ),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select(id_col, vec_col, sig.cast("int").alias("bucket"))


def bucketed_cosine_topk(emb: DataFrame, k: int = 5, query_mod: int = 50,
                         n_planes: int = 6, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket —
    the join shuffles on bucket instead of crossing everything."""
    bucketed = hyperplane_lsh_buckets(emb, n_planes, id_col, vec_col)
    q = bucketed.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("a_vec"), "bucket"
    )
    n = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"), "bucket"
    )
    pairs = q.join(n, ["bucket"]).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs).drop("a_vec", "b_vec")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
