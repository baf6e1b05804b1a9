"""Similarity search over embedding columns (array<float>).

Two paths:
- cosine_topk: exact brute-force top-k for a bounded query set.
  Query side is broadcast (it's small by construction), so the big
  side streams with NO shuffle — the plan is scan → broadcast
  nested-loop join → project → per-query top-k. At 100 TB the work is
  O(|queries| * |corpus|) dot products, embarrassingly parallel.
- lsh_topk: random-hyperplane LSH bucketing as the scale path —
  candidates only form within matching buckets, trading recall for a
  corpus-sized (not quadratic) shuffle. Hyperplanes are generated
  from a seed, deterministic.

Dot products use zip_with + aggregate — JVM higher-order functions,
no Python in the loop.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] as double — left-to-right fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries defaults to the corpus itself (all-pairs kNN — use only
    at modest corpus sizes; for the scale path see lsh_topk).
    Output: (query_id, neighbor_id, rank, cos_sim rounded to 6).
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    qs = (queries if queries is not None else embeddings).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = corpus.crossJoin(F.broadcast(qs)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with a < b
    and cosine >= threshold. Output: (vec_a, vec_b, cos_sim rounded 6).

    This exact variant is O(n²) dot products with a broadcast of one
    side — correct and oracle-checkable at validation scale. The
    100 TB path is the same filter applied within sign-LSH buckets
    (see lsh_topk): swap the crossJoin for a bucket equi-join and the
    pair count drops from quadratic to per-bucket-quadratic.
    """
    a = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos_raw")
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-ish hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    product), packed into a long. Pure column expression."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array([F.lit(float(x)) for x in p])
        bit = F.when(
            dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs kNN: bucket by sign-LSH, join within
    buckets, rank within query. The shuffle key is the bucket id —
    2^n_planes buckets; raise n_planes as the corpus grows to keep
    per-bucket candidate counts bounded (bucket size drives cost, so
    this is the knob that makes 100 TB feasible)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    a = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
    )
    pairs = a.join(b, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )
