"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k as pure JVM expressions (zip_with dot
product inside whole-stage codegen — no UDF).  Scale path: random-hyperplane
LSH bucketing so the search touches one bucket instead of the full corpus;
the planes are deterministic (seeded) literals broadcast in the plan.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _lit_vec(vec: Sequence[float]) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    embeddings: DataFrame, query: Sequence[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.  TakeOrderedAndProject physical op: no
    global sort materializes, each partition keeps k and the driver merges."""
    q = _lit_vec(query)
    qn = float(np.sqrt(np.dot(query, query)))
    vec = F.col(vec_col).cast("array<double>")
    score = _dot(vec, q) / (_norm(vec) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), F.round(score, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force near-dup pairs (the correctness baseline; use
    lsh_topk/lsh buckets at scale).  Cross-join bounded by caller."""
    a = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    score = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(score, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> List[List[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def lsh_bucket_col(vec_col: str, planes: List[List[float]]) -> F.Column:
    """Sign-bit bucket id: bit i = sign(dot(vec, plane_i)).  Pure expressions."""
    vec = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot(vec, _lit_vec(p)) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    embeddings: DataFrame, query: Sequence[float], k: int = 10,
    n_planes: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the exact scorer to the query's LSH bucket.  At corpus
    scale the table is written partitioned by bucket, so this is a partition-
    pruned scan of ~1/2^planes of the data."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if float(np.dot(query, p)) >= 0:
            qbits |= 1 << i
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(vec_col, planes))
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbits), query, k, id_col, vec_col
    )
