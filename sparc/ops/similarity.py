"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  Dot products are
  JVM-side ``aggregate(zip_with(...))`` — no Python in the plan.  The
  query side is broadcast; the corpus side streams, so the plan scales
  linearly with corpus size (no shuffle of the corpus at all).
- LSH-bucketed (random hyperplane) ANN: the 100TB path — sign-bit bucket
  join prunes the corpus to matching buckets before exact rescoring.
  Hyperplanes are deterministic literals (seeded numpy), embedded in the
  plan, so two runs (or two cluster sizes) see identical buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (query side broadcast)."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("sim", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("sim", round_to).alias("sim"),
        )
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from deterministic hyperplane literals."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, plane) > 0, F.lit(2**i)).otherwise(0)
    return bucket.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """ANN top-k: bucket join on hyperplane sign bits, exact rescoring inside
    the bucket.  Recall < 1.0 by design; bucket count 2^n_planes."""
    sample = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(sample["d"])
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", lsh_bucket_col(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", lsh_bucket_col(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("sim", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.col("rank").cast("long").alias("rank"),
                F.round("sim", round_to).alias("sim"))
    )


def embedding_cosine_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs via LSH buckets + exact cosine."""
    planes = None
    sample = df.select(F.size(F.col(vec_col)).alias("d")).first()
    planes = hyperplanes(int(sample["d"]), n_planes, seed)
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("sim", _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v"))))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round("sim", 4).alias("sim"))
    )
