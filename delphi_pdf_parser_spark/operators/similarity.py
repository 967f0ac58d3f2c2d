"""Similarity search over the embeddings table.

- brute-force cosine top-k: broadcast the (small) query set, JVM-side
  zip_with/aggregate dot products, window rank. This is the exactness
  baseline and the verify stage of any ANN index.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (signs of
  hash-derived pseudo-random projections), bucket join, rank within
  bucket. The scale path: the crossJoin disappears, each query probes
  one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cosine


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """queries(query_id, embedding) x embeddings(vec_id, embedding) ->
    top-k by cosine. Rank on rounded cosine with vec_id tiebreak so the
    result is engine-independent."""
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
    )
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    joined = e.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    # round to 4 dp BEFORE ranking: float32 inputs summed in different
    # orders diverge around 1e-6, 4 dp + vec_id tiebreak is engine-stable
    cos = F.round(_cosine(F.col("embedding"), F.col("qvec")), 4)
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplane_sign(vec, plane_seed: int):
    """Sign of a pseudo-random projection: plane component j is derived
    from xxhash64(seed, j) scaled to [-1, 1] — deterministic, no stored
    plane matrix, identical on every executor."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    comp = F.zip_with(
        vec,
        idx,
        lambda v, j: v
        * (
            (
                F.xxhash64(F.lit(plane_seed), j).cast("double")
                / F.lit(float(1 << 63))
            )
        ),
    )
    proj = F.aggregate(comp, F.lit(0.0).cast("double"), lambda a, v: a + v)
    return (proj >= 0).cast("int")


def lsh_signature(vec, num_planes: int = 12):
    sig = F.lit(0)
    for p in range(num_planes):
        sig = sig + F.shiftleft(_hyperplane_sign(vec, p).cast("int"), p)
    return sig


def ann_lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, num_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).withColumn("bucket", lsh_signature(F.col("embedding"), num_planes))
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        ).withColumn("bucket", lsh_signature(F.col("qvec"), num_planes))
    )
    joined = e.join(q, on="bucket").filter(F.col("vec_id") != F.col("query_id"))
    cos = F.round(_cosine(F.col("embedding"), F.col("qvec")), 4)
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
