"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k against a broadcast query
  vector.  The query vector is a literal (driver-side broadcast in the
  plan); scoring is ``zip_with``+``aggregate`` inside whole-stage codegen;
  top-k is a single ``orderBy(...).limit(k)`` which Spark executes as
  per-partition partial top-k + tiny final merge — no full sort shuffle.
* ``ivf_topk`` — the scale path: k-means-free IVF via sign-LSH coarse
  buckets (same hyperplane family as dedup).  At query time only buckets
  within a Hamming radius of the query's bucket are scanned — a
  partition-pruned scan when the table is written partitioned by bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim

__all__ = ["brute_force_topk", "brute_force_topk_pandas", "bucket_of", "ivf_topk"]


def _vec_lit(q: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in q])


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cos) of the k nearest rows by cosine similarity (exact)."""
    qv = _vec_lit(query_vec)
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_sim(F.col(vec_col).cast("array<double>"), qv).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def bucket_of(vec_col: Column, n_planes: int = 12) -> Column:
    """Sign-LSH coarse bucket id (shares the hyperplane family with
    dedup.embedding_near_dup so tables can be co-bucketed).

    Hyperplane p's coefficient for dimension i is a deterministic
    pseudo-random value in [-1, 1) derived from Murmur3 ``hash(i, p)``.
    Single pass over the vector: one ``aggregate`` carries all plane
    dot-products as an ``array<double>`` accumulator (term order per
    plane is unchanged, so bucket values are bit-identical to the
    previous per-plane formulation — co-bucketed tables stay valid)."""
    v = vec_col.cast("array<double>")
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    zeros = F.transform(planes, lambda p: F.lit(0.0))
    dots = F.aggregate(
        F.sequence(F.lit(0), F.size(v) - 1),
        zeros,
        lambda acc, i: F.zip_with(
            acc,
            planes,
            lambda a, p: a
            + F.element_at(v, i + 1)
            * ((F.pmod(F.hash(i, p), F.lit(2000)) - F.lit(1000)).cast("double") / 1000.0),
        ),
    )
    # MSB-first fold: bucket = Σ (dot_p > 0) · 2^p, safe in long (p < 63)
    return F.aggregate(
        F.reverse(dots),
        F.lit(0).cast("long"),
        lambda acc, d: acc * 2 + F.when(d > 0, 1).otherwise(0).cast("long"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    hamming_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose coarse bucket is within
    ``hamming_radius`` of the query's bucket.

    With the table pre-partitioned/bucketed by ``bucket_of``, the filter
    becomes partition pruning — the 100TB path scans a fraction
    ≈ C(n_planes, ≤radius) / 2^n_planes of the data.
    """
    spark = df.sparkSession
    qv = _vec_lit(query_vec)
    qbucket = (
        spark.range(1).select(bucket_of(qv, n_planes).alias("b")).collect()[0]["b"]
    )
    # buckets within the Hamming radius (small: n_planes choose <= radius)
    cands = {qbucket}
    frontier = [qbucket]
    for _ in range(hamming_radius):
        nxt = []
        for b in frontier:
            for i in range(n_planes):
                nb = b ^ (1 << i)
                if nb not in cands:
                    cands.add(nb)
                    nxt.append(nb)
        frontier = nxt
    scored = (
        df.withColumn("__bucket", bucket_of(F.col(vec_col), n_planes))
        .where(F.col("__bucket").isin(*[int(b) for b in cands]))
        .select(
            F.col(id_col).alias("id"),
            cosine_sim(F.col(vec_col).cast("array<double>"), qv).alias("cos"),
        )
    )
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def brute_force_topk_pandas(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vectorized Pandas-UDF twin of ``brute_force_topk``: per Arrow
    batch, one numpy matrix-vector product scores every row at once —
    the faster path for high-dimensional embeddings, where the JVM
    per-element ``aggregate`` pays interpretation cost per dimension.
    Same result set (cosine in float64, same tie-break)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    schema = StructType(
        [StructField("id", LongType()), StructField("cos", DoubleType())]
    )
    narrow = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )

    def run(batches):
        for pdf in batches:
            m = np.stack(pdf["v"].map(lambda a: np.asarray(a, dtype=np.float64)))
            dots = m @ q
            norms = np.linalg.norm(m, axis=1) * qn
            yield pd.DataFrame({"id": pdf["id"], "cos": dots / norms})

    scored = narrow.mapInPandas(run, schema)
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)
