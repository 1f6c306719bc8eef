"""Similarity search over embedding columns (ARRAY<FLOAT>).

Brute-force cosine top-k as the correctness baseline (oracle-checkable in
DuckDB via list_cosine_similarity), plus a random-hyperplane LSH-bucketed
variant as the scale path: each vector maps to a sign-bit bucket per table;
candidate pairs share a bucket in >=1 table, cutting the pair space from
O(n^2) to sum of per-bucket squares.  Dot products run JVM-side via
zip_with + aggregate (no Python), or vectorized numpy in a pandas UDF for
the batch top-k path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS DOUBLE) * y),"
        f" cast(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate({a}, cast(0.0 AS DOUBLE),"
        f" (acc, v) -> acc + cast(v AS DOUBLE) * v))"
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b) + F.lit(1e-12))


def brute_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 100,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for the first n_queries vectors.

    The query side is tiny -> broadcast; candidates stream by; per-query
    top-k via window (Catalyst plans rank<=k as TopK per key, no full sort).
    """
    base = embeddings.select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv")
    ).where(F.col("q") < n_queries)
    cand = embeddings.select(
        F.col(id_col).alias("c"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(base).crossJoin(cand)
        .where(F.col("q") != F.col("c"))
        .withColumn("cos", F.round(cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("c"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q", "c", "cos", "rk")
    )


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 8,
                       n_tables: int = 4, seed: int = 42,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket): sign-bit LSH.  Hyperplanes are deterministic
    (seeded numpy) literals baked into the plan — no join, no UDF; the
    bucket id is a sum of sign bits computed with zip_with/aggregate."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = first.d if first else 0
    rng = np.random.default_rng(seed)
    out = None
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim))
        bucket = None
        for p in range(n_planes):
            arr = "array(" + ", ".join(
                f"cast({v!r} AS DOUBLE)" for v in planes[p].tolist()
            ) + ")"
            bit = (
                F.when(
                    F.expr(
                        f"aggregate(zip_with({vec_col}, {arr},"
                        f" (x, y) -> cast(x AS DOUBLE) * y),"
                        f" cast(0.0 AS DOUBLE), (acc, v) -> acc + v)"
                    ) > 0,
                    F.lit(1 << p),
                ).otherwise(F.lit(0))
            )
            bucket = bit if bucket is None else bucket + bit
        part = embeddings.select(
            F.col(id_col).alias("id"),
            F.lit(t).alias("table"),
            bucket.cast("int").alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 100,
             n_planes: int = 8, n_tables: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket."""
    buckets = hyperplane_buckets(
        embeddings, n_planes, n_tables, seed, id_col, vec_col
    )
    vecs = embeddings.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"))
    qb = buckets.where(F.col("id") < n_queries).select(
        "table", "bucket", F.col("id").alias("q")
    )
    cb = buckets.select("table", "bucket", F.col("id").alias("c"))
    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("q") != F.col("c"))
        .select("q", "c")
        .distinct()
    )
    qv = vecs.select(F.col("id").alias("q"), F.col("v").alias("qv"))
    cv = vecs.select(F.col("id").alias("c"), F.col("v").alias("cv"))
    scored = (
        cand.join(F.broadcast(qv), "q").join(cv, "c")
        .withColumn("cos", F.round(cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("c"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q", "c", "cos", "rk")
    )
