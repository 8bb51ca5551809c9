"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
- brute_force_cosine_topk: exact baseline. query x corpus join with the
  dot product as a Catalyst higher-order function (zip_with + aggregate —
  JVM-side, vectorizable); top-k via window row_number. O(|Q| * |C|): fine
  for bounded query sets, the correctness oracle for the ANN path.
- lsh_cosine_topk: random-hyperplane (sign) LSH: b sign-bits -> bucket id;
  only same-bucket pairs are scored. Multi-probe via several independent
  tables to trade recall for cost. This is the 100 TB path: the bucket
  join is a plain shuffled equi-join AQE can handle, and each bucket is
  small.

Embeddings are array<float>; math is done in double.
"""

from __future__ import annotations

import random
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    corpus: DataFrame,
    embedding_column: str,
    id_column: str,
    k: int = 10,
    queries: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row (default: corpus
    itself). Output: (query_id, neighbor_id, cosine, rank)."""
    q = (queries if queries is not None else corpus).select(
        F.col(id_column).alias("query_id"),
        F.col(embedding_column).alias("__qv__"),
    )
    c = corpus.select(
        F.col(id_column).alias("neighbor_id"),
        F.col(embedding_column).alias("__cv__"),
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv__"), F.col("__cv__")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int):
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)
    ]


def _bucket_id(embedding: Column, planes) -> Column:
    """Sign-bit bucket id: bit j = (v . h_j) >= 0. Catalyst arithmetic."""
    bits = []
    for j, h in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                embedding,
                F.array(*[F.lit(x) for x in h]),
                lambda x, yy: x.cast("double") * yy,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    corpus: DataFrame,
    embedding_column: str,
    id_column: str,
    k: int = 10,
    bits: int = 8,
    tables: int = 2,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs across ``tables``
    independent random-hyperplane tables. Recall grows with tables; cost
    is sum of per-bucket squares instead of |C|^2."""
    parts = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        b = corpus.select(
            F.col(id_column),
            F.col(embedding_column),
            _bucket_id(F.col(embedding_column), planes).alias("__bucket__"),
        )
        left = b.select(
            F.col("__bucket__"),
            F.col(id_column).alias("query_id"),
            F.col(embedding_column).alias("__qv__"),
        )
        right = b.select(
            F.col("__bucket__"),
            F.col(id_column).alias("neighbor_id"),
            F.col(embedding_column).alias("__cv__"),
        )
        parts.append(
            left.join(right, on="__bucket__")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "__qv__", "__cv__")
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv__"), F.col("__cv__")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cosine_pairs_brute(
    df: DataFrame, embedding_column: str, id_column: str, threshold: float
) -> DataFrame:
    a = df.select(
        F.col(id_column).alias("id_a"), F.col(embedding_column).alias("__a__")
    )
    b = df.select(
        F.col(id_column).alias("id_b"), F.col(embedding_column).alias("__b__")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__a__"), F.col("__b__")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _cosine_pairs_lsh(
    df: DataFrame,
    embedding_column: str,
    id_column: str,
    threshold: float,
    bits: int = 8,
    tables: int = 3,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    parts = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        b = df.select(
            F.col(id_column),
            F.col(embedding_column),
            _bucket_id(F.col(embedding_column), planes).alias("__bucket__"),
        )
        left = b.select(
            "__bucket__",
            F.col(id_column).alias("id_a"),
            F.col(embedding_column).alias("__a__"),
        )
        right = b.select(
            "__bucket__",
            F.col(id_column).alias("id_b"),
            F.col(embedding_column).alias("__b__"),
        )
        parts.append(
            left.join(right, on="__bucket__")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__a__", "__b__")
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return cand.select(
        "id_a",
        "id_b",
        cosine_similarity(F.col("__a__"), F.col("__b__")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
