"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``      — exact brute-force top-k (the correctness baseline;
                         one pass + a top-k sort, no shuffle of the corpus).
- ``lsh_bucketed_topk``— random-hyperplane LSH: deterministic pseudo-random
                         hyperplanes (seeded from md5, no RNG state), sign
                         bits -> bucket key; probe the query's bucket and
                         its single-bit-flip neighbors.  At 100 TB the
                         bucket key is the stored partition column, so a
                         query touches a handful of partitions instead of
                         the full corpus.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.functions.vectors import as_double_array, cosine, dot


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane weights in
    [-0.5, 0.5), seeded via md5 (no RNG, reproducible across runs)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"plane{plane}:dim{i}".encode()).digest()[:8]
        (v,) = struct.unpack(">Q", h)
        out.append((v % 10_000) / 10_000.0 - 0.5)
    return out


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    The query is a literal array (broadcast by construction); Spark plans a
    TakeOrderedAndProject — no full sort, no shuffle beyond the top-k
    combine."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def with_lsh_bucket(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Attach the random-hyperplane sign-bucket key (persisted layout
    column at scale; replaces a full-corpus scan with bucket pruning)."""
    v = as_double_array(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.lit(_hyperplane(p, dim)).cast("array<double>")
        bucket = bucket + F.when(dot(v, plane) > 0, F.lit(1 << p)).otherwise(0)
    return embeddings.withColumn(bucket_col, bucket.cast("int"))


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket and
    (multiprobe) the buckets one bit-flip away — 1/2^n_planes * (1 +
    n_planes) of the corpus instead of all of it."""
    dim = len(query_vec)
    qbucket = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qbucket |= 1 << p
    probes = [qbucket]
    if multiprobe_bits >= 1:
        probes += [qbucket ^ (1 << p) for p in range(n_planes)]

    bucketed = with_lsh_bucket(embeddings, n_planes, dim, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)
