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
- ``ivf_topk``         — inverted-file index: coarse quantizer (MLlib
                         k-means, or deterministic seed centroids) assigns
                         every vector a cluster id; a query scores only the
                         ``nprobe`` clusters whose centroids are nearest.
                         At scale the cluster id is the table's partition
                         column (same layout trick as the LSH bucket), and
                         the centroid table is broadcast.
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
    from itertools import combinations

    dim = len(query_vec)
    qbucket = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qbucket |= 1 << p
    # probe every bucket within hamming distance <= multiprobe_bits of the
    # query's bucket (sum_{i<=m} C(n_planes, i) probes)
    probes = [qbucket]
    for m in range(1, multiprobe_bits + 1):
        for bits in combinations(range(n_planes), m):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probes.append(qbucket ^ flip)

    bucketed = with_lsh_bucket(embeddings, n_planes, dim, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def with_recall(
    approx: DataFrame, exact: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Append recall@k against the exact top-k as a constant column.

    Lazy (no driver action): left-join the approximate result to the exact
    id set and window-sum the hit flags — the window spans <= k rows, so
    the 'global' window is trivially cheap.  Surfaced by the rows-only ANN
    gate queries so every driver artifact records the achieved recall
    alongside the rows."""
    from pyspark.sql import Window

    hits = exact.select(F.col(id_col)).withColumn("_hit", F.lit(1))
    flagged = approx.join(hits, on=id_col, how="left")
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return flagged.withColumn(
        f"recall{k}",
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).over(w) / F.lit(float(k)),
    ).drop("_hit")


def _cosine_py(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    da = sum(x * x for x in a) ** 0.5
    db = sum(y * y for y in b) ** 0.5
    return num / (da * db) if da > 0 and db > 0 else 0.0


def ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "seed",
    seed: int = 42,
    max_iter: int = 5,
) -> list[list[float]]:
    """Coarse-quantizer centroids for the IVF index.

    ``strategy='kmeans'``: MLlib k-means (k-means|| init) — the trained
    index build; one fit job, run once when (re)building the layout.
    ``strategy='seed'``: every ``ceil(n/k)``-th corpus vector by id rank —
    deterministic, zero training cost, the oracle-friendly variant.
    Either way the result is a tiny driver-side list that downstream
    assignment broadcasts as literals.
    """
    if strategy == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = embeddings.withColumn(
            "_feat", array_to_vector(as_double_array(F.col(vec_col)))
        )
        model = KMeans(
            k=n_clusters, seed=seed, maxIter=max_iter,
            featuresCol="_feat", predictionCol="_cluster",
        ).fit(feat)
        return [list(map(float, c)) for c in model.clusterCenters()]
    # seed strategy: every (n/k)-th vector by id — a modulo filter, no
    # global sort (count() is metadata-only on parquet)
    n = embeddings.count()
    stride = max(1, n // n_clusters)
    rows = (
        embeddings.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
        .filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(n_clusters)
        .collect()
    )
    return [list(map(float, r["v"])) for r in rows]


def with_ivf_cluster(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Attach the nearest-centroid id (argmax cosine, tie -> lowest id).
    Centroids ride along as literals — no join, no shuffle; at scale this
    column is the stored partition key of the embedding table."""
    v = as_double_array(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                F.round(cosine(v, F.lit(c).cast("array<double>")), 9).alias("cos"),
                F.lit(-i).alias("negidx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return embeddings.withColumn(cluster_col, (-best["negidx"]).cast("int"))


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "seed",
    seed: int = 42,
) -> None:
    """Materialize the IVF index as an engine-owned layout: a tiny
    ``centroids`` parquet table plus the corpus rewritten partitioned by
    its nearest-centroid id (``vectors/cluster=N/``).

    Train-once/query-many: the coarse quantizer is fit ONCE here (one
    k-means job, or the deterministic seed pick) instead of per query, and
    every subsequent ``ivf_search_index`` probe prunes whole partitions
    via the directory layout before a single file opens — at 100 TB a
    query touches ``nprobe/n_clusters`` of the files, and the centroid
    table it ranks on the driver is a few KB."""
    import os

    cents = ivf_centroids(
        embeddings, n_clusters, id_col, vec_col, strategy=strategy, seed=seed
    )
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], ["cluster", "centroid"]
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    with_ivf_cluster(embeddings, cents, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(os.path.join(path, "vectors"))


def ivf_search_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k probe against a ``build_ivf_index`` layout: rank the persisted
    centroids on the driver, read ONLY the ``nprobe`` nearest cluster
    partitions (PartitionFilters — pruned before file listing IO), score,
    take k."""
    import os

    cents_rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    cents = [list(map(float, r["centroid"])) for r in cents_rows]
    order = sorted(
        range(len(cents)), key=lambda i: (-_cosine_py(query_vec, cents[i]), i)
    )
    probes = order[:nprobe]
    cand = spark.read.parquet(os.path.join(path, "vectors")).filter(
        F.col("cluster").isin(probes)
    )
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "seed",
) -> DataFrame:
    """Approximate top-k via the IVF index: rank centroids against the
    query on the driver (tiny), then score only the vectors assigned to
    the ``nprobe`` nearest clusters — ``nprobe/n_clusters`` of the corpus
    instead of all of it (with partition pruning at scale)."""
    cents = ivf_centroids(
        embeddings, n_clusters, id_col, vec_col, strategy=strategy
    )
    order = sorted(
        range(len(cents)), key=lambda i: (-_cosine_py(query_vec, cents[i]), i)
    )
    probes = order[:nprobe]
    cand = with_ivf_cluster(embeddings, cents, vec_col).filter(
        F.col("cluster").isin(probes)
    )
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


# --- product quantization (IVF-PQ's compression half) ----------------------
#
# The classic memory lever for billion-vector ANN (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", public literature): split the
# d-dim vector into M subvectors, quantize each against a K-entry codebook,
# store M small codes instead of d floats (64 doubles -> 8 bytes at
# M=8/K=256-).  Queries scan codes with an ADC lookup table — here a pure
# Column expression over a broadcast literal LUT, so the scan stays inside
# whole-stage codegen; only the train/encode build step uses Arrow batches.


def train_pq(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace codebooks (M x K x d/M), trained 'seed'-style: the
    subvectors of K evenly-id-spaced corpus vectors — deterministic, one
    tiny collect, same spirit as ivf_centroids(strategy='seed')."""
    import numpy as np

    n = embeddings.count()
    stride = max(1, n // k)
    rows = (
        embeddings.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
        .filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    # normalize so inner-product ADC approximates cosine
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    d = mat.shape[1]
    sub = d // m
    return [
        [list(map(float, mat[j, i * sub : (i + 1) * sub])) for j in range(len(mat))]
        for i in range(m)
    ]


def encode_pq(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Attach the M-byte PQ code (argmin subspace distance per codebook) —
    an Arrow batch job run once at index-build time; at scale the codes are
    a stored column of the embedding table."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.array(b, dtype=np.float64) for b in codebooks]

    keyed = embeddings.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    )

    def op(batches):
        for pdf in batches:
            vmat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            vmat = vmat / np.maximum(
                np.linalg.norm(vmat, axis=1, keepdims=True), 1e-30
            )
            codes = np.empty((len(vmat), m), dtype=np.int32)
            for i in range(m):
                seg = vmat[:, i * sub : (i + 1) * sub]
                d2 = ((seg[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], code_col: list(codes.tolist())}
            )

    return keyed.mapInPandas(op, schema=f"{id_col} long, {code_col} array<int>")


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: int = 0,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate top-k by asymmetric-distance (ADC) inner product.

    The query builds an M*K lookup table of subspace inner products; each
    row's score is the sum of M ``element_at`` probes into that literal —
    pure Column expression (zip_with + aggregate), no UDF, broadcast by
    construction, TakeOrderedAndProject plan.  With ``rerank > 0`` the
    ADC top-``rerank`` candidates are exactly re-scored against the full
    vectors (requires ``embeddings``) — the standard PQ-then-refine
    pipeline; returns (id, cos).  Without rerank returns (id, adc_score).
    """
    import math

    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / qn for x in query_vec]
    flat_lut = [
        sum(q[i * sub + t] * codebooks[i][j][t] for t in range(sub))
        for i in range(m)
        for j in range(kk)
    ]
    lut = F.lit([float(x) for x in flat_lut]).cast("array<double>")
    subspace_idx = F.lit(list(range(m))).cast("array<int>")
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            subspace_idx,
            lambda c, i: F.element_at(lut, i * kk + c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = encoded.select(F.col(id_col), score.alias("adc_score"))
    if not rerank:
        return scored.orderBy(F.desc("adc_score"), F.col(id_col)).limit(k)
    if embeddings is None:
        raise ValueError("rerank needs the full-vector frame")
    cand = scored.orderBy(F.desc("adc_score"), F.col(id_col)).limit(rerank)
    qcol = F.lit([float(x) for x in query_vec]).cast("array<double>")
    exact = embeddings.join(F.broadcast(cand.select(id_col)), on=id_col).select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), qcol), 6).alias("cos"),
    )
    return exact.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    m: int = 8,
    pq_k: int = 16,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ivf_strategy: str = "seed",
) -> DataFrame:
    """IVF-PQ: the two halves composed — the coarse quantizer prunes to
    ``nprobe`` clusters (a partition-pruned directory read on the stored
    layout) and the PQ ADC expression scores only the surviving codes,
    with an exact rerank of the top candidates.  At 100 TB this is the
    canonical billion-vector shape: scan nprobe/n_clusters of the corpus,
    touch M bytes per vector, re-read full vectors only for ``rerank``
    rows."""
    cents = ivf_centroids(
        embeddings, n_clusters, id_col, vec_col, strategy=ivf_strategy
    )
    order = sorted(
        range(len(cents)), key=lambda i: (-_cosine_py(query_vec, cents[i]), i)
    )
    probes = order[:nprobe]
    cand = with_ivf_cluster(embeddings, cents, vec_col).filter(
        F.col("cluster").isin(probes)
    )
    books = train_pq(embeddings, m=m, k=pq_k, id_col=id_col, vec_col=vec_col)
    enc = encode_pq(cand, books, id_col=id_col, vec_col=vec_col)
    return pq_topk(
        enc,
        books,
        query_vec,
        k=k,
        rerank=rerank,
        embeddings=cand,
        id_col=id_col,
        vec_col=vec_col,
    )


def train_pq_residual(
    embeddings: DataFrame,
    centroids: list[list[float]],
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Codebooks trained on IVF residuals (v_norm − nearest centroid) —
    the FAISS IVF-PQ shape.  Residuals concentrate near the origin with
    far less variance than raw vectors, so the same M×K code budget
    quantizes them much more accurately.  Seed-style deterministic
    training (K evenly-id-spaced residuals), matching ``train_pq``."""
    import numpy as np

    n = embeddings.count()
    stride = max(1, n // k)
    rows = (
        embeddings.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
        .filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents = np.array(centroids, dtype=np.float64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    assign = (mat @ cn.T).argmax(axis=1)
    res = mat - cents[assign]
    d = res.shape[1]
    sub = d // m
    return [
        [
            list(map(float, res[j, i * sub : (i + 1) * sub]))
            for j in range(len(res))
        ]
        for i in range(m)
    ]


def encode_pq_residual(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, pq_code) with codes over the residual v_norm − c —
    one Arrow pass at index-build time (stored columns at scale)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    cents = np.array(centroids, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)

    keyed = embeddings.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    )

    def op(batches):
        for pdf in batches:
            vmat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            vmat = vmat / np.maximum(
                np.linalg.norm(vmat, axis=1, keepdims=True), 1e-30
            )
            assign = (vmat @ cn.T).argmax(axis=1)
            res = vmat - cents[assign]
            codes = np.empty((len(vmat), m), dtype=np.int32)
            for i in range(m):
                seg = res[:, i * sub : (i + 1) * sub]
                d2 = ((seg[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": assign.astype("int32"),
                    "pq_code": list(codes.tolist()),
                }
            )

    return keyed.mapInPandas(
        op, schema=f"{id_col} long, cluster int, pq_code array<int>"
    )


def ivfpq_residual_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    m: int = 8,
    pq_k: int = 16,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ivf_strategy: str = "seed",
) -> DataFrame:
    """IVF-PQ with residual encoding — exact decomposition
    ``q·v ≈ q·c + q·r`` where ``r = v_norm − c``: the per-cluster term is
    a broadcast map literal, the residual term is the same ADC lookup
    expression as ``pq_topk`` (codebooks shared across clusters, so ONE
    query table serves every probed cluster), and the top candidates are
    exactly re-scored.  Everything after the Arrow encode pass is pure
    Column expressions over ``nprobe/n_clusters`` of the corpus."""
    import math

    cents = ivf_centroids(
        embeddings, n_clusters, id_col, vec_col, strategy=ivf_strategy
    )
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / qn for x in query_vec]
    order = sorted(
        range(len(cents)), key=lambda i: (-_cosine_py(query_vec, cents[i]), i)
    )
    probes = order[:nprobe]

    books = train_pq_residual(
        embeddings, cents, m=m, k=pq_k, id_col=id_col, vec_col=vec_col
    )
    cand = with_ivf_cluster(embeddings, cents, vec_col).filter(
        F.col("cluster").isin(probes)
    )
    enc = encode_pq_residual(cand, cents, books, id_col=id_col, vec_col=vec_col)

    kk = len(books[0])
    sub = len(books[0][0])
    flat_lut = [
        sum(q[i * sub + t] * books[i][j][t] for t in range(sub))
        for i in range(m)
        for j in range(kk)
    ]
    lut = F.lit([float(x) for x in flat_lut]).cast("array<double>")
    subspace_idx = F.lit(list(range(m))).cast("array<int>")
    qc = {
        int(c): float(sum(q[t] * cents[c][t] for t in range(len(q))))
        for c in probes
    }
    offset_map = F.create_map(
        *[F.lit(v) for c in sorted(qc) for v in (c, qc[c])]
    )
    score = offset_map[F.col("cluster")] + F.aggregate(
        F.zip_with(
            F.col("pq_code"),
            subspace_idx,
            lambda c, i: F.element_at(lut, i * kk + c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = enc.select(F.col(id_col), score.alias("adc_score"))
    candtop = scored.orderBy(F.desc("adc_score"), F.col(id_col)).limit(rerank)
    qcol = F.lit([float(x) for x in query_vec]).cast("array<double>")
    exact = cand.join(F.broadcast(candtop.select(id_col)), on=id_col).select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), qcol), 6).alias("cos"),
    )
    return exact.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def cosine_topk_many(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors for a BATCH of query vectors — the shape a
    training pipeline actually runs (dedup a new shard against anchors,
    mine hard negatives for a whole batch).

    The query set broadcasts against the corpus scan (one pass over the
    big side however many queries ride along), and per-query top-k is a
    rank window partitioned by query id — state per group is k rows.
    At 100 TB compose with the bucket/cluster prefilters (probe each
    query's LSH bucket or IVF clusters first) exactly as the single-query
    variants do."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(query_vec_col)).alias("_qv")
    )
    scored = embeddings.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    ).join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
