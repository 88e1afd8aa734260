"""Document deduplication operators.

Every operator returns DataFrames (lazily composed) and is built from
shuffle-conscious primitives:

- **exact**: one hash-aggregate on the content fingerprint.
- **blocked n-gram Jaccard**: equi-join on a cheap blocking key (prefix
  fingerprint), exact Jaccard refine — no quadratic blowup.
- **MinHash + LSH**: signature projection (no shuffle) -> band explode ->
  band-bucket self-join -> exact Jaccard refine on candidates only.
- **SimHash**: 60-bit sketch -> band-bucket join -> hamming refine.
- **embedding cosine**: exact threshold self-join (baseline) — the ANN
  module provides the LSH-bucketed scale path.

At 100 TB the only full-data shuffles are the band-bucket groupings whose
keys are uniform hashes (no skew); candidate refinement touches candidate
pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from fastdb_spark.functions.sketches import (
    hamming60,
    lsh_band_hashes,
    minhash_signature,
    simhash60,
    simhash_bands,
)
from fastdb_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    prefix_fingerprint,
    word_shingles,
)
from fastdb_spark.functions.vectors import as_double_array, cosine


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups: md5 of normalized text, keep the minimum id
    as the canonical representative.  One map-side-combined aggregate."""
    keyed = df.select(
        F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    return keyed.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
        F.array_sort(F.collect_list(id_col)).alias("members"),
    )


def _stage(df: DataFrame) -> DataFrame:
    """Persist a sketch frame that downstream branches read more than once
    (bucket join + payload re-attach).  Without this the md5-heavy
    signature projection re-executes once per branch — the reference
    stages the same way with temp tables (SURVEY.md Q3).  MEMORY_AND_DISK:
    at 100 TB the signature frame is a small fraction of the corpus and
    spills gracefully rather than OOMing.

    Materialization is EAGER (count action): the consuming branches run
    concurrently inside one downstream job, and a lazily-filled cache
    loses the race — both branches recompute the full projection before
    either populates it (measured ~2x on the composed curation pipeline).
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df


def _candidate_pairs(
    buckets: DataFrame,
    payload: DataFrame | None,
    id_col: str,
    bucket_col: str,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing a bucket value.  The self-join
    is an equi-join on the bucket key — co-candidates are co-partitioned.

    Two-phase for shuffle economy: the bucket join and pair-dedup move
    only (bucket, id) — the heavy payloads (shingle arrays) re-attach via
    two id-equi-joins on the deduped candidate list, which is orders of
    magnitude smaller than the banded row set.  ``payload`` (already
    staged by the caller) carries ``id_col`` + the refine columns.
    """
    ids = buckets.select(F.col(bucket_col).alias("_bkt"), F.col(id_col))
    left = ids.select("_bkt", F.col(id_col).alias("id_a"))
    right = ids.select("_bkt", F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, on="_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if payload is None:
        return pairs
    payload_cols = [c for c in payload.columns if c != id_col]
    pa = payload.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    pb = payload.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return pairs.join(pa, on="id_a").join(pb, on="id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
    block_tokens: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via prefix blocking + exact char-n-gram Jaccard."""
    keyed = _stage(
        df.select(
            F.col(id_col),
            prefix_fingerprint(F.col(text_col), block_tokens).alias("block"),
            char_shingles(F.col(text_col), shingle_k).alias("sh"),
        )
    )
    pairs = _candidate_pairs(
        keyed.select(id_col, "block"), keyed.select(id_col, "sh"), id_col, "block"
    )
    out = pairs.withColumn(
        "jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding + exact Jaccard
    refine (shingle->minhash->band->bucket-join)."""
    rows = n_hashes // bands
    # stage pre-explode: the banded set duplicates the shingle payload
    # `bands` times; caching the compact (id, sh, sig) frame instead keeps
    # the cache footprint minimal while still computing signatures once
    keyed = _stage(
        df.select(
            F.col(id_col),
            word_shingles(F.col(text_col), shingle_k).alias("sh"),
        ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    )
    banded = keyed.select(
        id_col,
        F.explode(lsh_band_hashes(F.col("sig"), bands, rows)).alias("band"),
    )
    pairs = _candidate_pairs(banded, keyed.select(id_col, "sh"), id_col, "band")
    out = pairs.withColumn(
        "jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    max_hamming: int = 16,
) -> DataFrame:
    """Near-dup pairs via 60-bit SimHash band buckets + hamming refine."""
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    hashed = _stage(simhash60(sh, id_col, "sh"))
    banded = hashed.select(
        id_col,
        F.posexplode(simhash_bands(F.col("simhash"))).alias("_pos", "_bval"),
    ).select(
        id_col,
        F.concat_ws(":", F.col("_pos"), F.col("_bval")).alias("band_key"),
    )
    pairs = _candidate_pairs(
        banded, hashed.select(id_col, "simhash"), id_col, "band_key"
    )
    out = pairs.withColumn(
        "hamming", hamming60(F.col("simhash_a"), F.col("simhash_b"))
    )
    return out.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    strategy: str = "blas",
) -> DataFrame:
    """Exact cosine near-dup pairs over the full corpus.

    ``strategy='blas'`` (default): broadcast the (small) normalized matrix
    to every task and scan the corpus with an Arrow-batched numpy matmul —
    each batch of rows scores against all higher-id rows in one GEMM.
    This is the textbook "builtins can't express it efficiently" case:
    the expression-level nested-loop join evaluates an interpreted
    higher-order aggregate per pair (~100x slower).  At 100 TB the same
    kernel runs per LSH/IVF bucket instead of the full matrix.

    ``strategy='expr'``: pure Column-expression nested-loop join —
    JVM-only, no Arrow; kept as the portable fallback and oracle twin.
    """
    if strategy == "expr":
        keyed = df.select(
            F.col(id_col), as_double_array(F.col(vec_col)).alias("v")
        )
        a = keyed.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
        b = keyed.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        out = pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        return out.filter(F.col("cos") >= threshold).select("id_a", "id_b", "cos")

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    keyed = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
    # corpus matrix must fit one machine's memory; at scale this becomes
    # the per-bucket matrix, not the full corpus.  Arrow toPandas is ~6x
    # faster than collect() for the wide array column (measured 0.4s vs
    # 2.6s on 2400x64 at sf0.1)
    cpdf = keyed.toPandas()
    ids = cpdf[id_col].to_numpy(dtype=np.int64)
    mat = np.array(cpdf["v"].tolist(), dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    order = np.argsort(ids)
    ids, mat, norms = ids[order], mat[order], norms[order]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def op(batches):
        aids, amat, anorms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q = np.array(pdf["v"].tolist(), dtype=np.float64)
            qids = pdf[id_col].to_numpy()
            qn = np.sqrt((q * q).sum(axis=1))
            cos = (q @ amat.T) / np.outer(qn, anorms)
            for r in range(len(qids)):
                mask = (aids > qids[r]) & (
                    np.round(cos[r], 6) >= threshold
                )
                if mask.any():
                    yield pd.DataFrame(
                        {
                            "id_a": np.full(mask.sum(), qids[r], dtype=np.int64),
                            "id_b": aids[mask],
                            "cos": np.round(cos[r][mask], 6),
                        }
                    )

    return keyed.mapInPandas(op, schema="id_a long, id_b long, cos double")
