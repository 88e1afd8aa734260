"""Derived test corpora with PLANTED duplicates.

The driver's synthetic ``documents`` / ``embeddings`` are near-orthogonal
(max 3-shingle Jaccard ~0.03, random embeddings), so near-dup operators
would return empty sets.  These derivations plant deterministic duplicates
— each exists as lockstep Spark builder + ANSI SQL (duckdb oracle CTE):

- ``neardup_docs``  — every 5th doc re-appears (id+1000000) with its last
                      3 tokens dropped (high-Jaccard near-duplicate).
- ``exactdup_docs`` — every 7th doc re-appears verbatim (id+2000000).
- ``neardup_embs``  — every 5th vector re-appears (id+1000000) with its
                      first component shifted by +0.05 (cosine ~0.999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEARDUP_DOCS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       array_to_string(
         string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 3, 1)],
         ' ') AS text
FROM documents WHERE doc_id % 5 = 0
"""


def neardup_docs(documents: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    trunc = F.array_join(
        F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1))), " "
    )
    planted = (
        documents.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"), trunc.alias("text")
        )
    )
    return documents.select("doc_id", "text").unionAll(planted)


EXACTDUP_DOCS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def exactdup_docs(documents: DataFrame) -> DataFrame:
    planted = documents.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return documents.select("doc_id", "text").unionAll(planted)


#: curation corpus: originals + truncated near-dups + verbatim exact dups
CURATE_DOCS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       array_to_string(
         string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 3, 1)],
         ' ') AS text
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def curate_docs(documents: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    trunc = F.array_join(
        F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1))), " "
    )
    near = documents.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), trunc.alias("text")
    )
    exact = documents.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return documents.select("doc_id", "text").unionAll(near).unionAll(exact)


NEARDUP_EMBS_SQL = """
SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       list_concat([embedding[1]::DOUBLE + 0.05],
                   (embedding::DOUBLE[])[2:len(embedding)]) AS embedding
FROM embeddings WHERE vec_id % 5 = 0
"""


def clustered_embs(
    embeddings: DataFrame,
    n_centers: int = 25,
    spread: float = 0.1,
    dim: int = 64,
) -> DataFrame:
    """Impose NEIGHBORHOOD STRUCTURE on the driver's uniform-random
    embeddings so approximate-ANN recall is a meaningful number: vector i
    becomes ``center[vec_id % n_centers] + spread * original`` — the
    original uniform vector is demoted to intra-cluster noise around a
    deterministic center (md5-derived, the `_hyperplane` constants — no
    RNG state, stable across runs/engines).

    On the raw uniform corpus every approximate variant's recall@10 is
    data-noise (~0.2–0.9 by luck, not by operator); on this derivation
    the true neighbors of a query really are its cluster siblings, so
    the emitted recall@10 measures the index.  Pure column expressions:
    a literal-array ``element_at`` pick + one ``zip_with``, scan-stage
    only."""
    from fastdb_spark.functions.vectors import nested_double_array_lit
    from fastdb_spark.pipeline.ann import _hyperplane

    # one expr-string literal (r12): the per-center F.lit loop cost ~2 s
    # of py4j driver time per plan construction, paid by EVERY gate that
    # reads this derivation (all approximate-ANN + semantic gates)
    centers = nested_double_array_lit(
        [_hyperplane(1000 + c, dim) for c in range(n_centers)]
    )
    center = F.element_at(
        centers, (F.pmod(F.col("vec_id"), F.lit(n_centers)) + 1).cast("int")
    )
    v = F.col("embedding").cast("array<double>")
    mixed = F.zip_with(center, v, lambda c, e: c + F.lit(float(spread)) * e)
    return embeddings.select("vec_id", mixed.alias("embedding"))


def neardup_embs(embeddings: DataFrame) -> DataFrame:
    v = F.col("embedding").cast("array<double>")
    perturbed = F.concat(
        F.array(F.element_at(v, 1) + 0.05),
        F.slice(v, 2, F.size(v) - 1),
    )
    planted = (
        embeddings.filter(F.col("vec_id") % 5 == 0)
        .select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            perturbed.alias("embedding"),
        )
    )
    return embeddings.select("vec_id", v.alias("embedding")).unionAll(planted)


#: intra-doc repetition corpus: originals + docs whose 16-token prefix is
#: pasted twice (BLOCK-ALIGNED duplication, so 16-token block dedup
#: provably collapses the planted copy back to one block)
INTRADUP_DOCS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 3000000 AS doc_id,
       array_to_string(string_split(text, ' ')[1:16], ' ') || ' ' ||
       array_to_string(string_split(text, ' ')[1:16], ' ') AS text
FROM documents WHERE doc_id % 11 = 0
"""


def intradup_docs(documents: DataFrame) -> DataFrame:
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 16), " ")
    doubled = documents.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat_ws(" ", prefix, prefix).alias("text"),
    )
    return documents.select("doc_id", "text").unionAll(doubled)
