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
