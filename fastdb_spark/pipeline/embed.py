"""Representation learning for the corpus: Word2Vec word vectors and
document embeddings, feeding the ANN family.

The missing link between the text operators and the vector operators:
train word vectors on the corpus (MLlib Word2Vec — skip-gram, the
public Mikolov 2013 algorithm, distributed by the built-in estimator),
pool them into document embeddings JVM-side (posexplode + one hash
aggregate — no Python in the pooling path), and hand the result to
``pipeline.ann``
(brute-force / IVF / PQ) for similarity search over documents.

Determinism note: MLlib Word2Vec is seedable but its distributed
gradient updates are partition-order dependent; with
``num_partitions=1`` and a fixed seed the fit is reproducible (the
configuration the tests pin).  At 100 TB the fit is run once offline
and the WORD VECTOR TABLE is the persisted artifact — training
nondeterminism never touches the (deterministic) pooling/search path,
which is why the gates for this family are rows-only while everything
downstream of a frozen vector table stays exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_word_vectors(
    docs: DataFrame,
    dim: int = 32,
    min_count: int = 1,
    seed: int = 42,
    num_partitions: int = 1,
    max_iter: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Fit Word2Vec on the whitespace-tokenized corpus; returns the word
    vector table ``(word, vector array<float>)`` — the persistable
    artifact everything downstream consumes."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    toks = docs.select(F.split(F.col(text_col), " ").alias("toks"))
    model = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        numPartitions=num_partitions,
        maxIter=max_iter,
        inputCol="toks",
        outputCol="vec",
    ).fit(toks)
    return model.getVectors().select(
        "word",
        vector_to_array(F.col("vector")).cast("array<float>").alias("vector"),
    )


def doc_embeddings(
    docs: DataFrame,
    word_vectors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean-of-word-vectors document embeddings, entirely JVM-side.

    Shape: explode tokens -> broadcast-join the word-vector table (it is
    vocabulary-sized, not corpus-sized) -> per-(doc, dimension) average
    via posexplode + one hash aggregate -> re-assemble the array with an
    ordered collect.  Words missing from the table are skipped — the
    mean is over IN-VOCABULARY token occurrences only.  Note this
    deliberately diverges from Spark ML's ``Word2VecModel.transform``,
    which divides the vector sum by the FULL sentence length including
    OOV tokens; with ``min_count > 1`` the two differ whenever a
    document carries OOV words.  Returns
    ``(id_col, embedding array<float>)``."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    joined = toks.join(F.broadcast(word_vectors), "word")
    dims = joined.select(
        id_col, F.posexplode(F.col("vector")).alias("dim", "val")
    )
    per_dim = dims.groupBy(id_col, "dim").agg(F.avg("val").alias("mean"))
    return per_dim.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("mean")))
        ).alias("_dm")
    ).select(
        id_col,
        F.transform(F.col("_dm"), lambda s: s["mean"].cast("float")).alias(
            "embedding"
        ),
    )


def similar_documents(
    docs: DataFrame,
    query_doc_id: int,
    k: int = 10,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_vectors: DataFrame | None = None,
) -> DataFrame:
    """Self-contained semantic doc search: train (or reuse) word
    vectors, embed the corpus, and return the ``k`` nearest documents to
    ``query_doc_id`` by cosine (brute-force top-k; swap in the IVF/PQ
    index for large corpora — the embedding frame is schema-compatible
    with ``pipeline.ann``)."""
    from fastdb_spark.pipeline.ann import cosine_topk

    if word_vectors is None:
        word_vectors = train_word_vectors(docs, dim=dim, text_col=text_col)
    embs = doc_embeddings(docs, word_vectors, id_col=id_col, text_col=text_col)
    embs = embs.withColumnRenamed(id_col, "vec_id")
    q = embs.filter(F.col("vec_id") == query_doc_id).head()
    if q is None:
        raise ValueError(f"query doc {query_doc_id} has no embedding")
    out = cosine_topk(embs, list(q["embedding"]), k=k + 1)
    return out.filter(F.col("vec_id") != query_doc_id).limit(k)
