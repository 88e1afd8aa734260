"""Benchmark decontamination: drop training documents that share word
n-grams with an evaluation/benchmark set.

Standard LLM training-data hygiene (GPT-3 used 13-gram overlap, Llama-2
8-gram / skip-gram variants): any training document containing a long
n-gram that also appears in a held-out benchmark is suspected test-set
leakage and must be flagged or removed before training.

Shape (the 100 TB design):

- The benchmark side is *small* (thousands of eval documents, ~1e6
  distinct n-grams) — its distinct-gram set is built once and broadcast,
  so the training corpus is matched in a single map-side pass: explode
  per-doc distinct grams -> broadcast-hash semi/inner join -> per-doc
  count.  No shuffle of the corpus at all when the join broadcasts; the
  only aggregation is the per-doc hit count, keyed by near-unique doc_id
  (skew-free, map-side combinable).
- Gram explosion is bounded: ``array_distinct`` first, so a document
  contributes each gram once regardless of internal repetition.
- Everything is built-in Column expressions (split / transform / slice /
  explode) — whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.pipeline.textstats import _ngrams

#: default overlap gram length (words) — Llama-2-style
DEFAULT_N = 8


def _distinct_grams(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngrams(toks, n))).alias("gram"),
    )


def contamination(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-document contamination evidence.

    Returns ``(id_col, n_hits)`` for every training document sharing at
    least one distinct word ``n``-gram with ``eval_docs`` — ``n_hits`` is
    the number of *distinct* shared grams.  Documents with no overlap are
    absent (filter-side semantics; join them back for a full ledger).

    ``broadcast_eval=False`` drops the broadcast hint for eval sets too
    large to fit one executor (beyond ~10^8 distinct grams) — the join
    degrades gracefully to a gram-keyed shuffle, where uniform hash keys
    keep it skew-free.
    """
    ev = (
        _distinct_grams(eval_docs, n, id_col, text_col)
        .select("gram")
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _distinct_grams(documents, n, id_col, text_col)
    hits = tr.join(ev, "gram")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The clean corpus: training documents with at most ``max_hits``
    distinct benchmark n-grams (default: zero tolerance).

    Implemented as an anti-join against the flagged set — the corpus
    payload never shuffles; only doc_ids of flagged docs (a tiny frame)
    move.
    """
    flagged = contamination(documents, eval_docs, n, id_col, text_col).filter(
        F.col("n_hits") > max_hits
    )
    return documents.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )


def fuzzy_contamination(
    documents: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """Paraphrase-level contamination: training documents that are NEAR
    duplicates of an eval document (MinHash+LSH, Jaccard >= threshold) —
    catches the leakage exact n-gram matching misses (reworded or lightly
    edited benchmark items).

    Returns ``(id_col, eval_id, jaccard)`` per contaminated pair.  Ids of
    the two frames must be disjoint (they are different corpora).  Shape:
    one banded MinHash pass over the union — the eval side rides the same
    shuffle keys as the corpus, so the cost class is identical to the
    within-corpus near-dup pass.
    """
    from fastdb_spark.pipeline.dedup import minhash_lsh_pairs

    both = documents.select(F.col(id_col), F.col(text_col)).unionByName(
        eval_docs.select(F.col(id_col), F.col(text_col))
    )
    pairs = minhash_lsh_pairs(
        both, id_col=id_col, text_col=text_col, threshold=threshold,
        **minhash_kwargs,
    )
    ev = eval_docs.select(F.col(id_col).alias("_eid"))
    tagged = (
        pairs.join(F.broadcast(ev), pairs["id_a"] == F.col("_eid"), "left")
        .withColumn("_a_ev", F.col("_eid").isNotNull())
        .drop("_eid")
        .join(F.broadcast(ev), pairs["id_b"] == F.col("_eid"), "left")
        .withColumn("_b_ev", F.col("_eid").isNotNull())
        .drop("_eid")
    )
    cross = tagged.filter(F.col("_a_ev") != F.col("_b_ev"))
    return cross.select(
        F.when(F.col("_a_ev"), F.col("id_b")).otherwise(F.col("id_a")).alias(id_col),
        F.when(F.col("_a_ev"), F.col("id_a")).otherwise(F.col("id_b")).alias("eval_id"),
        "jaccard",
    )


def decontaminate_fuzzy(
    documents: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """The clean corpus under the near-duplicate criterion (anti-join of
    the fuzzy flags — only flagged ids move)."""
    flagged = fuzzy_contamination(
        documents, eval_docs, threshold, id_col, text_col, **minhash_kwargs
    ).select(id_col).distinct()
    return documents.join(F.broadcast(flagged), id_col, "left_anti")


def contamination_oracle_sql(
    n: int = DEFAULT_N, eval_pred: str = "doc_id % 97 = 0"
) -> str:
    """duckdb twin of ``contamination`` with the eval split taken from the
    same table by predicate (how the gate query builds its benchmark)."""
    grams = (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len(t) - {n - 1}, 0)), "
        f"i -> array_to_string(t[i:i+{n - 1}], ' ')))"
    )
    return f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        ev AS (SELECT DISTINCT unnest({grams}) AS gram
               FROM toks WHERE {eval_pred}),
        tr AS (SELECT doc_id, unnest({grams}) AS gram
               FROM toks WHERE NOT ({eval_pred}))
        SELECT tr.doc_id, count(*) AS n_hits
        FROM tr JOIN ev USING (gram)
        GROUP BY tr.doc_id
    """
