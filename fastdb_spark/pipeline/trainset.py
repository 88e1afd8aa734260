"""End-to-end training-set assembly — the composed last mile:

    curate (quality -> exact dedup -> near-dedup)
      -> leakage-safe split (by content fingerprint)
      -> per-domain token budget (deterministic hash order)
      -> global shuffle into fixed shards

One declarative DataFrame program; every stage is one of the tested
operators from this package, and every decision is a deterministic pure
function of row content/ids, so a failed run re-executes to the
byte-identical training set (the idempotency property the whole family
is built around).  The composition has an EXACT duckdb twin
(:func:`trainset_oracle_sql`) assembled from the stage oracles.

Spark shape / 100 TB notes: curation's staged frames (cachereg) are the
only persists; split and budget decisions are scan-stage expressions or
one window each; the shard assignment's exchange is the one the sharded
write needs anyway.  Between the stages nothing materializes — Catalyst
sees the whole program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.pipeline.curate import curate_corpus
from fastdb_spark.pipeline.sample import leakage_safe_split
from fastdb_spark.pipeline.shards import (
    shards_oracle_sql,
    shuffle_to_shards,
    token_budget_oracle_sql,
    token_budget_select,
    write_shards,
)


def build_training_set(
    docs: DataFrame,
    split_weights: dict[str, float],
    budgets: int | dict[str, int],
    stratum_col: str = "lang",
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.5,
    budget_salt: str = "tb",
    shard_salt: str = "sh",
    split_salt: str = "",
) -> DataFrame:
    """The train split of ``docs``, curated, budget-cut and sharded.

    Returns one row per selected training document:
    ``(id_col, stratum_col, n_tokens, cum_tokens, shard, pos)``.
    Only the ``train`` split flows on; val/test assignment is available
    by running :func:`leakage_safe_split` on the curated frame directly
    (same weights/salt -> identical assignment, by determinism).
    """
    curated = curate_corpus(
        docs.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        min_tokens=min_tokens,
        min_quality=min_quality,
        jaccard_threshold=jaccard_threshold,
    )
    # re-attach payload + stratum to the surviving ids; the curated frame
    # carries the content fingerprint the split groups on
    enriched = docs.join(
        curated.select(id_col, "fingerprint"), id_col
    )
    splitted = leakage_safe_split(
        enriched,
        split_weights,
        group_col="fingerprint",
        id_col=id_col,
        text_col=text_col,
        salt=split_salt,
    )
    train = splitted.filter(F.col("split") == "train")
    budgeted = token_budget_select(
        train,
        budgets,
        id_col=id_col,
        text_col=text_col,
        stratum_col=stratum_col,
        salt=budget_salt,
    )
    sharded = shuffle_to_shards(
        budgeted, n_shards, id_col=id_col, salt=shard_salt
    )
    return sharded.select(
        id_col, stratum_col, "n_tokens", "cum_tokens", "shard", "pos"
    )


def materialize_training_set(
    docs: DataFrame,
    path: str,
    split_weights: dict[str, float],
    budgets: int | dict[str, int],
    n_shards: int = 8,
    **kwargs,
) -> None:
    """Build and write the training set as ``path/shard=K/`` parquet —
    loader-ready layout, rows inside each shard in shuffle order."""
    ts = build_training_set(
        docs, split_weights, budgets, n_shards=n_shards, **kwargs
    )
    # the select keeps the ledger columns; write_shards re-derives
    # (shard, pos) — identical by determinism — so pass the ledger
    # straight through an ordered write instead
    (
        ts.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


__all__ = [
    "build_training_set",
    "materialize_training_set",
    "trainset_oracle_sql",
    "write_shards",
]


def trainset_oracle_sql(
    split_weights: dict[str, float],
    budgets: int | dict[str, int],
    stratum_col: str = "lang",
    n_shards: int = 8,
    min_tokens: int = 10,
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.5,
    budget_salt: str = "tb",
    shard_salt: str = "sh",
    split_salt: str = "",
) -> str:
    """duckdb twin of :func:`build_training_set`, assembled from the
    stage oracles (curate -> split -> budget -> shards) as nested CTEs."""
    from fastdb_spark.pipeline.oracles import curate_sql
    from fastdb_spark.pipeline.sample import split_oracle_sql

    curate = curate_sql(
        min_tokens=min_tokens,
        min_quality=min_quality,
        threshold=jaccard_threshold,
        corpus_sql="SELECT doc_id, text FROM documents",
    )
    split = split_oracle_sql(
        "src",
        split_weights,
        group_sql="fingerprint",
        salt=split_salt,
        select_cols=f"doc_id, {stratum_col}, text",
    )
    budget = token_budget_oracle_sql(
        "train",
        budgets,
        stratum_col=stratum_col,
        salt=budget_salt,
        select_cols=f"doc_id, {stratum_col}",
    )
    shard = shards_oracle_sql(
        "budgeted",
        n_shards,
        salt=shard_salt,
        select_cols=f"doc_id, {stratum_col}, n_tokens, cum_tokens",
    )
    return f"""
        WITH curated AS ({curate}),
        src AS (SELECT d.doc_id, d.{stratum_col}, d.text, c.fingerprint
                FROM documents d JOIN curated c USING (doc_id)),
        splitted AS ({split}),
        train AS (SELECT doc_id, {stratum_col}, text
                  FROM splitted WHERE split = 'train'),
        budgeted AS ({budget})
        SELECT * FROM ({shard})
    """
