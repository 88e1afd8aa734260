"""Training-data last mile: deterministic global shuffle into fixed
shards, and token-budget corpus selection.

A pretraining run wants the curated corpus (i) globally shuffled so that
no shard is dominated by one domain/crawl-segment, (ii) cut into a FIXED
number of shards that data loaders can stripe over, and (iii) trimmed to
a token budget (optionally per stratum, to hit a mixture at a budget).

Both operators here are deterministic pure functions of the row id — the
same md5-prefix uniform the sampling family uses (`sample.hash_uniform`)
— so a re-run after a failure produces byte-identical shards, and every
decision is expressible in ANSI SQL for the duckdb oracle.

Spark shape / 100 TB notes:
- ``shuffle_to_shards`` is ONE shuffle: the row's shard is a scan-stage
  column expression (md5 prefix mod n), and the intra-shard position is
  a ``row_number`` window partitioned by shard — i.e. exactly the
  exchange that writing the shards needs anyway.  Shard count chooses
  the per-task sort size: at 100 TB pick n_shards so a shard is
  100-500 MB (the loader-friendly size), which also keeps the per-task
  window sort trivially in memory.  The hash key decorrelates adjacent
  input rows, which is precisely the "global shuffle" a training loader
  wants — no global total-order sort is ever materialized.
- ``token_budget_select`` is one window over the stratum partition: a
  running token sum in deterministic hash order, kept while the budget
  is unfilled.  The heavy input stays columnar; the only shuffle is the
  per-stratum exchange.  With very few strata and huge corpora, salt the
  stratum into sub-partitions and budget each at share/k (documented
  escape hatch; correctness of the exact operator is per-stratum).

No reference twin: FASTDB has no training-export path — this family
comes from the public LLM-data-pipeline literature (e.g. the shard/
budget steps described in the Pile / RefinedWeb / Dolma reports).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fastdb_spark.functions.text import token_count
from fastdb_spark.pipeline.sample import _DENOM  # noqa: F401  (shared denom)


def _hash_key(id_col: Column, salt: str = "") -> Column:
    """32-bit deterministic key from md5(salt || id) — the shuffle order.

    Identical arithmetic exists in duckdb
    (``('0x' || substr(md5(...), 1, 8))::BIGINT``), so shard assignment
    and ordering are oracle-checkable."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def shuffle_to_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row a ``(shard, pos)``: a deterministic global
    shuffle cut into ``n_shards`` fixed shards.

    ``shard`` = md5-prefix(id) mod n_shards (scan-stage expression, no
    shuffle); ``pos`` = 0-based rank of the row inside its shard in hash
    order (one exchange + per-shard sort — the same exchange a sharded
    write needs).  Ties on the 32-bit key break on the id, so the layout
    is total and reproducible."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive (got {n_shards})")
    key = _hash_key(F.col(id_col), salt)
    out = df.withColumn("_key", key).withColumn(
        "shard", (F.col("_key") % F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        out.withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_key")
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> None:
    """Materialize the shuffled corpus as ``path/shard=K/`` parquet, one
    directory per shard, rows inside each shard in shuffle order.

    The ``repartition(n, shard)`` matches the directory layout so each
    shard is written by exactly one task as one row-group-ordered file —
    a training loader can stream ``shard=K`` sequentially and see the
    deterministic shuffle order without any further sort."""
    out = shuffle_to_shards(df, n_shards, id_col=id_col, salt=salt)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shards_oracle_sql(
    table: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    select_cols: str = "*",
) -> str:
    """duckdb twin of :func:`shuffle_to_shards` — same md5-prefix key,
    same mod, same (key, id) intra-shard order."""
    key = f"('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
    return f"""
        WITH keyed AS (
          SELECT {select_cols}, {key} AS _key,
                 CAST({key} % {n_shards} AS INTEGER) AS shard
          FROM {table})
        SELECT * EXCLUDE (_key),
               CAST(row_number() OVER (PARTITION BY shard
                                       ORDER BY _key, {id_col}) - 1 AS BIGINT)
                 AS pos
        FROM keyed
    """


def token_budget_select(
    df: DataFrame,
    budget: int | dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Select documents up to a token budget, deterministically.

    Documents are taken in md5-hash order (the same unbiased order the
    shard shuffle uses) and kept while the running whitespace-token sum
    stays ``<= budget``; with ``stratum_col`` and a dict budget the cut
    is per stratum — the way a mixture target is hit at a fixed total
    budget.  Strata NOT named in a dict budget get budget 0, i.e. are
    dropped entirely (the mixture lists what it wants).  The first
    document that crosses the budget is EXCLUDED (conservative cut: the
    selection never exceeds the budget).

    Returns the kept rows with ``n_tokens`` (per doc) and ``cum_tokens``
    (running total within the stratum, including the row) appended.
    One window per stratum partition; decisions are oracle-checkable.
    """
    key = _hash_key(F.col(id_col), salt)
    out = df.withColumn("_key", key).withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )
    if stratum_col is None:
        if isinstance(budget, dict):
            raise ValueError(
                "a dict budget needs stratum_col (per-stratum budgets "
                "have no meaning without a stratum)"
            )
        part = Window.orderBy(F.col("_key"), F.col(id_col))
        budget_col = F.lit(int(budget))
    else:
        part = Window.partitionBy(stratum_col).orderBy(F.col("_key"), F.col(id_col))
        if isinstance(budget, dict):
            pairs: list[Column] = []
            for k, v in sorted(budget.items()):
                pairs.append(F.lit(k))
                pairs.append(F.lit(int(v)))
            budget_col = F.coalesce(
                F.create_map(*pairs)[F.col(stratum_col)], F.lit(0)
            )
        else:
            budget_col = F.lit(int(budget))
    w = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        out.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_col)
        .drop("_key")
    )


def token_budget_oracle_sql(
    table: str,
    budget: int | dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str | None = None,
    salt: str = "",
    select_cols: str = "*",
) -> str:
    """duckdb twin of :func:`token_budget_select` — same key, same order,
    same running-sum-inclusive conservative cut."""
    key = f"('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
    ntok = f"len(string_split({text_col}, ' '))"
    if stratum_col is None:
        over = f"OVER (ORDER BY _key, {id_col} ROWS UNBOUNDED PRECEDING)"
        budget_sql = str(int(budget))
    else:
        over = (
            f"OVER (PARTITION BY {stratum_col} ORDER BY _key, {id_col} "
            "ROWS UNBOUNDED PRECEDING)"
        )
        if isinstance(budget, dict):
            cases = " ".join(
                f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(budget.items())
            )
            budget_sql = f"(CASE {stratum_col} {cases} ELSE 0 END)"
        else:
            budget_sql = str(int(budget))
    return f"""
        WITH keyed AS (
          SELECT {select_cols}, {key} AS _key,
                 CAST({ntok} AS BIGINT) AS n_tokens
          FROM {table}),
        summed AS (
          SELECT * EXCLUDE (_key),
                 CAST(sum(n_tokens) {over} AS BIGINT) AS cum_tokens
          FROM keyed)
        SELECT * FROM summed WHERE cum_tokens <= {budget_sql}
    """
