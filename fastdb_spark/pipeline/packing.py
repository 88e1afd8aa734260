"""Sequence packing: lay documents end-to-end into fixed-length training
sequences (the standard concat-and-chunk pretraining layout) and emit the
placement ledger — for each document, which sequence it starts in and at
what offset.

Semantics: documents are concatenated in a total order (default: by id)
into one token stream; the stream is chunked every ``seq_len`` tokens.
A document whose tokens straddle a chunk boundary spans multiple
sequences (exactly how GPT-style pipelines pack — no padding, no
re-ordering).  The ledger is

    (id, n_tokens, seq_id, seq_offset, n_seqs_spanned)

where ``seq_id = floor(start / seq_len)``, ``seq_offset = start mod
seq_len`` and ``start`` is the document's global token offset.

The 100 TB shape — a global running sum WITHOUT a single-task window:

1. range-shuffle on the order key (``repartitionByRange`` — the same
   machinery as ``orderBy``),
2. partition-local cumulative sums via a partition-bounded window (each
   task scans only its own range),
3. ONE key-only job gathers per-partition token totals; their prefix
   sums become broadcast base offsets,
4. global offset = partition base + local cumsum (a map-side add).

This is the ``paginate_ranged`` pattern applied to weights instead of row
counts; everything stays JVM-side and all arithmetic is exact integers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fastdb_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    order_by: Sequence[str | Column] = ("doc_id",),
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Placement ledger for concat-and-chunk packing at ``seq_len`` tokens.

    ``token_col`` supplies precomputed token counts; otherwise tokens are
    counted from ``text_col`` (single-space split, matching the corpus
    tokenizer).  Zero-token documents get ``n_seqs_spanned = 0`` at the
    position where they fall.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if token_col is None:
        base = df.select(
            F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
        )
    else:
        base = df.select(F.col(id_col), F.col(token_col).alias("n_tokens"))

    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    # staged (cachereg-tracked) so the range shuffle feeding the totals
    # job is reused by the ledger read — same policy as paginate_ranged
    from fastdb_spark.cachereg import stage

    rdf = stage(
        base.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id()),
        eager=True,
    )
    totals = {
        r["_pid"]: r["tok"]
        for r in rdf.groupBy("_pid").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid] or 0

    base_map = F.create_map(
        *[F.lit(v) for pid in sorted(bases) for v in (pid, bases[pid])]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = base_map[F.col("_pid")] + F.sum("n_tokens").over(w) - F.col("n_tokens")
    # integer-exact until total tokens ~2^53 (double division both engines;
    # quotients stay exactly representable far past any real corpus)
    L = F.lit(seq_len)
    return rdf.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(start / L).cast("long").alias("seq_id"),
        (start % L).alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.floor((start + F.col("n_tokens") - 1) / L)
            - F.floor(start / L)
            + 1
        )
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def pack_oracle_sql(seq_len: int, order_col: str = "doc_id") -> str:
    """duckdb twin of :func:`pack_sequences` over the ``documents`` table
    (token counts from the same single-space split) — a plain global
    window cumsum; all-integer arithmetic, so hash-exact by construction."""
    return f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY {order_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS start
          FROM t)
        SELECT doc_id, n_tokens,
               CAST(FLOOR(start / {seq_len}) AS BIGINT) AS seq_id,
               CAST(start % {seq_len} AS BIGINT) AS seq_offset,
               CAST(CASE WHEN n_tokens = 0 THEN 0
                    ELSE FLOOR((start + n_tokens - 1) / {seq_len})
                         - FLOOR(start / {seq_len}) + 1 END AS BIGINT)
                 AS n_seqs_spanned
        FROM c
    """
