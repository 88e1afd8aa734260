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

The 100 TB shape — a global running sum WITHOUT a single-task window and
with ONE shuffle:

1. an order-preserving bucket is computed directly from the numeric
   order key (``floor((id - min) * n / span)`` after a min/max scan
   aggregate — no shuffle, no sampling pass),
2. per-bucket token totals aggregate straight off the scan (map-side
   combined — only ``n`` partial rows ever move); their prefix sums
   become broadcast base offsets,
3. bucket-local cumulative sums via ``Window.partitionBy(bucket)`` —
   the hash exchange Catalyst inserts here is the single full shuffle,
   and it carries only ``(id, n_tokens, bucket)``,
4. global offset = bucket base + local cumsum (a map-side add).

``repartitionByRange`` + ``spark_partition_id()`` (the
``paginate_ranged`` pattern) would be two full shuffles: Catalyst cannot
prove the range layout satisfies the window's hash-clustering
requirement and re-shuffles.  Deriving the bucket as a column expression
makes the clustering provable.  Everything stays JVM-side and all
arithmetic is exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastdb_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Placement ledger for concat-and-chunk packing at ``seq_len`` tokens,
    concatenating in ascending ``id_col`` order (must be numeric non-null
    — doc ids are).

    ``token_col`` supplies precomputed token counts; otherwise tokens are
    counted from ``text_col`` (single-space split, matching the corpus
    tokenizer).  Zero-token documents get ``n_seqs_spanned = 0`` at the
    position where they fall.

    Bucket sizing assumes *roughly uniform* id density over [min, max]:
    skewed or sparse id spaces (e.g. xxhash64 ids clustered in one band)
    skew bucket sizes — correctness is unaffected (offsets stay exact for
    any monotone bucket mapping), only shuffle balance degrades.  The
    subtraction runs in decimal(38,0), so full-range signed 64-bit ids
    (span up to 2^64 — e.g. ids minted by ``xxhash64``) cannot wrap.
    """
    if token_col is None:
        base = df.select(
            F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
        )
    else:
        base = df.select(F.col(id_col), F.col(token_col).alias("n_tokens"))

    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism * 4
    lo, hi = base.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return base.select(
            F.col(id_col),
            F.col("n_tokens"),
            F.lit(None).cast("long").alias("seq_id"),
            F.lit(None).cast("long").alias("seq_offset"),
            F.lit(None).cast("long").alias("n_seqs_spanned"),
        ).limit(0)
    span = int(hi) - int(lo) + 1  # exact Python int — never wraps
    n = max(1, min(n, span))
    # order-preserving bucket straight from the key: provably clusters the
    # window below, so Catalyst inserts exactly one exchange.  The
    # subtraction is done in decimal(38,0): with ids spanning more than
    # 2^63 (full-range xxhash64 doc ids) an int64 subtraction would
    # silently wrap under non-ANSI Spark and break the bucket
    # monotonicity the broadcast prefix-sum bases rely on.  The decimal
    # difference is exact; the subsequent double scale by n/span is a
    # monotone map, and the clamp guards the one rounding edge at the
    # top of the range.
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n - 1),
            F.floor(
                (
                    F.col(id_col).cast("decimal(38,0)")
                    - F.lit(int(lo)).cast("decimal(38,0)")
                ).cast("double")
                * float(n)
                / float(span)
            ).cast("int"),
        ),
    )
    bb = base.withColumn("_b", bucket)

    # per-bucket totals off the raw scan: map-side combined, n rows move
    totals = {
        r["_b"]: r["tok"]
        for r in bb.groupBy("_b").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        bases[b] = acc
        acc += totals[b] or 0

    base_map = F.create_map(
        *[F.lit(v) for b in sorted(bases) for v in (b, bases[b])]
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = base_map[F.col("_b")] + F.sum("n_tokens").over(w) - F.col("n_tokens")
    # integer-exact until total tokens ~2^53 (double division both engines;
    # quotients stay exactly representable far past any real corpus)
    L = F.lit(seq_len)
    return bb.select(
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


def pack_manifest(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """The per-sequence composition a training loader consumes: one row
    per (sequence, document-slice) —

        (seq_id, id, doc_offset, seq_offset, length)

    meaning "tokens [doc_offset, doc_offset+length) of document ``id``
    occupy positions [seq_offset, seq_offset+length) of sequence
    ``seq_id``".  Derived from the :func:`pack_sequences` ledger by
    exploding each document over the sequences it spans — pure integer
    column expressions, no extra shuffle beyond the ledger's single one
    (the explode and slice arithmetic run in the ledger's output stage).

    Every sequence's slices tile it exactly: lengths per seq_id sum to
    ``seq_len`` (the final sequence may be shorter).
    """
    ledger = pack_sequences(
        df, seq_len, id_col=id_col, text_col=text_col,
        token_col=token_col, num_ranges=num_ranges,
    )
    L = F.lit(seq_len)
    start = F.col("seq_id") * L + F.col("seq_offset")
    exploded = ledger.filter(F.col("n_tokens") > 0).select(
        F.col(id_col),
        F.col("n_tokens"),
        start.alias("_start"),
        F.explode(
            F.sequence(F.col("seq_id"), F.col("seq_id") + F.col("n_seqs_spanned") - 1)
        ).alias("seq_id"),
    )
    s_lo = F.col("seq_id") * L
    s_hi = s_lo + L
    tok_lo = F.greatest(F.col("_start"), s_lo)
    tok_hi = F.least(F.col("_start") + F.col("n_tokens"), s_hi)
    return exploded.select(
        "seq_id",
        id_col,
        (tok_lo - F.col("_start")).alias("doc_offset"),
        (tok_lo - s_lo).alias("seq_offset"),
        (tok_hi - tok_lo).alias("length"),
    )


def materialize_packed(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_ranges: int | None = None,
) -> DataFrame:
    """The actual training artifact: one row per packed sequence —
    ``(seq_id, n_tokens, text)`` where ``text`` is the sequence's tokens
    space-joined in placement order (every sequence exactly ``seq_len``
    tokens except a shorter final one).

    Built from the :func:`pack_manifest` slices: join each slice to its
    document's token array (shuffle keyed on the near-unique doc id),
    ``slice`` out the covered tokens, and assemble per sequence with a
    sorted-struct ``collect_list`` + ``flatten`` (state per group is one
    sequence = ``seq_len`` tokens, never a document set).  Tokens use the
    same unfiltered single-space split as the ledger's ``token_count``,
    so slice offsets align exactly."""
    from fastdb_spark.functions.text import tokens

    man = pack_manifest(
        df, seq_len, id_col=id_col, text_col=text_col, num_ranges=num_ranges
    )
    toks_df = df.select(F.col(id_col), tokens(F.col(text_col)).alias("l"))
    joined = man.join(toks_df, on=id_col)
    part = F.slice(F.col("l"), F.col("doc_offset") + 1, F.col("length"))
    seqs = joined.groupBy("seq_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("seq_offset").alias("o"), part.alias("p"))
            )
        ).alias("parts")
    )
    toks_col = F.flatten(F.transform(F.col("parts"), lambda s: s["p"]))
    return seqs.select(
        "seq_id",
        F.size(toks_col).cast("long").alias("n_tokens"),
        F.array_join(toks_col, " ").alias("text"),
    )


def materialize_packed_oracle_sql(
    seq_len: int, order_col: str = "doc_id"
) -> str:
    """duckdb twin of :func:`materialize_packed` (manifest subquery →
    ordered list aggregate → flatten → join)."""
    man = pack_manifest_oracle_sql(seq_len, order_col)
    return f"""
        WITH man AS ({man}),
        toks AS (
          SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        SELECT m.seq_id,
               CAST(len(flatten(list(
                   l[m.doc_offset + 1 : m.doc_offset + m.length]
                   ORDER BY m.seq_offset))) AS BIGINT) AS n_tokens,
               array_to_string(flatten(list(
                   l[m.doc_offset + 1 : m.doc_offset + m.length]
                   ORDER BY m.seq_offset)), ' ') AS text
        FROM man m JOIN toks USING (doc_id)
        GROUP BY m.seq_id
    """


def pack_manifest_oracle_sql(seq_len: int, order_col: str = "doc_id") -> str:
    """duckdb twin of :func:`pack_manifest` (generate_series explode over
    the cumsum ledger; identical integer slice arithmetic)."""
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
          FROM t WHERE n_tokens > 0),
        e AS (
          SELECT doc_id, n_tokens, start,
                 unnest(generate_series(
                     CAST(FLOOR(start / {seq_len}) AS BIGINT),
                     CAST(FLOOR((start + n_tokens - 1) / {seq_len}) AS BIGINT)))
                   AS seq_id
          FROM c)
        -- start is a window SUM = HUGEINT in duckdb; cast every derived
        -- column back to BIGINT or pandas widens them to float
        SELECT seq_id, doc_id,
               CAST(greatest(start, seq_id * {seq_len}) - start AS BIGINT)
                 AS doc_offset,
               CAST(greatest(start, seq_id * {seq_len}) - seq_id * {seq_len}
                 AS BIGINT) AS seq_offset,
               CAST(least(start + n_tokens, (seq_id + 1) * {seq_len})
                 - greatest(start, seq_id * {seq_len}) AS BIGINT) AS length
        FROM e
    """


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
