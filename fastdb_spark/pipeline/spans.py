"""Exact duplicate-SPAN detection — the token-level complement to
document-level dedup (the "Deduplicating Training Data Makes Language
Models Better" observation, public literature: long verbatim spans
repeat ACROSS otherwise-distinct documents — boilerplate, licenses,
templates — and document-level near-dup never sees them).

Shape: every document emits one fingerprint per n-token window (md5 over
the joined window — pure column expressions: ``transform`` over a
position sequence + ``slice`` + ``concat_ws``, no window function, no
Python), and one hash aggregate groups windows by fingerprint.  At
100 TB the explode produces ~one row per corpus token — the same cost
class as the BM25/token-stats passes — and the aggregate's key is a
uniform hash (skew-free map-side combine).  md5 (not xxhash64) so the
duckdb oracle reproduces fingerprints bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_grams(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram) — md5 fingerprint of each n-token window."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    la = df.select(F.col(id_col), toks.alias("l"))
    sz = F.size("l")
    idx = F.when(sz >= n, F.sequence(F.lit(1), sz - n + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return la.select(
        F.col(id_col), F.col("l"), F.explode(idx).alias("pos")
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.md5(F.concat_ws(" ", F.slice(F.col("l"), F.col("pos"), n))).alias(
            "gram"
        ),
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Spans of ``n`` tokens appearing verbatim in at least ``min_docs``
    DISTINCT documents: ``(gram, n_docs, doc_ids)`` with ``doc_ids`` a
    comma-joined sorted id list (string, so the cross-engine value hash
    is byte-stable)."""
    grams = _window_grams(docs, n, id_col, text_col)
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.array_join(
                F.array_sort(F.collect_set(F.col(id_col))), ","
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def flag_span_duplicates(
    docs: DataFrame,
    n: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document span-duplication signal: how many of the document's
    n-token windows also occur in other documents — ``(id, n_windows,
    n_dup_windows, dup_frac_ppm)``.  The curation pipeline thresholds on
    ``dup_frac_ppm`` exactly like the Gopher repetition signals.  Two
    aggregates + one join keyed on the gram hash; integral ppm keeps the
    output hash-exact."""
    grams = _window_grams(docs, n, id_col, text_col)
    shared = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(shared, on="gram", how="left_semi")
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    dup_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    out = per_doc.join(dup_doc, on=id_col, how="left").select(
        F.col(id_col),
        F.col("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
    )
    return out.withColumn(
        "dup_frac_ppm",
        F.floor(
            F.col("n_dup_windows") * F.lit(1_000_000.0) / F.col("n_windows")
        ).cast("long"),
    )


def duplicate_spans_oracle_sql(
    n: int = 16, min_docs: int = 2, table: str = "documents"
) -> str:
    """duckdb twin of :func:`duplicate_spans`; ``table`` may be a table
    name or a parenthesized subquery (aliased below)."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS l
          FROM {table} AS corpus_src),
        grams AS (
          SELECT doc_id,
                 md5(array_to_string(l[g.i : g.i + {n} - 1], ' ')) AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(l) - {n} + 1))
                        AS i) g
          WHERE len(l) >= {n})
        SELECT gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               array_to_string(list_sort(list(DISTINCT doc_id)), ',')
                 AS doc_ids
        FROM grams GROUP BY gram
        HAVING count(DISTINCT doc_id) >= {min_docs}
    """


def dedup_doc_blocks(
    docs: DataFrame,
    n: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """REMOVE intra-document repetition: cut the document into aligned
    ``n``-token blocks, keep the FIRST occurrence of each distinct block,
    and reassemble the text in order — the transformation counterpart to
    :func:`duplicate_spans` (which only flags).  Catches the "same
    paragraph pasted k times" pathology that document-level dedup cannot
    see and window-level flagging only reports.

    Block-aligned (not sliding) by design: removal is well-defined, the
    result is deterministic, and the cost is ONE row per block (~1/n of
    the token stream), not one per token.  Returns
    ``(id_col, clean_text, n_blocks, n_kept)``.

    Shape: block texts come from ``transform(sequence) + slice`` (pure
    column expressions in the scan stage), one hash aggregate picks the
    first occurrence per (doc, block_text), one more reassembles in
    block order.  Exact duckdb twin below (same 1-based inclusive list
    slicing in both engines).
    """
    if n <= 0:
        raise ValueError(f"block size n must be positive (got {n})")
    toks = F.split(F.col(text_col), " ")
    nblk = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    blocks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * n + 1, n)
                ),
            )
        ).alias("block", "block_text"),
        nblk.alias("n_blocks"),
    )
    first = blocks.groupBy(id_col, "n_blocks", "block_text").agg(
        F.min("block").alias("block")
    )
    return first.groupBy(id_col, "n_blocks").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("block"), F.col("block_text")))
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    ).select(id_col, "clean_text", F.col("n_blocks").cast("long").alias("n_blocks"), "n_kept")


def dedup_doc_blocks_oracle_sql(
    n: int = 16,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """duckdb twin of :func:`dedup_doc_blocks` — identical block slicing
    (1-based inclusive), first-occurrence keep, in-order reassembly."""
    return f"""
        WITH base AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS toks
          FROM {table}),
        blocks AS (
          SELECT {id_col}, i.i AS block,
                 CAST(ceil(len(toks) / {float(n)!r}) AS BIGINT) AS n_blocks,
                 array_to_string(toks[i.i*{n}+1 : (i.i+1)*{n}], ' ')
                   AS block_text
          FROM base,
               LATERAL (SELECT unnest(range(0,
                   CAST(ceil(len(toks) / {float(n)!r}) AS BIGINT))) AS i) i),
        first AS (
          SELECT {id_col}, n_blocks, block_text, min(block) AS block
          FROM blocks GROUP BY {id_col}, n_blocks, block_text)
        SELECT {id_col},
               string_agg(block_text, ' ' ORDER BY block) AS clean_text,
               n_blocks,
               count(*) AS n_kept
        FROM first
        GROUP BY {id_col}, n_blocks
    """


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token chunks with optional overlap
    — the context-window / RAG-index preparation step.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; a document shorter than ``size`` yields
    one chunk.  Pure scan-stage expressions (``sequence`` + ``slice`` +
    ``posexplode``), no shuffle at all; output order is (doc, chunk).
    Returns ``(id_col, chunk, chunk_text, n_tokens)``.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size (got {overlap}, {size})")
    stride = size - overlap
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n_tok - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    chunks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(toks, i * stride + 1, size),
            )
        ).alias("chunk", "_ctoks"),
    )
    return chunks.select(
        id_col,
        "chunk",
        F.array_join("_ctoks", " ").alias("chunk_text"),
        F.size("_ctoks").cast("long").alias("n_tokens"),
    )


def chunk_documents_oracle_sql(
    size: int = 128,
    overlap: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """duckdb twin of :func:`chunk_documents` — same stride arithmetic,
    same 1-based inclusive slicing."""
    stride = size - overlap
    return f"""
        WITH base AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS toks
          FROM {table}),
        nc AS (
          SELECT {id_col}, toks,
                 greatest(1, CAST(ceil((len(toks) - {overlap})
                                       / {float(stride)!r}) AS BIGINT))
                   AS n_chunks
          FROM base)
        SELECT {id_col}, CAST(i.i AS INTEGER) AS chunk,
               array_to_string(toks[i.i*{stride}+1 : i.i*{stride}+{size}], ' ')
                 AS chunk_text,
               CAST(len(toks[i.i*{stride}+1 : i.i*{stride}+{size}]) AS BIGINT)
                 AS n_tokens
        FROM nc, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) i
    """


def remove_boilerplate_blocks(
    docs: DataFrame,
    n: int = 16,
    max_docs: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4-style repeated-line cut,
    block-aligned): any ``n``-token block whose text occurs in MORE than
    ``max_docs`` distinct documents is removed from EVERY document; the
    remaining blocks reassemble in order.  Documents that lose all their
    blocks drop out of the result (both engines agree on that edge).

    Shape: one block explode (1/n of the token stream), one hash
    aggregate for the per-block distinct-doc count, the common-block set
    broadcast back as an anti-join, one reassembly aggregate.  Returns
    ``(id_col, clean_text, n_blocks, n_kept)``.
    """
    if n <= 0:
        raise ValueError(f"block size n must be positive (got {n})")
    if max_docs < 1:
        raise ValueError(
            f"max_docs must be >= 1 (got {max_docs}) — 0 would remove "
            "every block"
        )
    toks = F.split(F.col(text_col), " ")
    nblk = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    blocks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * n + 1, n)),
            )
        ).alias("block", "block_text"),
        nblk.alias("n_blocks"),
    )
    common = (
        blocks.groupBy("block_text")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > max_docs)
        .select("block_text")
    )
    kept = blocks.join(F.broadcast(common), on="block_text", how="left_anti")
    return kept.groupBy(id_col, "n_blocks").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("block"), F.col("block_text")))
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    ).select(
        id_col,
        "clean_text",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        "n_kept",
    )


def remove_boilerplate_oracle_sql(
    n: int = 16,
    max_docs: int = 1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """duckdb twin of :func:`remove_boilerplate_blocks`."""
    return f"""
        WITH base AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS toks
          FROM {table}),
        blocks AS (
          SELECT {id_col}, i.i AS block,
                 CAST(ceil(len(toks) / {float(n)!r}) AS BIGINT) AS n_blocks,
                 array_to_string(toks[i.i*{n}+1 : (i.i+1)*{n}], ' ')
                   AS block_text
          FROM base,
               LATERAL (SELECT unnest(range(0,
                   CAST(ceil(len(toks) / {float(n)!r}) AS BIGINT))) AS i) i),
        common AS (
          SELECT block_text FROM blocks
          GROUP BY block_text HAVING count(DISTINCT {id_col}) > {max_docs})
        SELECT {id_col},
               string_agg(block_text, ' ' ORDER BY block) AS clean_text,
               n_blocks,
               count(*) AS n_kept
        FROM blocks b
        WHERE NOT EXISTS (SELECT 1 FROM common c
                          WHERE c.block_text = b.block_text)
        GROUP BY {id_col}, n_blocks
    """
