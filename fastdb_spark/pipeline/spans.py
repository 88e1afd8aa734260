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
