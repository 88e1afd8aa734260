"""Per-document text statistics: token counts, quality, language ID,
fingerprints — one projection pass, no shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_count,
)


def doc_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        regex_token_count(t).alias("n_bpe_tokens"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t, "en"), 6).alias("stopword_ratio_en"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )


def _ngrams(toks, n: int):
    """1-indexed word n-grams as space-joined strings; empty array when
    the document is shorter than n (sequence() would count DOWN for a
    negative span — guard it)."""
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 quality heuristics): the fraction of
    the document covered by its most frequent word / bigram, and the
    fraction of trigram occurrences that are repeats.  High values mark
    boilerplate and degenerate generations — standard pre-training
    filters.

    Fractions are emitted as integral parts-per-million (floor(1e6*a/b)
    on exact integer counts) so the values are bit-identical across
    engines — round() on a double ratio is a half-boundary trap.

    Shape: one explode per n (the n-gram rows), then two hash
    aggregations keyed by (doc, n[, gram]) — all map-side combinable,
    keys are near-unique so skew-free.  At 100 TB this is the same cost
    class as the minhash shingle pass.
    """
    toks = F.split(F.col(text_col), " ")
    parts = [
        df.select(
            F.col(id_col),
            F.lit(n).alias("n"),
            F.explode(_ngrams(toks, n)).alias("gram"),
        )
        for n in (1, 2, 3)
    ]
    grams = parts[0].unionAll(parts[1]).unionAll(parts[2])
    counts = grams.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy(id_col, "n").agg(
        F.max("c").alias("topc"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("nd"),
    )

    def _at(n: int, col: str):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    def _ppm(num, den):
        return F.coalesce(
            F.floor(num * F.lit(1000000.0) / den), F.lit(0)
        ).cast("long")

    return per.groupBy(id_col).agg(
        _at(1, "tot").cast("long").alias("n_tokens"),
        _ppm(_at(1, "topc"), _at(1, "tot")).alias("top_word_ppm"),
        _ppm(_at(2, "topc"), _at(2, "tot")).alias("top_bigram_ppm"),
        _ppm(_at(3, "tot") - _at(3, "nd"), _at(3, "tot")).alias(
            "dup_trigram_ppm"
        ),
    )
