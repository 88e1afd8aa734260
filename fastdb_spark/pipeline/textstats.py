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


def corpus_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """ONE summary row for the corpus — the "dataset card" numbers a
    data release reports: sizes, language spread, duplication rate,
    quality distribution.

    Columns: ``n_docs, n_tokens, n_chars, n_strata, top_stratum,
    exact_dup_ppm`` (docs whose normalized text repeats, parts-per-
    million), ``mean_quality_q`` (corpus mean quality, floor-quantized
    1e6).  Everything is ONE pass + two tiny aggregates (fingerprint
    groups and stratum counts are intermediate aggregates of the same
    scan); all outputs integers/strings so the duckdb twin matches
    bit-for-bit.  Top stratum ties break to the lexicographically
    smallest name (deterministic).
    """
    from fastdb_spark.functions.text import doc_fingerprint, quality_score, token_count

    base = docs.select(
        F.col(id_col),
        F.col(stratum_col).alias("_stratum"),
        token_count(F.col(text_col)).alias("_ntok"),
        F.length(F.col(text_col)).alias("_nchr"),
        quality_score(F.col(text_col)).alias("_q"),
        doc_fingerprint(F.col(text_col)).alias("_fp"),
    )
    from fastdb_spark.cachereg import stage

    base = stage(base)
    overall = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.sum("_nchr").cast("long").alias("n_chars"),
        F.floor(
            F.sum(F.floor(F.col("_q") * F.lit(1000000.0)))
            / F.count(F.lit(1))
        ).cast("long").alias("mean_quality_q"),
    )
    dup = (
        base.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") - 1).cast("long").alias("_ndup"),
            F.sum("c").cast("long").alias("_nall"),
        )
    )
    strata = (
        base.groupBy("_stratum")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_strata"),
            F.min_by(
                "_stratum",
                F.struct(F.negative(F.col("c")), F.col("_stratum")),
            ).alias("top_stratum"),
        )
    )
    return (
        overall.crossJoin(dup)
        .crossJoin(strata)
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_strata",
            "top_stratum",
            F.floor(F.col("_ndup") * F.lit(1000000.0) / F.col("_nall"))
            .cast("long")
            .alias("exact_dup_ppm"),
            "mean_quality_q",
        )
    )


def corpus_card_oracle_sql(stratum_col: str = "lang") -> str:
    """duckdb twin of :func:`corpus_card` — same quantizations, same
    tie-breaks."""
    from fastdb_spark.pipeline.oracles import doc_stats_sql  # noqa: F401

    toks = "string_split(text, ' ')"
    mtl = (
        f"list_sum(list_transform({toks}, w -> length(w)))"
        f" / greatest(len({toks}), 1)"
    )
    punct = (
        "length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))"
        " / greatest(length(text), 1)"
    )
    ntok = "len(string_split(text, ' '))"
    quality = f"""round((
        (CASE WHEN {ntok} >= 10 AND {ntok} <= 1000 THEN 1.0 ELSE 0.5 END)
        + (CASE WHEN {mtl} >= 3.0 AND {mtl} <= 10.0 THEN 1.0 ELSE 0.5 END)
        + (1.0 - least({punct} * 5.0, 1.0))
      ) / 3.0, 6)"""
    return f"""
        WITH base AS (
          SELECT {stratum_col} AS _stratum,
                 CAST({ntok} AS BIGINT) AS _ntok,
                 length(text) AS _nchr,
                 {quality} AS _q,
                 md5(regexp_replace(trim(text), ' +', ' ', 'g')) AS _fp
          FROM documents),
        overall AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(_ntok) AS BIGINT) AS n_tokens,
                 CAST(sum(_nchr) AS BIGINT) AS n_chars,
                 CAST(floor(sum(floor(_q * 1000000.0)) / count(*)) AS BIGINT)
                   AS mean_quality_q
          FROM base),
        dup AS (
          SELECT CAST(sum(c - 1) AS BIGINT) AS _ndup,
                 CAST(sum(c) AS BIGINT) AS _nall
          FROM (SELECT count(*) AS c FROM base GROUP BY _fp)),
        strata AS (
          SELECT CAST(count(*) AS BIGINT) AS n_strata,
                 (SELECT _stratum
                  FROM (SELECT _stratum, count(*) AS c FROM base
                        GROUP BY _stratum)
                  ORDER BY c DESC, _stratum LIMIT 1) AS top_stratum
          FROM (SELECT count(*) AS c2 FROM base GROUP BY _stratum))
        SELECT n_docs, n_tokens, n_chars, n_strata, top_stratum,
               CAST(floor(_ndup * 1000000.0 / _nall) AS BIGINT)
                 AS exact_dup_ppm,
               mean_quality_q
        FROM overall, dup, strata
    """
