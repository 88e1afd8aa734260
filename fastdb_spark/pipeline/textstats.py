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
