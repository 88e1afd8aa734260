"""N-gram language-model perplexity scoring — the CCNet/RedPajama-style
quality signal: score every document by how surprising its tokens are
under a language model trained on the corpus (or a reference corpus),
then threshold/bucket on perplexity to keep fluent text and drop
boilerplate, gibberish, and non-language content.

Spark-first shape (100 TB reasoning):

- **train**: one token explode + one map-side-combined count aggregate —
  the only shuffle moves (token, partial-count) pairs, bounded by vocab
  size per partition.
- **score**: the LM is vocab-bounded (a few MB) and BROADCASTS; scoring
  is a map-side join in the corpus scan stage plus one aggregate keyed on
  the near-unique doc id (skew-free).  No driver loops; the only
  driver-side values are the two scalar normalization constants.
- **exactness**: per-doc log-prob totals use the ``ordered_sum``
  canonical fold (sorted left-fold — one addition order every engine
  reproduces) and the emitted mean is quantized (``floor(x * 1e4)``), the
  same cross-engine determinism pattern as BM25 scores and the stream
  means.

Smoothing is add-alpha over a closed vocabulary + one OOV bucket:
``p(tok) = (count(tok) + alpha) / (total + alpha * (vocab + 1))``,
with unseen tokens taking ``count = 0``.  Tokens come from the corpus'
single-space tokenizer (matching ``functions.text.token_count``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def train_unigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram counts ``(tok, cnt)`` — the LM table.  One explode + one
    map-side-combined aggregate; persist/broadcast downstream.  Vocab-
    bounded output regardless of corpus size."""
    return (
        _tokens(docs, id_col, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def doc_perplexity(
    docs: DataFrame,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram perplexity:
    ``(id, n_tokens, mean_logp_q, ppl)`` where ``mean_logp_q =
    floor(mean(ln p) * 1e4)`` (quantized, hash-stable) and ``ppl =
    round(exp(-mean(ln p)), 4)`` — lower perplexity = more corpus-typical
    text.  ``lm`` defaults to a model trained on ``docs`` itself (the
    self-scoring curation setup); pass a reference-corpus LM to score
    against external fluency instead.  Documents with zero tokens emit no
    row (no tokens, no surprise).
    """
    from fastdb_spark.queries.objstats import ordered_sum

    if lm is None:
        lm = train_unigram_lm(docs, id_col, text_col)
    total, vocab = lm.agg(
        F.sum("cnt").cast("long"), F.count(F.lit(1))
    ).first()
    if total is None:
        total, vocab = 0, 0
    denom = float(total) + alpha * (int(vocab) + 1)
    toks = _tokens(docs, id_col, text_col)
    scored = toks.join(F.broadcast(lm), on="tok", how="left")
    logp = F.log(
        (F.coalesce(F.col("cnt").cast("double"), F.lit(0.0)) + F.lit(alpha))
        / F.lit(denom)
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        ordered_sum(logp).alias("_s"),
    )
    mean = F.col("_s") / F.col("n_tokens")
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(mean * F.lit(10000.0)).cast("long").alias("mean_logp_q"),
        F.round(F.exp(-mean), 4).alias("ppl"),
    )


def perplexity_filter(
    docs: DataFrame,
    max_ppl: float,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose perplexity is at most ``max_ppl`` (the CCNet
    head/middle cut).  Returns the original rows joined to the score —
    a left-semi-shaped filter, corpus columns untouched."""
    scores = doc_perplexity(docs, lm, alpha, id_col, text_col)
    keep = scores.filter(F.col("ppl") <= max_ppl).select(id_col, "ppl")
    return docs.join(keep, on=id_col)


def perplexity_oracle_sql(alpha: float = 0.5) -> str:
    """duckdb twin of :func:`doc_perplexity` over the ``documents`` table
    (same tokenizer, same smoothing, same ordered fold + quantization)."""
    return f"""
        WITH tok AS (
          SELECT doc_id, t.tok
          FROM documents,
               LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
          WHERE t.tok <> ''),
        lm AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
        meta AS (
          SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                 CAST(count(*) AS BIGINT) AS vocab
          FROM lm),
        scored AS (
          SELECT t.doc_id,
                 ln((COALESCE(l.cnt, 0) + {alpha!r})
                    / (m.total + {alpha!r} * (m.vocab + 1))) AS logp
          FROM tok t LEFT JOIN lm l USING (tok) CROSS JOIN meta m),
        per AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 list_reduce(list_prepend(0.0, list_sort(list(logp))),
                             (a, b) -> a + b) AS s
          FROM scored GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               CAST(FLOOR(s / n_tokens * 10000.0) AS BIGINT) AS mean_logp_q,
               round(exp(-(s / n_tokens)), 4) AS ppl
        FROM per
    """
