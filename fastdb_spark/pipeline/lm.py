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


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair (empty tokens filtered
    BEFORE pairing, so double spaces don't break adjacency) — pure array
    expressions in the scan stage, no window."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    la = df.select(F.col(id_col), toks.alias("l"))
    n = F.size("l")
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        la.select(F.col(id_col), F.col("l"), F.explode(idx).alias("i"))
        .select(
            F.col(id_col),
            F.element_at("l", F.col("i")).alias("w1"),
            F.element_at("l", F.col("i") + 1).alias("w2"),
        )
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram counts ``(w1, w2, cnt)`` — one pair explode + one map-side-
    combined aggregate, shuffle keyed on the bigram (uniform hash,
    skew-free)."""
    return (
        _bigram_pairs(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def doc_perplexity_bigram(
    docs: DataFrame,
    unigram: DataFrame | None = None,
    bigram: DataFrame | None = None,
    alpha: float = 0.5,
    backoff: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram perplexity with STUPID BACKOFF (Brants et al., public
    literature): ``p(w2|w1) = cnt(w1 w2)/cnt(w1)`` when the bigram was
    seen, else ``backoff * p_uni(w2)`` (the add-alpha unigram from
    :func:`doc_perplexity`).  Scores the n−1 transitions of each
    document; documents with fewer than 2 tokens emit no row.

    Join shape: three equi-joins of the pair stream against the LM tables
    (bigram keyed on the pair, unigram on the token) — AQE broadcasts
    them when the vocab is small, shuffle-joins on uniform hash keys
    otherwise; either way no skew and no driver loops.  Same exactness
    treatment as the unigram scorer: ordered fold + quantized mean.
    """
    from fastdb_spark.queries.objstats import ordered_sum

    if unigram is None:
        unigram = train_unigram_lm(docs, id_col, text_col)
    if bigram is None:
        bigram = train_bigram_lm(docs, id_col, text_col)
    total, vocab = unigram.agg(
        F.sum("cnt").cast("long"), F.count(F.lit(1))
    ).first()
    if total is None:
        total, vocab = 0, 0
    denom = float(total) + alpha * (int(vocab) + 1)

    pairs = _bigram_pairs(docs, id_col, text_col)
    u1 = unigram.select(F.col("tok").alias("w1"), F.col("cnt").alias("_c1"))
    u2 = unigram.select(F.col("tok").alias("w2"), F.col("cnt").alias("_c2"))
    bg = bigram.select("w1", "w2", F.col("cnt").alias("_cb"))
    joined = (
        pairs.join(bg, on=["w1", "w2"], how="left")
        .join(u1, on="w1", how="left")
        .join(u2, on="w2", how="left")
    )
    logp = F.when(
        F.col("_cb").isNotNull(),
        F.log(F.col("_cb").cast("double") / F.col("_c1").cast("double")),
    ).otherwise(
        F.log(
            F.lit(backoff)
            * (
                (F.coalesce(F.col("_c2").cast("double"), F.lit(0.0)) + F.lit(alpha))
                / F.lit(denom)
            )
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        ordered_sum(logp).alias("_s"),
    )
    mean = F.col("_s") / F.col("n_bigrams")
    return per_doc.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.floor(mean * F.lit(10000.0)).cast("long").alias("mean_logp_q"),
        F.round(F.exp(-mean), 4).alias("ppl"),
    )


def bigram_perplexity_oracle_sql(
    alpha: float = 0.5, backoff: float = 0.4
) -> str:
    """duckdb twin of :func:`doc_perplexity_bigram` over ``documents``."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS l
          FROM documents),
        pairs AS (
          SELECT doc_id, l[g.i] AS w1, l[g.i + 1] AS w2
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
          WHERE len(l) >= 2),
        uni AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(l) AS tok FROM toks) GROUP BY tok),
        bg AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
          FROM pairs GROUP BY w1, w2),
        meta AS (
          SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                 CAST(count(*) AS BIGINT) AS vocab
          FROM uni),
        scored AS (
          SELECT p.doc_id,
                 CASE WHEN b.cnt IS NOT NULL
                      THEN ln(CAST(b.cnt AS DOUBLE) / CAST(u1.cnt AS DOUBLE))
                      ELSE ln({backoff!r} * ((COALESCE(u2.cnt, 0) + {alpha!r})
                               / (m.total + {alpha!r} * (m.vocab + 1)))) END
                   AS logp
          FROM pairs p
          LEFT JOIN bg b ON b.w1 = p.w1 AND b.w2 = p.w2
          LEFT JOIN uni u1 ON u1.tok = p.w1
          LEFT JOIN uni u2 ON u2.tok = p.w2
          CROSS JOIN meta m),
        per AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_bigrams,
                 list_reduce(list_prepend(0.0, list_sort(list(logp))),
                             (a, b) -> a + b) AS s
          FROM scored GROUP BY doc_id)
        SELECT doc_id, n_bigrams,
               CAST(FLOOR(s / n_bigrams * 10000.0) AS BIGINT) AS mean_logp_q,
               round(exp(-(s / n_bigrams)), 4) AS ppl
        FROM per
    """


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
