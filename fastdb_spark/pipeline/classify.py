"""Model-based quality filtering — the classifier stage of a production
curation pipeline (public practice: GPT-3/CCNet-style pipelines train a
lightweight classifier on "known-good vs known-bad" text and keep
documents the model scores as good, complementing the pure-heuristic
cuts in ``pipeline.textstats``).

Spark-first shape:

- features are the engine's existing per-document signals (token/char
  stats, punctuation and stopword ratios, heuristic quality, unigram
  perplexity) — all computed by scan-stage column expressions;
- the model is MLlib ``LogisticRegression`` (one distributed fit at
  train time; scoring is a JVM-side model transform — no Python in the
  hot path);
- labels can be supplied (curated seed sets) or derived as WEAK LABELS
  from the heuristic extremes — the standard bootstrap when no labeled
  data exists: confidently-good and confidently-bad documents train the
  model, and the model generalizes to the ambiguous middle.

Model-based scores are float ML outputs, not SQL-expressible — this
family is pytest-verified (separation on planted corpora), not
oracle-hashed, and is deliberately NOT a gate query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature columns fed to the classifier, all from doc_stats + perplexity
FEATURES = [
    "n_tokens",
    "mean_token_len",
    "punct_ratio",
    "stopword_ratio_en",
    "quality",
    "mean_logp",
]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document feature frame ``(id, *FEATURES)`` — doc_stats columns
    plus the unquantized mean unigram log-prob (dequantized from the
    hash-stable ``mean_logp_q``)."""
    from fastdb_spark.pipeline.lm import doc_perplexity
    from fastdb_spark.pipeline.textstats import doc_stats

    stats = doc_stats(docs, id_col=id_col, text_col=text_col)
    ppl = doc_perplexity(docs, id_col=id_col, text_col=text_col).select(
        id_col, (F.col("mean_logp_q") / 10000.0).alias("mean_logp")
    )
    return stats.join(ppl, on=id_col).select(
        F.col(id_col),
        *[F.col(c).cast("double").alias(c) for c in FEATURES],
    )


def weak_quality_labels(
    features: DataFrame,
    good_quality: float = 0.7,
    bad_quality: float = 0.3,
    max_bad_punct: float = 0.2,
    min_good_stopword: float = 0.05,
    id_col: str = "doc_id",
) -> DataFrame:
    """Bootstrap labels from MULTI-SIGNAL heuristic extremes (a single
    heuristic's middle band is exactly where weak labels go wrong):

    - bad (0.0): heuristic quality at/below ``bad_quality`` OR
      punctuation ratio at/above ``max_bad_punct`` (symbol soup);
    - good (1.0): quality at/above ``good_quality`` AND stopword ratio
      at/above ``min_good_stopword`` (reads like natural language) —
      and not already flagged bad (bad wins, conservatively);
    - everything else is EXCLUDED from training — the ambiguous middle
      is what the trained model is for.
    """
    bad = (F.col("quality") <= bad_quality) | (
        F.col("punct_ratio") >= max_bad_punct
    )
    good = (F.col("quality") >= good_quality) & (
        F.col("stopword_ratio_en") >= min_good_stopword
    )
    return features.select(
        F.col(id_col),
        F.when(bad, F.lit(0.0)).when(good, F.lit(1.0)).alias("label"),
    ).filter(F.col("label").isNotNull())


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the logistic quality model on ``features`` joined to
    ``labels`` (``(id, label in {0,1})``).  Returns the fitted
    PipelineModel (assembler + scaler + LR) — persist with
    ``model.write().save(path)`` for train-once/score-many."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    train = features.join(labels, on=id_col)
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=FEATURES, outputCol="_raw", handleInvalid="keep"
            ),
            StandardScaler(inputCol="_raw", outputCol="_feat"),
            LogisticRegression(
                featuresCol="_feat",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(train)


def score_quality(
    features: DataFrame, model, id_col: str = "doc_id"
) -> DataFrame:
    """(id, p_good) — the model's good-class probability per document;
    JVM-side transform, no Python in the scoring path."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return scored.select(
        F.col(id_col),
        F.round(
            vector_to_array(F.col("probability")).getItem(1), 6
        ).alias("p_good"),
    )


def classifier_filter(
    docs: DataFrame,
    model=None,
    min_p_good: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the classifier scores at least ``min_p_good``.
    With ``model=None`` the weak-label bootstrap trains one on the spot
    (exploration mode; persist a model for production)."""
    feats = quality_features(docs, id_col=id_col, text_col=text_col)
    if model is None:
        model = train_quality_classifier(
            feats, weak_quality_labels(feats, id_col=id_col), id_col=id_col
        )
    keep = score_quality(feats, model, id_col=id_col).filter(
        F.col("p_good") >= min_p_good
    )
    return docs.join(keep.select(id_col), on=id_col)
