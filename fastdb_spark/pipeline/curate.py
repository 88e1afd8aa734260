"""Corpus curation — the composed training-data cleaning pipeline:

    quality gate -> exact dedup (canonical = min id) -> MinHash near-dedup
    (drop the higher id of every candidate pair)
    [-> SemDeDup semantic stage (optional, ``embeddings=``)]

One declarative program; Catalyst pipelines the quality projection into the
scan, and the two dedup stages reuse the shuffle-conscious operators from
``pipeline.dedup``.  The near-dup drop is greedy-by-pair (not transitive
closure) — deterministic, and the standard practice in large-scale
pretraining dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.functions.text import doc_fingerprint, quality_score, token_count
from fastdb_spark.pipeline.dedup import minhash_lsh_pairs


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.5,
    eval_docs: DataFrame | None = None,
    decontam_n: int = 8,
    max_top_word_ppm: int | None = None,
    max_ppl: float | None = None,
    perplexity_lm: DataFrame | None = None,
    max_span_dup_ppm: int | None = None,
    span_n: int = 16,
    quality_model=None,
    min_p_good: float | None = None,
    hash_impl: str = "md5",
    embeddings: DataFrame | None = None,
    semantic_centroids: list[list[float]] | None = None,
    semantic_eps: float = 0.92,
    semantic_keep: str = "farthest",
    vec_col: str = "embedding",
) -> DataFrame:
    """Surviving documents with their quality metrics.

    Optional gates extending the core pipeline:

    - ``eval_docs``: benchmark decontamination first — drop any document
      sharing a distinct word ``decontam_n``-gram with the eval set
      (``pipeline.decontam``; broadcast gram set, one scan pass).
    - ``max_top_word_ppm``: Gopher-style repetition cut — drop documents
      whose most frequent word covers more than this many parts-per-
      million of the text (``pipeline.textstats.repetition_stats``).
    - ``max_ppl``: CCNet-style fluency cut — drop documents whose
      unigram-LM perplexity exceeds the threshold (``pipeline.lm``;
      ``perplexity_lm`` supplies a reference-corpus LM, default is
      self-trained).
    - ``max_span_dup_ppm``: token-level dup cut — drop documents where
      more than this fraction (ppm) of ``span_n``-token windows also
      occur verbatim in other documents (``pipeline.spans``).
    - ``min_p_good``: model-based quality cut — keep only documents the
      classifier (``quality_model``, or a weak-label bootstrap trained
      on the spot) scores at least this good (``pipeline.classify``).
    - ``hash_impl``: ``"md5"`` (oracle-parity default) or ``"fast"``
      (integer MinHash permutations — the production path at scale; see
      ``pipeline.dedup.minhash_lsh_pairs``).
    - ``embeddings``: SemDeDup semantic stage LAST (after the lexical
      stages — semantic near-dups that survive MinHash are exactly what
      it exists to catch): ``(id, vec)`` rows for the corpus, scored by
      :func:`semdedup.semantic_dedup` over ``semantic_centroids`` at
      ``semantic_eps``; non-keepers are dropped.  Documents WITHOUT an
      embedding row pass through unscored (the stage cannot judge
      them) — supply full coverage for a full cut.  Requires
      ``semantic_centroids`` (the caller owns the quantizer, same
      frozen-centroid contract as the semantic index).
    """
    if eval_docs is not None:
        from fastdb_spark.pipeline.decontam import decontaminate

        df = decontaminate(
            df, eval_docs, n=decontam_n, id_col=id_col, text_col=text_col
        )
    if max_top_word_ppm is not None:
        from fastdb_spark.pipeline.textstats import repetition_stats

        rep = repetition_stats(df, id_col=id_col, text_col=text_col)
        noisy = rep.filter(F.col("top_word_ppm") > max_top_word_ppm).select(
            id_col
        )
        df = df.join(F.broadcast(noisy), id_col, "left_anti")
    if max_ppl is not None:
        from fastdb_spark.pipeline.lm import doc_perplexity

        ppl = doc_perplexity(
            df, lm=perplexity_lm, id_col=id_col, text_col=text_col
        )
        bad = ppl.filter(F.col("ppl") > max_ppl).select(id_col)
        df = df.join(F.broadcast(bad), id_col, "left_anti")
    if max_span_dup_ppm is not None:
        from fastdb_spark.pipeline.spans import flag_span_duplicates

        sp = flag_span_duplicates(
            df, n=span_n, id_col=id_col, text_col=text_col
        )
        spanny = sp.filter(F.col("dup_frac_ppm") > max_span_dup_ppm).select(
            id_col
        )
        df = df.join(F.broadcast(spanny), id_col, "left_anti")
    if min_p_good is not None:
        from fastdb_spark.pipeline.classify import classifier_filter

        df = classifier_filter(
            df, model=quality_model, min_p_good=min_p_good,
            id_col=id_col, text_col=text_col,
        )
    t = F.col(text_col)
    stats = df.select(
        F.col(id_col),
        F.col(text_col),
        token_count(t).alias("n_tokens"),
        quality_score(t).alias("quality"),
        doc_fingerprint(t).alias("fingerprint"),
    )
    kept = stats.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )

    canon = kept.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    # stage the exact-dedup survivors: the frame feeds BOTH the minhash
    # candidate generation and the final anti-join — without persistence
    # the quality/fingerprint projection re-executes per branch (the
    # reference stages the same intermediates as temp tables, SURVEY.md Q3).
    # cachereg-tracked: consumer releases after materializing the result
    from fastdb_spark.cachereg import stage

    kept = stage(
        kept.join(canon, on=[id_col, "fingerprint"], how="left_semi"), eager=True
    )

    # exact dedup already ran: byte-identical documents are collapsed, so
    # the duplicate-bomb scenario the LSH bucket cap guards against cannot
    # occur here — skip the cap's count+join (the documented safe case)
    pairs = minhash_lsh_pairs(
        kept, id_col=id_col, text_col=text_col, threshold=jaccard_threshold,
        max_bucket_size=None, hash_impl=hash_impl,
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = kept.join(drops, on=id_col, how="left_anti")
    out = survivors.select(id_col, "n_tokens", "quality", "fingerprint")
    if embeddings is not None:
        if semantic_centroids is None:
            raise ValueError(
                "semantic stage needs semantic_centroids (the caller "
                "owns the frozen quantizer, as with the semantic index)"
            )
        from fastdb_spark.pipeline.semdedup import semantic_dedup

        # score only the lexical survivors' embeddings (left_semi);
        # non-keepers drop via the left_anti below, so docs with no
        # embedding row — hence no report row — pass through unscored
        emb = embeddings.join(
            out.select(id_col), on=id_col, how="left_semi"
        )
        report = semantic_dedup(
            emb, semantic_centroids, id_col=id_col, vec_col=vec_col,
            eps=semantic_eps, keep=semantic_keep,
        )
        sem_drops = report.filter(~F.col("is_keeper")).select(id_col)
        out = out.join(sem_drops, on=id_col, how="left_anti")
    return out
