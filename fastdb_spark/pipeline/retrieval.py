"""BM25 ranked retrieval over the document corpus.

Okapi BM25 (Robertson & Zaragoza 2009) with the Lucene idf variant:

    score(d, q) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*dl/avgdl))
    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Shape (the 100 TB design):

- Query terms are filtered *inside the token array* (``F.filter`` before
  ``explode``), so the generate stage emits only matching tokens — for a
  3-term query that is ~3/|vocab| of the corpus token stream, and the
  filter + explode run in the scan stage (no shuffle of non-matching
  text).
- ``df(t)`` is a per-term aggregate over those rows (|q| rows total) and
  ``(N, avgdl)`` is a 1-row corpus aggregate — both broadcast back, so
  the only real shuffle is the (doc, term) tf aggregation, keyed by
  near-unique pairs (skew-free, map-side combinable).
- Final top-k is ``orderBy(...).limit(k)`` = TakeOrderedAndProject: no
  global sort materializes.

Everything is built-in Column expressions — no Python in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query, BM25-scored.

    Returns ``(id_col, n_terms, score_q)`` where ``score_q`` is the score
    quantized to ``floor(score * 1e4)`` (coarse enough that a last-ulp
    ``ln`` difference between engines cannot flip it) and ``n_terms`` is
    how many distinct query terms the document contains.  Ties broken by
    ascending ``id_col``.
    """
    toks = F.split(F.col(text_col), " ")
    is_q = lambda t: reduce(  # noqa: E731 — tiny predicate combinator
        lambda a, c: a | c, [t == F.lit(w) for w in query_terms]
    )
    base = documents.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.filter(toks, is_q).alias("qtoks"),
    )
    # corpus stats: one row, broadcast into every score row
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("qtoks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    # ordered double fold: one canonical addition order both engines
    # reproduce bit-for-bit (see objstats.ordered_sum)
    from fastdb_spark.queries.objstats import ordered_sum

    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        ordered_sum(F.col("contrib")).alias("score"),
    )
    return (
        per_doc.select(
            id_col,
            "n_terms",
            F.floor(F.col("score") * F.lit(10000.0)).cast("long").alias("score_q"),
        )
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_topk_many(
    documents: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` per query for a BATCH of bag-of-words queries in ONE
    corpus pass — the retrieval shape a data pipeline actually runs
    (mining contrastive pairs, labeling a whole query log).

    The union of all query terms is filtered in-array before explode (one
    scan regardless of batch size); tf and df aggregate once and are
    shared across queries; a broadcast (term -> query) map fans each tf
    row out to only the queries containing that term; per-query ranking
    is a rank window partitioned by query id (state per group is k rows —
    same idiom as ``ann.cosine_topk_many``).

    Returns ``(query_id, id_col, n_terms, score_q)``.
    """
    from pyspark.sql import Window

    all_terms = sorted({t for ts in queries.values() for t in ts})
    toks = F.split(F.col(text_col), " ")
    if len(all_terms) <= 32:
        # small union: OR-chain inside the token array, explode only hits
        is_q = lambda t: reduce(  # noqa: E731
            lambda a, c: a | c, [t == F.lit(w) for w in all_terms]
        )
        base = documents.select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.filter(toks, is_q).alias("qtoks"),
        )
        term_rows = base.select(id_col, "dl", F.explode("qtoks").alias("term"))
    else:
        # large union: an O(|terms|) comparison per token loses to a
        # broadcast-hash semi on the exploded stream — one generate pass,
        # the join filters in the same stage
        base = documents.select(F.col(id_col), F.size(toks).alias("dl"))
        from fastdb_spark.localrel import tiny_local_df

        # Arrow local relation (r12): the pickled form ran a Python-RDD
        # job per broadcast build of the vocab table
        vocab = tiny_local_df(
            documents.sparkSession,
            [(t,) for t in all_terms],
            "term string",
        )
        term_rows = documents.select(
            F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
        ).join(F.broadcast(vocab), "term")
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = term_rows.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from fastdb_spark.localrel import tiny_local_df

    term_query = tiny_local_df(
        documents.sparkSession,
        [(t, qid) for qid, ts in sorted(queries.items()) for t in ts],
        "term string, query_id string",
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(term_query), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    from fastdb_spark.queries.objstats import ordered_sum

    per = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        ordered_sum(F.col("contrib")).alias("score"),
    )
    per = per.select(
        "query_id",
        id_col,
        "n_terms",
        F.floor(F.col("score") * F.lit(10000.0)).cast("long").alias("score_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col(id_col)
    )
    return (
        per.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def bm25_oracle_sql(
    query_terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """duckdb twin of ``bm25_topk`` — same Lucene-idf formula, same
    floor-quantization, same tie-break."""
    terms = ", ".join(f"'{w}'" for w in query_terms)
    return f"""
        WITH base AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl,
                 list_filter(string_split(text, ' '),
                             t -> t IN ({terms})) AS qtoks
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        tf AS (SELECT doc_id, dl, unnest(qtoks) AS term FROM base),
        tfc AS (SELECT doc_id, dl, term, count(*) AS tf
                FROM tf GROUP BY doc_id, dl, term),
        dft AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        scored AS (
          SELECT tfc.doc_id,
                 ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tfc.tf * {k1 + 1.0})
                 / (tfc.tf + {k1} * ({1.0 - b} + {b} * tfc.dl / s.avgdl))
                   AS contrib
          FROM tfc JOIN dft USING (term) CROSS JOIN stats s)
        SELECT doc_id,
               count(*) AS n_terms,
               CAST(FLOOR(list_reduce(list_prepend(0.0::DOUBLE,
                    list_sort(list(contrib))), (a, x) -> a + x)
                    * 10000.0) AS BIGINT) AS score_q
        FROM scored
        GROUP BY doc_id
        ORDER BY score_q DESC, doc_id
        LIMIT {k}
    """


def tfidf_topk(
    documents: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    stage_tf: bool = True,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (the scikit-learn convention: ``idf = ln((N+1)/(df+1)) + 1``).

    The keyword-extraction / doc-representation primitive of a corpus
    pipeline: per-doc top terms feed topic labelling, near-dup triage
    and quality review.  Returns ``(id_col, term, tf, score_q, rk)``.

    Shape: ONE (doc, term) tf aggregate over the exploded token stream
    (map-side combinable, near-unique keys), a per-term df aggregate of
    the much smaller tf frame, df broadcast back, and a per-doc window
    for the top-k cut.  Scores are floor-quantized (1e4) so a last-ulp
    ``ln`` difference between engines cannot flip a rank; ties break on
    ascending term — fully deterministic, exact duckdb twin below.

    ``stage_tf`` persists the (doc, term, tf) frame (cachereg-tracked,
    released by the consumer) so the df aggregate reads it instead of
    re-tokenizing the corpus — at 100 TB the tf frame is the expensive
    pass and must not run twice.
    """
    from pyspark.sql import Window

    from fastdb_spark import cachereg

    tf = (
        documents.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if stage_tf:
        tf = cachereg.stage(tf)
    n_docs = documents.select(
        F.count(F.lit(1)).alias("n_docs")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score_q",
            F.floor(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
                * F.lit(10000.0)
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_q").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "score_q", "rk")
    )


def tfidf_oracle_sql(k: int = 5) -> str:
    """duckdb twin of :func:`tfidf_topk` — same smoothing, same
    quantization, same (score desc, term) tie-break."""
    return f"""
        WITH tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)
          WHERE term <> ''
          GROUP BY doc_id, term),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf,
                 CAST(FLOOR(tf.tf
                      * (ln((nd.n_docs + 1.0) / (dft.df + 1.0)) + 1.0)
                      * 10000.0) AS BIGINT) AS score_q
          FROM tf JOIN dft USING (term) CROSS JOIN nd),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                         ORDER BY score_q DESC, term) AS INTEGER) AS rk
          FROM scored)
        SELECT doc_id, term, tf, score_q, rk
        FROM ranked WHERE rk <= {k}
    """


def expansion_terms_rm(
    documents: DataFrame,
    query_terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback expansion terms (relevance-model /
    RM1 estimate with uniform document weights — Lavrenko & Croft
    2001; the Rocchio-family technique every production retrieval
    stack runs as "query expansion").

    Stage 1 retrieves the BM25 top-``fb_docs`` pool for the original
    query; stage 2 scores every non-query term t in the pool by
    ``sum_d tf(t, d) / |d|`` (the uniform-weight relevance-model
    estimate — how much of the pool's token mass is t) and keeps the
    top ``fb_terms``.

    Scale shape: stage 1 is one corpus scan (``bm25_topk``); stage 2
    re-reads ONLY the pool documents (broadcast-semi on fb_docs ids)
    and aggregates a pool-bounded term frame, so its cost is
    O(fb_docs · doc_len) regardless of corpus size.  Determinism: the
    per-term contributions sum via ``ordered_sum`` (canonical
    ascending-order fold), weights quantize to ``floor(w * 1e6)``, and
    ties break on ascending term — bit-reproducible cross-engine, so
    the operator carries an exact duckdb twin
    (:func:`expansion_oracle_sql`).

    Returns ``(term, weight_q)``, the expansion terms best-first."""
    from fastdb_spark.queries.objstats import ordered_sum

    pool = bm25_topk(
        documents, query_terms, k=fb_docs, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    ).select(id_col)
    toks = F.split(F.col(text_col), " ")
    pool_toks = (
        documents.join(F.broadcast(pool), on=id_col)
        .select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .filter(F.col("term") != "")
        .filter(~F.col("term").isin(query_terms))
    )
    # per (doc, term): tf/dl, then the canonical-order fold across docs
    per_doc = pool_toks.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    weighted = per_doc.select(
        "term", (F.col("tf") / F.col("dl")).alias("contrib")
    )
    scored = weighted.groupBy("term").agg(
        ordered_sum(F.col("contrib")).alias("w")
    )
    return (
        scored.select(
            "term",
            F.floor(F.col("w") * F.lit(1e6)).cast("long").alias("weight_q"),
        )
        .orderBy(F.col("weight_q").desc(), F.col("term"))
        .limit(fb_terms)
    )


def bm25_topk_expanded(
    documents: DataFrame,
    query_terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full pseudo-relevance-feedback retrieval: original query ->
    BM25 pool -> RM expansion terms (:func:`expansion_terms_rm`) ->
    one final BM25 pass over ``original + expansion``.

    Three corpus-bounded stages, two corpus scans total (the expansion
    aggregate reads only the fb_docs pool); the fb_terms expansion list
    crosses the driver as <= fb_terms strings — bounded regardless of
    corpus size, the same pattern as the ANN probe lists.

    Returns ``bm25_topk``'s contract ``(id_col, n_terms, score_q)`` for
    the expanded query."""
    exp = [
        r["term"]
        for r in expansion_terms_rm(
            documents, query_terms, fb_docs=fb_docs, fb_terms=fb_terms,
            k1=k1, b=b, id_col=id_col, text_col=text_col,
        ).collect()
    ]
    expanded = list(query_terms) + [t for t in exp if t not in query_terms]
    return bm25_topk(
        documents, expanded, k=k, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    )


def expansion_oracle_sql(
    query_terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """duckdb twin of :func:`bm25_topk_expanded`, fully in-SQL: the
    BM25 pool CTE is ``bm25_oracle_sql``'s body (same Lucene idf, same
    floor-1e4 quantization, same tie-break), the expansion CTE repeats
    the RM1 estimate (tf/dl contributions sorted-then-folded, floor-1e6
    quantization, term-ascending ties), and the final leg re-scores the
    corpus against the UNION of original and expansion terms via a join
    to the term CTE — the arithmetic the engine runs with a literal
    list, expressed against a computed one."""
    terms = ", ".join(f"'{w}'" for w in query_terms)
    return f"""
        WITH base AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl,
                 string_split(text, ' ') AS toks
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        -- stage 1: BM25 pool for the ORIGINAL query (bm25_oracle_sql body)
        tfq AS (SELECT doc_id, dl, unnest(list_filter(toks,
                       t -> t IN ({terms}))) AS term FROM base),
        tfqc AS (SELECT doc_id, dl, term, count(*) AS tf
                 FROM tfq GROUP BY doc_id, dl, term),
        dfq AS (SELECT term, count(*) AS df FROM tfqc GROUP BY term),
        scoredq AS (
          SELECT tfqc.doc_id,
                 ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                 * (tfqc.tf * {k1 + 1.0})
                 / (tfqc.tf + {k1} * ({1.0 - b} + {b} * tfqc.dl / s.avgdl))
                   AS contrib
          FROM tfqc JOIN dfq USING (term) CROSS JOIN stats s),
        pool AS (
          SELECT doc_id,
                 CAST(FLOOR(list_reduce(list_prepend(0.0::DOUBLE,
                      list_sort(list(contrib))), (a, x) -> a + x)
                      * 10000.0) AS BIGINT) AS score_q
          FROM scoredq GROUP BY doc_id
          ORDER BY score_q DESC, doc_id
          LIMIT {fb_docs}),
        -- stage 2: RM1 expansion terms from the pool documents
        ptoks AS (
          SELECT b.doc_id, b.dl, unnest(b.toks) AS term
          FROM base b JOIN pool USING (doc_id)),
        pterm AS (
          SELECT doc_id, dl, term, count(*) AS tf
          FROM ptoks
          WHERE term <> '' AND term NOT IN ({terms})
          GROUP BY doc_id, dl, term),
        expn AS (
          SELECT term,
                 CAST(FLOOR(list_reduce(list_prepend(0.0::DOUBLE,
                      list_sort(list(tf::DOUBLE / dl))), (a, x) -> a + x)
                      * 1000000.0) AS BIGINT) AS weight_q
          FROM pterm GROUP BY term
          ORDER BY weight_q DESC, term
          LIMIT {fb_terms}),
        -- final leg: BM25 against original UNION expansion terms
        qterms AS (
          SELECT DISTINCT term FROM (
            SELECT unnest([{terms}]) AS term
            UNION ALL SELECT term FROM expn)),
        tfe AS (
          SELECT b.doc_id, b.dl, t.term
          FROM base b, unnest(b.toks) AS u(term)
          JOIN qterms t USING (term)),
        tfec AS (SELECT doc_id, dl, term, count(*) AS tf
                 FROM tfe GROUP BY doc_id, dl, term),
        dfe AS (SELECT term, count(*) AS df FROM tfec GROUP BY term),
        scorede AS (
          SELECT tfec.doc_id,
                 ln(1.0 + (s.n_docs - dfe.df + 0.5) / (dfe.df + 0.5))
                 * (tfec.tf * {k1 + 1.0})
                 / (tfec.tf + {k1} * ({1.0 - b} + {b} * tfec.dl / s.avgdl))
                   AS contrib
          FROM tfec JOIN dfe USING (term) CROSS JOIN stats s)
        SELECT doc_id,
               count(*) AS n_terms,
               CAST(FLOOR(list_reduce(list_prepend(0.0::DOUBLE,
                    list_sort(list(contrib))), (a, x) -> a + x)
                    * 10000.0) AS BIGINT) AS score_q
        FROM scorede
        GROUP BY doc_id
        ORDER BY score_q DESC, doc_id
        LIMIT {k}
    """


def hybrid_topk_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    (Cormack, Clarke & Buettcher 2009): fuse the BM25 top-``pool`` and
    the cosine top-``pool`` by ``sum_i 1/(rrf_k + rank_i)``, ranks
    1-based within each list, absent list contributing 0.

    This is the retrieval shape a training-data pipeline runs for hard-
    negative mining and contrastive-pair labeling: lexical recall
    catches exact-term matches the embedding misses, the embedding
    catches paraphrases BM25 misses, and RRF needs no score
    calibration between the two.  The doc and vector id spaces join on
    equality; ids present in only one corpus (at sf0.1 documents has
    5000 rows, embeddings 2000) participate through that one list —
    the standard RRF treatment.

    Scale shape: both input rankings are TakeOrderedAndProject pools of
    ``pool`` rows (the corpus scans are the underlying operators' —
    in-array term filter for BM25, one literal-broadcast pass for
    cosine); everything downstream (two rank windows, a full-outer
    join, the fused top-k) runs on <= 2*pool rows, so the fusion itself
    is free at any corpus size.

    Returns ``(id_col, lex_rank, sem_rank, rrf)`` — ranks 0 when the
    doc is absent from that list, ``rrf`` rounded at 9 (the two
    1/(rrf_k+rank) terms and their one addition are bit-identical
    cross-engine; the round is belt-and-braces, house style)."""
    from pyspark.sql import Window

    from fastdb_spark.pipeline.ann import cosine_topk

    lex = bm25_topk(
        documents, query_terms, k=pool, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    )
    sem = cosine_topk(
        embeddings, query_vec, k=pool, id_col=vec_id_col, vec_col=vec_col
    )
    # single-task windows are fine HERE: each side is already a
    # TakeOrdered pool of <= `pool` rows, not a corpus
    wl = Window.orderBy(F.col("score_q").desc(), F.col(id_col))
    ws = Window.orderBy(F.col("cos").desc(), F.col(vec_id_col))
    lexr = lex.select(
        F.col(id_col), F.row_number().over(wl).alias("lex_rank")
    )
    semr = sem.select(
        F.col(vec_id_col).alias(id_col),
        F.row_number().over(ws).alias("sem_rank"),
    )
    fused = lexr.join(semr, on=id_col, how="full_outer")
    contrib_l = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank")),
    ).otherwise(F.lit(0.0))
    contrib_s = F.when(
        F.col("sem_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("sem_rank")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            F.col(id_col),
            F.coalesce(F.col("lex_rank"), F.lit(0)).cast("int").alias(
                "lex_rank"
            ),
            F.coalesce(F.col("sem_rank"), F.lit(0)).cast("int").alias(
                "sem_rank"
            ),
            F.round(contrib_l + contrib_s, 9).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )


def hybrid_oracle_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """duckdb twin of :func:`hybrid_topk_rrf` — the BM25 pool CTEs are
    ``bm25_oracle_sql``'s body, the cosine pool is ``ann_topk_sql``'s,
    ranks and the 1/(rrf_k+rank) fusion are spelled in the same
    evaluation order as the Column expressions."""
    terms = ", ".join(f"'{w}'" for w in query_terms)
    cos = (
        "round(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
        WITH base AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl,
                 list_filter(string_split(text, ' '),
                             t -> t IN ({terms})) AS qtoks
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        tf AS (SELECT doc_id, dl, unnest(qtoks) AS term FROM base),
        tfc AS (SELECT doc_id, dl, term, count(*) AS tf
                FROM tf GROUP BY doc_id, dl, term),
        dft AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        scored AS (
          SELECT tfc.doc_id,
                 ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tfc.tf * {k1 + 1.0})
                 / (tfc.tf + {k1} * ({1.0 - b} + {b} * tfc.dl / s.avgdl))
                   AS contrib
          FROM tfc JOIN dft USING (term) CROSS JOIN stats s),
        lexpool AS (
          SELECT doc_id,
                 CAST(FLOOR(list_reduce(list_prepend(0.0::DOUBLE,
                      list_sort(list(contrib))), (a, x) -> a + x)
                      * 10000.0) AS BIGINT) AS score_q
          FROM scored GROUP BY doc_id
          ORDER BY score_q DESC, doc_id
          LIMIT {pool}),
        lexr AS (
          SELECT doc_id, CAST(row_number() OVER (
                   ORDER BY score_q DESC, doc_id) AS INTEGER) AS lex_rank
          FROM lexpool),
        q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = {query_vec_id}),
        sempool AS (
          SELECT e.vec_id AS doc_id, {cos} AS cos
          FROM embeddings e, q
          ORDER BY cos DESC, e.vec_id
          LIMIT {pool}),
        semr AS (
          SELECT doc_id, CAST(row_number() OVER (
                   ORDER BY cos DESC, doc_id) AS INTEGER) AS sem_rank
          FROM sempool),
        fused AS (
          SELECT doc_id, lex_rank, sem_rank
          FROM lexr FULL OUTER JOIN semr USING (doc_id))
        SELECT doc_id,
               COALESCE(lex_rank, 0) AS lex_rank,
               COALESCE(sem_rank, 0) AS sem_rank,
               round((CASE WHEN lex_rank IS NOT NULL
                           THEN 1.0 / ({float(rrf_k)} + lex_rank)
                           ELSE 0.0 END)
                   + (CASE WHEN sem_rank IS NOT NULL
                           THEN 1.0 / ({float(rrf_k)} + sem_rank)
                           ELSE 0.0 END), 9) AS rrf
        FROM fused
        ORDER BY rrf DESC, doc_id
        LIMIT {k}
    """


def hybrid_many_oracle_sql(
    queries: dict[str, tuple[list[str], int]],
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """duckdb twin of :func:`hybrid_topk_rrf_many` — one
    :func:`hybrid_oracle_sql` body per query (``queries`` maps
    query_id -> (terms, query_vec_id)), each tagged with its query_id
    literal and UNION ALL'd.  Sound because the batched engine's
    per-query results are provably equal to per-query single calls
    (the tf/df/n_docs/avgdl statistics are corpus-global and term-local,
    so sharing them across the batch changes nothing — pinned by
    tests/test_round11.py's batched==single equality), and the
    single-query oracle is the adjudicated r11 gate's."""
    parts = [
        f"SELECT '{qid}' AS query_id, * FROM (\n"
        + hybrid_oracle_sql(
            terms, query_vec_id=vid, k=k, pool=pool,
            rrf_k=rrf_k, k1=k1, b=b,
        )
        + "\n)"
        for qid, (terms, vid) in sorted(queries.items())
    ]
    return (
        "\nUNION ALL\n".join(parts)
        + "\nORDER BY query_id, rrf DESC, doc_id"
    )


def hybrid_topk_rrf_many(
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[str, tuple[list[str], list[float]]],
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched :func:`hybrid_topk_rrf`: fuse BM25 and cosine rankings
    for a WHOLE query batch in two corpus passes total — the query-log
    labeling shape (``queries`` maps query_id -> (terms, vector)).

    The lexical side is ONE :func:`bm25_topk_many` pass (the union of
    all query terms filters in-array / broadcast-semi before explode;
    tf/df aggregate once and fan out to queries); the semantic side is
    ONE ``ann.cosine_topk_many`` pass (the query-vector batch
    broadcasts, per-query rank windows bounded by ``pool``).  Per-query
    pools are then <= pool rows each, so the rank + fusion stage runs
    on <= 2*pool*|Q| rows — free at any corpus size, like the
    single-query operator.

    Returns ``(query_id, id_col, lex_rank, sem_rank, rrf)`` — the
    single-query operator's contract per query (rank 0 = absent from
    that list, ``rrf`` rounded at 9), top-``k`` per query by
    (rrf DESC, id ASC).  Property-tested equal to per-query
    :func:`hybrid_topk_rrf` calls."""
    from pyspark.sql import Window

    from fastdb_spark.pipeline.ann import cosine_topk_many

    spark = documents.sparkSession
    lex_pool = bm25_topk_many(
        documents, {qid: terms for qid, (terms, _v) in queries.items()},
        k=pool, k1=k1, b=b, id_col=id_col, text_col=text_col,
    )
    from fastdb_spark.localrel import tiny_local_df

    qvecs = tiny_local_df(
        spark,
        [
            (str(qid), [float(x) for x in vec])
            for qid, (_t, vec) in sorted(queries.items())
        ],
        "query_id string, query_vec array<double>",
    )
    sem_pool = cosine_topk_many(
        embeddings, qvecs, k=pool, id_col=vec_id_col, vec_col=vec_col,
        query_id_col="query_id", query_vec_col="query_vec",
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col(id_col)
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(vec_id_col)
    )
    lexr = lex_pool.select(
        "query_id", F.col(id_col), F.row_number().over(wl).alias("lex_rank")
    )
    semr = sem_pool.select(
        "query_id",
        F.col(vec_id_col).alias(id_col),
        F.row_number().over(ws).alias("sem_rank"),
    )
    fused = lexr.join(semr, on=["query_id", id_col], how="full_outer")
    contrib_l = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank")),
    ).otherwise(F.lit(0.0))
    contrib_s = F.when(
        F.col("sem_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("sem_rank")),
    ).otherwise(F.lit(0.0))
    scored = fused.select(
        "query_id",
        F.col(id_col),
        F.coalesce(F.col("lex_rank"), F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce(F.col("sem_rank"), F.lit(0)).cast("int").alias("sem_rank"),
        F.round(contrib_l + contrib_s, 9).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(wf))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
