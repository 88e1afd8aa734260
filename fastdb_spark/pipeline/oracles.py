"""DuckDB oracle SQL for the pipeline operators.

Each builder mirrors the corresponding Spark operator expression-for-
expression (same md5 hashing, same rounding, same tie-breaks) so the
driver's value-hash comparison is exact.  Parameters default to the
operator defaults — change them together.
"""

from __future__ import annotations

from fastdb_spark.functions.text import STOPWORDS
from fastdb_spark.pipeline.corpus import (
    EXACTDUP_DOCS_SQL,
    NEARDUP_DOCS_SQL,
    NEARDUP_EMBS_SQL,
)

TOKS = "string_split(text, ' ')"


def _word_shingles(k: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({TOKS}) - {k - 1}, 0)), "
        f"i -> array_to_string({TOKS}[i:i+{k - 1}], ' ')))"
    )


def _char_shingles(k: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length(text) - {k - 1}, 0)), "
        f"i -> text[i:i+{k - 1}]))"
    )


def doc_stats_sql() -> str:
    sw = {c: ", ".join(f"'{w}'" for w in ws) for c, ws in STOPWORDS.items()}
    scores = {
        c: (
            f"len(list_filter({TOKS}, w -> list_contains([{sw[c]}], w)))"
            f" / greatest(len({TOKS}), 1)"
        )
        for c in sorted(STOPWORDS)
    }
    mtl = f"list_sum(list_transform({TOKS}, w -> length(w))) / greatest(len({TOKS}), 1)"
    punct = (
        "length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))"
        " / greatest(length(text), 1)"
    )
    n_tok = f"len({TOKS})"
    return f"""
        WITH scored AS (
          SELECT doc_id, text,
                 {scores["de"]} AS s_de, {scores["en"]} AS s_en,
                 {scores["es"]} AS s_es, {scores["fr"]} AS s_fr,
                 {mtl} AS mtl, {punct} AS punct
          FROM documents)
        SELECT doc_id,
               length(text) AS n_chars,
               {n_tok} AS n_tokens,
               CAST(list_sum(list_transform({TOKS},
                    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
                 AS n_subword_tokens,
               CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
                 AS BIGINT) AS n_bpe_tokens,
               round(mtl, 6) AS mean_token_len,
               round(punct, 6) AS punct_ratio,
               round({scores["en"]}, 6) AS stopword_ratio_en,
               round((
                 (CASE WHEN {n_tok} >= 10 AND {n_tok} <= 1000 THEN 1.0 ELSE 0.5 END)
                 + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 + (1.0 - least(punct * 5.0, 1.0))
               ) / 3.0, 6) AS quality,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0.0 THEN 'und'
                    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    ELSE 'de' END AS lang_pred,
               md5(regexp_replace(trim(text), ' +', ' ', 'g')) AS fingerprint
        FROM scored
    """


def exact_dedup_sql() -> str:
    return f"""
        WITH corpus AS ({EXACTDUP_DOCS_SQL})
        SELECT md5(regexp_replace(trim(text), ' +', ' ', 'g')) AS fingerprint,
               min(doc_id) AS keep_id,
               count(*) AS group_size
        FROM corpus GROUP BY 1
    """


def _md5x_sig_elems(n_hashes: int) -> str:
    """duckdb twin of sketches.minhash_signature (the md5x scheme): xs =
    one md5-seeded 32-bit int per shingle (must be provided by an ``xs``
    column), element i = min of the integer permutation, with the
    MD5X_EMPTY sentinel for empty shingle sets."""
    from fastdb_spark.functions.sketches import MD5X_EMPTY, MD5X_MOD, md5x_offsets

    offs = md5x_offsets(n_hashes)
    return ", ".join(
        f"coalesce(list_min(list_transform(xs,"
        f" x -> (x * {2 * i + 1} + {offs[i]}) % {MD5X_MOD})), {MD5X_EMPTY})"
        for i in range(n_hashes)
    )


_MD5X_XS = (
    "list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)"
)


def _md5x_band_selects(src: str, bands: int, rows: int) -> str:
    """duckdb twin of sketches.lsh_band_hashes: 'b{j}:' + comma-joined
    signature slice (sig is BIGINT[]; elements cast to VARCHAR).
    Sentinel (shingle-less) signatures emit no bands — same guard as the
    Spark side (one shared bucket would be quadratic in the count of
    shingle-less docs)."""
    from fastdb_spark.functions.sketches import MD5X_EMPTY

    return " UNION ALL ".join(
        f"SELECT doc_id, 'b{j}:' || array_to_string(list_transform("
        f"sig[{j * rows + 1}:{(j + 1) * rows}],"
        f" x -> CAST(x AS VARCHAR)), ',') AS band FROM {src}"
        f" WHERE sig[1] <> {MD5X_EMPTY}"
        for j in range(bands)
    )


def _minhash_pair_ctes(
    src: str, shingle_k: int, n_hashes: int, bands: int, threshold: float
) -> str:
    """CTE chain computing minhash-LSH near-dup pairs over CTE ``src``
    (must expose doc_id, text); terminal CTE is ``mh_pairs``."""
    rows = n_hashes // bands
    sig_elems = _md5x_sig_elems(n_hashes)
    band_selects = _md5x_band_selects("sig", bands, rows)
    return f"""
        sh AS (SELECT doc_id, {_word_shingles(shingle_k)} AS sh FROM {src}),
        xsrc AS (SELECT doc_id, sh, {_MD5X_XS} AS xs FROM sh),
        sig AS (SELECT doc_id, [{sig_elems}] AS sig FROM xsrc),
        bands AS ({band_selects}),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.doc_id < b.doc_id),
        mh_pairs AS (
          SELECT id_a, id_b, jaccard FROM (
            SELECT c.id_a, c.id_b,
                   round(len(list_intersect(x.sh, y.sh))
                         / greatest(len(list_distinct(x.sh || y.sh)), 1), 6)
                     AS jaccard
            FROM cand c
            JOIN sh x ON x.doc_id = c.id_a
            JOIN sh y ON y.doc_id = c.id_b)
          WHERE jaccard >= {threshold})
    """


def minhash_lsh_sql(
    shingle_k: int = 3, n_hashes: int = 12, bands: int = 4, threshold: float = 0.5
) -> str:
    ctes = _minhash_pair_ctes("corpus", shingle_k, n_hashes, bands, threshold)
    return f"""
        WITH corpus AS ({NEARDUP_DOCS_SQL}),
        {ctes}
        SELECT id_a, id_b, jaccard FROM mh_pairs
    """


def curate_sql(
    min_tokens: int = 10,
    min_quality: float = 0.6,
    shingle_k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    corpus_sql: str | None = None,
) -> str:
    """The composed curation pipeline: quality gate -> exact dedup ->
    minhash near-dedup (drop id_b of every pair).  ``corpus_sql``
    overrides the planted-dup corpus derivation (default) with any
    (doc_id, text) SELECT."""
    from fastdb_spark.pipeline.corpus import CURATE_DOCS_SQL

    if corpus_sql is None:
        corpus_sql = CURATE_DOCS_SQL

    mtl = f"list_sum(list_transform({TOKS}, w -> length(w))) / greatest(len({TOKS}), 1)"
    punct = (
        "length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))"
        " / greatest(length(text), 1)"
    )
    n_tok = f"len({TOKS})"
    quality = f"""round((
        (CASE WHEN {n_tok} >= 10 AND {n_tok} <= 1000 THEN 1.0 ELSE 0.5 END)
        + (CASE WHEN {mtl} >= 3.0 AND {mtl} <= 10.0 THEN 1.0 ELSE 0.5 END)
        + (1.0 - least({punct} * 5.0, 1.0))
      ) / 3.0, 6)"""
    mh = _minhash_pair_ctes("kept", shingle_k, n_hashes, bands, threshold)
    return f"""
        WITH corpus AS ({corpus_sql}),
        stats AS (SELECT doc_id, text, {n_tok} AS n_tokens,
                         {quality} AS quality,
                         md5(regexp_replace(trim(text), ' +', ' ', 'g'))
                           AS fingerprint
                  FROM corpus),
        filtered AS (SELECT * FROM stats
                     WHERE n_tokens >= {min_tokens}
                       AND quality >= {min_quality}),
        canon AS (SELECT fingerprint, min(doc_id) AS doc_id
                  FROM filtered GROUP BY fingerprint),
        kept AS (SELECT f.* FROM filtered f
                 JOIN canon c ON f.doc_id = c.doc_id
                             AND f.fingerprint = c.fingerprint),
        {mh}
        SELECT k.doc_id, k.n_tokens, k.quality, k.fingerprint
        FROM kept k
        WHERE NOT EXISTS (SELECT 1 FROM mh_pairs p WHERE p.id_b = k.doc_id)
    """


def dup_clusters_sql(
    shingle_k: int = 3, n_hashes: int = 12, bands: int = 4, threshold: float = 0.5
) -> str:
    """Transitive duplicate clusters over the minhash-LSH pairs: the
    recursive-CTE transitive closure labels every node with the minimum
    reachable id — the SQL twin of the large-star/small-star DataFrame
    algorithm in ``pipeline.cluster`` (same labels, different algorithm;
    closure is fine at oracle scale, star-contraction is the 100 TB one).
    """
    ctes = _minhash_pair_ctes("corpus", shingle_k, n_hashes, bands, threshold)
    return f"""
        WITH RECURSIVE corpus AS ({NEARDUP_DOCS_SQL}),
        {ctes},
        edges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs
                  UNION SELECT id_b, id_a FROM mh_pairs),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
                FROM reach GROUP BY u)
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               doc_id = cluster_id AS is_keeper
        FROM lab
    """


def doc_repetition_sql() -> str:
    """duckdb twin of ``textstats.repetition_stats`` — identical n-gram
    construction (1-indexed inclusive slices) and integral-ppm floors."""
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        grams AS (
          SELECT doc_id, 1 AS n, unnest(t) AS gram FROM toks
          UNION ALL
          SELECT doc_id, 2 AS n,
                 unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> array_to_string(t[i:i+1], ' '))) AS gram
          FROM toks
          UNION ALL
          SELECT doc_id, 3 AS n,
                 unnest(list_transform(generate_series(1, len(t) - 2),
                        i -> array_to_string(t[i:i+2], ' '))) AS gram
          FROM toks),
        cnt AS (SELECT doc_id, n, gram, count(*) AS c
                FROM grams GROUP BY doc_id, n, gram),
        per AS (SELECT doc_id, n, max(c) AS topc, sum(c) AS tot,
                       count(*) AS nd
                FROM cnt GROUP BY doc_id, n)
        SELECT doc_id,
               CAST(max(CASE WHEN n = 1 THEN tot END) AS BIGINT) AS n_tokens,
               CAST(COALESCE(FLOOR(max(CASE WHEN n = 1 THEN topc END)
                    * 1000000.0 / max(CASE WHEN n = 1 THEN tot END)), 0)
                    AS BIGINT) AS top_word_ppm,
               CAST(COALESCE(FLOOR(max(CASE WHEN n = 2 THEN topc END)
                    * 1000000.0 / max(CASE WHEN n = 2 THEN tot END)), 0)
                    AS BIGINT) AS top_bigram_ppm,
               CAST(COALESCE(FLOOR((max(CASE WHEN n = 3 THEN tot END)
                    - max(CASE WHEN n = 3 THEN nd END))
                    * 1000000.0 / max(CASE WHEN n = 3 THEN tot END)), 0)
                    AS BIGINT) AS dup_trigram_ppm
        FROM per GROUP BY doc_id
    """


def simhash_sql(shingle_k: int = 3, max_hamming: int = 16) -> str:
    bitsums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    recombine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(60)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, "
        f"'{j}:' || CAST((simhash >> {j * 10}) & 1023 AS VARCHAR) AS band_key "
        f"FROM sim"
        for j in range(6)
    )
    return f"""
        WITH corpus AS ({NEARDUP_DOCS_SQL}),
        sh AS (SELECT doc_id, {_word_shingles(shingle_k)} AS sh FROM corpus),
        exploded AS (SELECT doc_id,
                            ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS h
                     FROM sh),
        bits AS (SELECT doc_id, {bitsums} FROM exploded GROUP BY doc_id),
        sim AS (SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM bits),
        bands AS ({band_selects}),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.simhash AS ha, b.simhash AS hb
                 FROM bands a JOIN bands b
                   ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, bit_count(xor(ha, hb)) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
    """


def ngram_jaccard_sql(
    shingle_k: int = 8, block_tokens: int = 5, threshold: float = 0.5
) -> str:
    return f"""
        WITH corpus AS ({NEARDUP_DOCS_SQL}),
        keyed AS (SELECT doc_id,
                         md5(array_to_string({TOKS}[1:{block_tokens}], ' ')) AS block,
                         {_char_shingles(shingle_k)} AS sh
                  FROM corpus),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM keyed a JOIN keyed b
                   ON a.block = b.block AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, jaccard FROM (
          SELECT c.id_a, c.id_b,
                 round(len(list_intersect(x.sh, y.sh))
                       / greatest(len(list_distinct(x.sh || y.sh)), 1), 6)
                   AS jaccard
          FROM cand c
          JOIN keyed x ON x.doc_id = c.id_a
          JOIN keyed y ON y.doc_id = c.id_b)
        WHERE jaccard >= {threshold}
    """


_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def embedding_neardup_sql(threshold: float = 0.95) -> str:
    cos = _COS.format(a="a.embedding", b="b.embedding")
    return f"""
        WITH corpus AS ({NEARDUP_EMBS_SQL})
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE {cos} >= {threshold}
    """


def ann_batch_topk_sql(k: int = 5, n_queries: int = 5) -> str:
    """Twin of ``ann.cosine_topk_many`` over the first ``n_queries`` raw
    corpus vectors: corpus x query-batch scored once, per-query rank
    window, top ``k`` each."""
    cos = _COS.format(a="e.embedding::DOUBLE[]", b="q.qv")
    return f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < {n_queries}),
        scored AS (
          SELECT q.query_id, e.vec_id, {cos} AS cos
          FROM embeddings e CROSS JOIN q),
        r AS (
          SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, vec_id) AS rk
          FROM scored)
        SELECT query_id, vec_id, cos FROM r WHERE rk <= {k}
    """


def ann_topk_sql(k: int = 10, query_vec_id: int = 0) -> str:
    cos = _COS.format(a="e.embedding::DOUBLE[]", b="q.qv")
    return f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                   WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, {cos} AS cos
        FROM embeddings e, q
        ORDER BY cos DESC, e.vec_id
        LIMIT {k}
    """


def incdedup_oracle_sql(
    shingle_k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    remove_pred: str | None = None,
    final: str = "index",
) -> str:
    """duckdb twin of the UNCAPPED incremental dedup-index choreography
    (``incdedup.build_dedup_index`` on the even-id half of documents,
    then ``dedup_index_upsert(max_bucket_size=None)`` with the odd-id
    half): batch-1 exact keep-min + in-batch near-dup, then for
    batch 2 (a) exact-vs-index anti + in-batch exact keep-min, (b)
    near-dup-vs-index drop, (c) in-batch near-dup — the final
    SELECT spells the in-batch rule as the one-shot EXISTS form, which
    EQUALS the engine's greedy-MIS rule on this corpus (its planted
    near-dup families are cliques; the rules differ only on chains,
    covered by tests/test_replay_chains.py) — the final
    SELECT is the indexed (doc_id, fingerprint) set.  Shingle/minhash/
    band arithmetic is identical to :func:`_minhash_pair_ctes` (already
    hash-green vs the Spark sketches).

    ``remove_pred`` (a SQL predicate over ``doc_id``) replays a
    ``dedup_index_remove`` BETWEEN the build and the upsert: matching
    batch-1 index entries vanish from the index batch 2 is checked
    against — the takedown-gate choreography.

    ``final="probe"`` swaps the final SELECT for the dry-run REPORT
    :func:`incdedup.dedup_index_probe` emits over batch 2: one
    ``(doc_id, verdict)`` row per odd doc, verdict in ``exact`` (its
    fingerprint is already indexed) / ``in_batch_exact`` (fingerprint
    collides in the batch, not min id) / ``near`` (Jaccard vs an
    indexed doc >= threshold) / ``in_batch_near`` (dropped by the
    greedy in-batch pass) / ``fresh`` (an upsert would append it) —
    the identical CTE stages, classified instead of filtered."""
    rows = n_hashes // bands
    keep = f"NOT ({remove_pred})" if remove_pred else "TRUE"
    sig = _md5x_sig_elems(n_hashes)

    def band_sel(src: str) -> str:
        return _md5x_band_selects(src, bands, rows)

    jac = (
        "round(len(list_intersect(x.sh, y.sh))"
        " / greatest(len(list_distinct(x.sh || y.sh)), 1), 6)"
    )
    # Every CTE is MATERIALIZED: duckdb inlines CTEs by default, and
    # this choreography references each stage several times (the jac
    # refine joins its stage twice; the probe final touches six stages)
    # — inlined, the evaluation tree re-runs the md5x signature chain
    # exponentially with stage depth (measured: the roundtrip twin went
    # >8 min at 500 docs; materialized it is seconds).
    return f"""
        WITH fp AS MATERIALIZED (
          SELECT doc_id, text,
                 md5(regexp_replace(trim(text), ' +', ' ', 'g')) AS fingerprint
          FROM documents),
        sig_all AS MATERIALIZED (
          SELECT doc_id, fingerprint, sh, [{sig}] AS sig
          FROM (SELECT doc_id, fingerprint, sh, {_MD5X_XS} AS xs
                FROM (SELECT doc_id, fingerprint,
                             {_word_shingles(shingle_k)} AS sh FROM fp))),
        b1 AS MATERIALIZED (SELECT * FROM sig_all WHERE doc_id % 2 = 0),
        b1canon AS MATERIALIZED (SELECT fingerprint, min(doc_id) AS doc_id
                    FROM b1 GROUP BY fingerprint),
        b1k AS MATERIALIZED (SELECT b1.* FROM b1 JOIN b1canon c
                ON b1.doc_id = c.doc_id AND b1.fingerprint = c.fingerprint),
        b1bands AS MATERIALIZED ({band_sel('b1k')}),
        b1cand AS MATERIALIZED (
                   SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM b1bands a JOIN b1bands b
                     ON a.band = b.band AND a.doc_id < b.doc_id),
        b1drop AS MATERIALIZED (SELECT DISTINCT c.id_b AS doc_id
                   FROM b1cand c JOIN b1k x ON x.doc_id = c.id_a
                                 JOIN b1k y ON y.doc_id = c.id_b
                   WHERE {jac} >= {threshold}),
        idx0 AS MATERIALIZED (SELECT * FROM b1k
                 WHERE doc_id NOT IN (SELECT doc_id FROM b1drop)),
        idx1 AS MATERIALIZED (SELECT * FROM idx0 WHERE {keep}),
        b2 AS MATERIALIZED (SELECT * FROM sig_all WHERE doc_id % 2 = 1),
        b2f AS MATERIALIZED (SELECT * FROM b2 WHERE fingerprint NOT IN
                  (SELECT fingerprint FROM idx1)),
        b2canon AS MATERIALIZED (SELECT fingerprint, min(doc_id) AS doc_id
                    FROM b2f GROUP BY fingerprint),
        b2k AS MATERIALIZED (SELECT b2f.* FROM b2f JOIN b2canon c
                ON b2f.doc_id = c.doc_id AND b2f.fingerprint = c.fingerprint),
        b2bands AS MATERIALIZED ({band_sel('b2k')}),
        idxbands AS MATERIALIZED ({band_sel('idx1')}),
        xcand AS MATERIALIZED (
                  SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
                  FROM b2bands n JOIN idxbands o ON n.band = o.band),
        xdrop AS MATERIALIZED (SELECT DISTINCT c.id_new AS doc_id
                  FROM xcand c JOIN b2k x ON x.doc_id = c.id_new
                               JOIN idx1 y ON y.doc_id = c.id_old
                  WHERE {jac} >= {threshold}),
        b2r AS MATERIALIZED (SELECT * FROM b2k
                WHERE doc_id NOT IN (SELECT doc_id FROM xdrop)),
        b2rbands AS MATERIALIZED ({band_sel('b2r')}),
        b2rcand AS MATERIALIZED (
                    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM b2rbands a JOIN b2rbands b
                      ON a.band = b.band AND a.doc_id < b.doc_id),
        b2drop AS MATERIALIZED (SELECT DISTINCT c.id_b AS doc_id
                   FROM b2rcand c JOIN b2r x ON x.doc_id = c.id_a
                                  JOIN b2r y ON y.doc_id = c.id_b
                   WHERE {jac} >= {threshold})
        {_INCDEDUP_FINALS[final]}
    """


# Final SELECTs over the shared incdedup CTE stages: "index" is the
# persisted (doc_id, fingerprint) membership (roundtrip / takedown /
# compaction gates — compaction is content-preserving by contract, so it
# shares the roundtrip's twin verbatim); "probe" is the dry-run verdict
# REPORT over batch 2 — the same stages classified instead of filtered,
# a partition of the odd ids by construction.
_INCDEDUP_FINALS = {
    "index": """
        SELECT doc_id, fingerprint FROM idx1
        UNION ALL
        SELECT doc_id, fingerprint FROM b2r
        WHERE doc_id NOT IN (SELECT doc_id FROM b2drop)""",
    "probe": """
        SELECT doc_id, 'exact' AS verdict FROM b2
        WHERE fingerprint IN (SELECT fingerprint FROM idx1)
        UNION ALL
        SELECT doc_id, 'in_batch_exact' AS verdict FROM b2f
        WHERE doc_id NOT IN (SELECT doc_id FROM b2k)
        UNION ALL
        SELECT doc_id, 'near' AS verdict FROM xdrop
        UNION ALL
        SELECT doc_id, 'in_batch_near' AS verdict FROM b2drop
        UNION ALL
        SELECT doc_id, 'fresh' AS verdict FROM b2r
        WHERE doc_id NOT IN (SELECT doc_id FROM b2drop)""",
}


# ---------------------------------------------------------------------------
# exhaustive-parameter ANN adjudication (VERDICT r6 #2)


def _clustered_ctes(n_centers: int = 25, spread: float = 0.1, dim: int = 64) -> str:
    """duckdb CTEs reproducing ``pipeline.corpus.clustered_embs`` bit for
    bit: the 25 md5-derived centers ride as a literal VALUES table
    (``repr`` round-trips every double exactly) and each corpus vector
    becomes ``center[vec_id % n] + spread * v`` with the same left-to-
    right double arithmetic Spark's ``zip_with`` lambda evaluates."""
    from fastdb_spark.pipeline.ann import _hyperplane

    rows = ",\n          ".join(
        "({}, [{}]::DOUBLE[])".format(
            c, ", ".join(repr(x) for x in _hyperplane(1000 + c, dim))
        )
        for c in range(n_centers)
    )
    elems = ", ".join(
        f"cv[{i}] + {spread!r} * ev[{i}]" for i in range(1, dim + 1)
    )
    return f"""
        centers(c, cv) AS (VALUES {rows}),
        ev AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        ce AS (
          SELECT ev.vec_id, [{elems}]::DOUBLE[] AS cemb
          FROM ev JOIN centers ON centers.c = ev.vec_id % {n_centers}
        )"""


def ann_exhaustive_sql(methods: list[str], k: int = 10, query_vec_id: int = 0) -> str:
    """Oracle for the exhaustive-parameter ANN gate: every listed method
    is configured so its candidate set provably covers the whole corpus
    (all LSH buckets probed / nprobe = n_clusters / rerank >= corpus), so
    each method's output EQUALS the exact clustered-corpus top-k — the
    oracle is that exact top-k cross-joined with the method labels."""
    cos = _COS.format(a="ce.cemb", b="q.qv")
    labels = ", ".join(f"('{m}')" for m in methods)
    return f"""
        WITH {_clustered_ctes()},
        q AS (SELECT cemb AS qv FROM ce WHERE vec_id = {query_vec_id}),
        topk AS (
          SELECT ce.vec_id, {cos} AS cos
          FROM ce, q
          ORDER BY cos DESC, ce.vec_id
          LIMIT {k}
        )
        SELECT m.method, t.vec_id, t.cos
        FROM topk t CROSS JOIN (VALUES {labels}) m(method)
    """


def ann_takedown_sql(
    k: int = 10,
    query_vec_id: int = 0,
    keep_pred: str = "vec_id % 10 <> 0",
) -> str:
    """Oracle for the IVF-takedown gate: the index holds the whole
    clustered corpus except the removed ids (build evens -> remove
    multiples of 10 -> upsert odds, and every multiple of 10 is even),
    and the probe is exhaustive, so the result must EQUAL the exact
    top-k over ``ce`` filtered by ``keep_pred``.  The query vector stays
    the full-corpus vec 0 — removal takes it out of the INDEX, not out
    of the caller's hand."""
    cos = _COS.format(a="ce.cemb", b="q.qv")
    return f"""
        WITH {_clustered_ctes()},
        q AS (SELECT cemb AS qv FROM ce WHERE vec_id = {query_vec_id})
        SELECT ce.vec_id, {cos} AS cos
        FROM ce, q
        WHERE {keep_pred}
        ORDER BY cos DESC, ce.vec_id
        LIMIT {k}
    """


def semdedup_sql(
    eps: float = 0.92,
    n_centers: int = 25,
    spread: float = 0.8,
    dim: int = 64,
) -> str:
    """duckdb twin of ``pipeline.semdedup.semantic_dedup`` over the
    clustered-corpus derivation at ``spread``.

    Stage-for-stage: assignment is the row_number twin of
    ``with_ivf_cluster``'s argmax (round-9 cosine DESC, centroid id ASC);
    within-cluster pairs use the same round-6 cosine filter; the
    transitive closure is the recursive-CTE reach labeling (the SQL twin
    of large-star/small-star, same labels); keeper election is the
    ``row_number() = 1`` twin of the ``min(struct(cos_c, id))``
    aggregate.  Every non-recursive CTE is MATERIALIZED (duckdb inlines
    CTEs per reference site; the scored/pairs stages are each referenced
    twice)."""
    cosc = _COS.format(a="ce.cemb", b="centers.cv").replace(", 6)", ", 9)")
    cosp = _COS.format(a="a.cemb", b="b.cemb")
    return f"""
        WITH RECURSIVE {_clustered_ctes(n_centers, spread, dim)},
        scored AS MATERIALIZED (
          SELECT ce.vec_id, ce.cemb, centers.c, {cosc} AS cosc
          FROM ce CROSS JOIN centers),
        asg AS MATERIALIZED (
          SELECT vec_id, cemb, c AS cluster, cosc FROM (
            SELECT *, row_number() OVER (
                        PARTITION BY vec_id
                        ORDER BY cosc DESC, c ASC) AS rk
            FROM scored)
          WHERE rk = 1),
        pairs AS MATERIALIZED (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM asg a JOIN asg b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE {cosp} >= {eps}),
        edges AS MATERIALIZED (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lab AS MATERIALIZED (
          SELECT u AS vec_id, least(u, min(v)) AS group_id
          FROM reach GROUP BY u),
        grp AS MATERIALIZED (
          SELECT asg.vec_id, asg.cluster, asg.cosc,
                 COALESCE(lab.group_id, asg.vec_id) AS group_id
          FROM asg LEFT JOIN lab ON lab.vec_id = asg.vec_id)
        SELECT vec_id, cluster, cosc AS cos_c, group_id,
               count(*) OVER (PARTITION BY group_id) AS group_size,
               row_number() OVER (PARTITION BY group_id
                                  ORDER BY cosc ASC, vec_id ASC) = 1
                 AS is_keeper
        FROM grp
    """


def _resolve_sf_dir(sf_dir: str | None) -> str:
    """The corpus dir the literal-VALUES oracles replay — resolved like
    the parity harnesses resolve theirs."""
    import os

    return (
        sf_dir
        or os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
        or os.environ.get("SF_DIR")
        or "/root/testdata/sf0.01"
    )


def _corpus_stat(sf_dir: str, filename: str):
    """``os.stat`` of a corpus parquet with a clear error when the sf
    dir was never generated (ADVICE r10: the bare FileNotFoundError from
    os.stat fired before any duckdb error and named only the path)."""
    import os

    p = os.path.join(sf_dir, filename)
    try:
        return os.stat(p)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"oracle corpus missing: {p} — the literal-VALUES oracle "
            "replays the parquet corpus; generate the sf dir first"
        ) from None


def _cache_get(cache: dict, sf_dir: str, key: tuple):
    entry = cache.get(sf_dir)
    return entry[1] if entry is not None and entry[0] == key else None


def _cache_put(cache: dict, sf_dir: str, key: tuple, sql: str) -> str:
    """ONE entry per sf_dir (ADVICE r10): a regenerated corpus at the
    same path replaces the prior entry instead of accumulating one full
    VALUES-SQL string per regeneration in a long-lived process."""
    cache[sf_dir] = (key, sql)
    return sql


#: memo for :func:`semindex_values_sql` — the duckdb pair pass is
#: seconds; keyed by every input that changes the output, ONE entry per
#: sf_dir (regeneration evicts — ADVICE r10)
_SEMINDEX_CACHE: dict = {}


def semindex_values_sql(
    eps: float = 0.92,
    n_centers: int = 25,
    spread: float = 0.8,
    dim: int = 64,
    sf_dir: str | None = None,
) -> str:
    """Literal-VALUES oracle for the semantic-index roundtrip
    choreography (``incsem``: build on the even-id half, take down
    ``vec_id % 10 == 0``, upsert the odd half), generated by an
    INDEPENDENT implementation — the :func:`bpe_train_values_sql`
    pattern for iterative, non-SQL-expressible semantics:

    - duckdb computes every NUMBER bit-exactly from the parquet corpus
      (assignment = the row_number twin of the round-9 argmax; the
      within-cluster round-6 cosine edge list — ``list_dot_product``
      matches Spark's ``zip_with`` fold bit for bit);
    - a pure-python SEQUENTIAL greedy replays the admission (keep x iff
      no KEPT eps-neighbor with a lower id — the definitionally-ordered
      form, independently of the engine's parallel fixpoint), the
      takedown, the vs-index drops, and the second admission.

    Greedy-MIS admission (not the one-shot drop-every-pair's-higher-id
    rule) is what the engine ships because it makes replays idempotent;
    this oracle is the sequential definition of the same rule."""
    import duckdb

    sf_dir = _resolve_sf_dir(sf_dir)
    # cache key includes the corpus file identity (mtime+size), not just
    # its path — a regenerated parquet at the same path must not serve a
    # stale membership (ADVICE r9); one entry per sf_dir (ADVICE r10)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (eps, n_centers, spread, dim, st.st_mtime_ns, st.st_size)
    cached = _cache_get(_SEMINDEX_CACHE, sf_dir, key)
    if cached is not None:
        return cached
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    cosc = _COS.format(a="ce.cemb", b="centers.cv").replace(", 6)", ", 9)")
    cosp = _COS.format(a="a.cemb", b="b.cemb")
    base = f"""
        WITH {_clustered_ctes(n_centers, spread, dim)},
        scored AS MATERIALIZED (
          SELECT ce.vec_id, ce.cemb, centers.c, {cosc} AS cosc
          FROM ce CROSS JOIN centers),
        asg AS MATERIALIZED (
          SELECT vec_id, cemb, c AS cluster FROM (
            SELECT *, row_number() OVER (
                        PARTITION BY vec_id
                        ORDER BY cosc DESC, c ASC) AS rk
            FROM scored)
          WHERE rk = 1)
    """
    cluster = dict(
        con.execute(base + "SELECT vec_id, cluster FROM asg").fetchall()
    )
    edges = con.execute(
        base
        + f"""
        SELECT a.vec_id, b.vec_id FROM asg a JOIN asg b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE {cosp} >= {eps}"""
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    # sequential definition, spelled directly: keep x iff no kept y < x
    def greedy(ids: list[int]) -> set[int]:
        kept: set[int] = set()
        for x in sorted(ids):
            if not (adj.get(x, set()) & kept):
                kept.add(x)
        return kept

    b1 = [v for v in cluster if v % 2 == 0]
    idx1 = greedy(b1)
    idxr = {v for v in idx1 if v % 10 != 0}
    b2 = [v for v in cluster if v % 2 == 1]
    b2rest = [v for v in b2 if not (adj.get(v, set()) & idxr)]
    final = sorted(idxr | greedy(b2rest))
    if final:
        rows = ",\n          ".join(
            f"({v}, {cluster[v]})" for v in final
        )
        sql = f"""
            SELECT CAST(c0 AS BIGINT) AS vec_id,
                   CAST(c1 AS INTEGER) AS cluster
            FROM (VALUES {rows}) AS t(c0, c1)
        """
    else:
        # 'FROM (VALUES )' is invalid SQL — an empty final membership
        # (possible only on a degenerate corpus: admission keeps each
        # eps-group's minimum id, so non-empty input => non-empty index
        # unless the takedown removed everything) becomes an explicit
        # zero-row SELECT with the same schema (ADVICE r9)
        sql = """
            SELECT CAST(NULL AS BIGINT) AS vec_id,
                   CAST(NULL AS INTEGER) AS cluster
            WHERE FALSE
        """
    return _cache_put(_SEMINDEX_CACHE, sf_dir, key, sql)


# ---------------------------------------------------------------------------
# BPE trainer literal-VALUES oracle (VERDICT r6 #5)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


#: memo for :func:`bpe_train_values_sql` — ``oracle_sql()`` is invoked
#: once per parametrized parity test, and the trainer pass is seconds,
#: not microseconds; keyed by every input that changes the output
_BPE_VALUES_CACHE: dict = {}


def bpe_train_values_sql(
    n_merges: int = 64,
    max_words: int = 32768,
    min_count: int = 1,
    sf_dir: str | None = None,
) -> str:
    """Literal VALUES oracle for ``bpe_train_merges``, generated by an
    INDEPENDENT trainer: duckdb computes the word histogram straight from
    the parquet corpus (same cap rule: top ``max_words`` by count desc,
    word asc) and a pure-Python occurrence-style merge loop (the
    tests/test_tokenizer_shards.py reference algorithm, weighted by the
    histogram) derives the merges — no Spark, no code shared with
    ``pipeline.tokenizer``.  The corpus is resolved like the parity
    harnesses resolve theirs: ``$SPARK_GRAFT_TEST_SF_DIR`` / ``$SF_DIR``,
    defaulting to the driver's sf0.01 adjudication corpus."""
    import duckdb

    sf_dir = _resolve_sf_dir(sf_dir)
    # same stale-cache discipline as semindex_values_sql: key on the
    # corpus file identity, one entry per sf_dir (ADVICE r10)
    _dst = _corpus_stat(sf_dir, "documents.parquet")
    key = (n_merges, max_words, min_count, _dst.st_mtime_ns, _dst.st_size)
    cached = _cache_get(_BPE_VALUES_CACHE, sf_dir, key)
    if cached is not None:
        return cached
    hist = duckdb.sql(
        f"""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM read_parquet('{sf_dir}/documents.parquet'))
        WHERE word <> ''
        GROUP BY word
        HAVING count(*) >= {min_count}
        ORDER BY n DESC, word
        LIMIT {max_words}
        """
    ).fetchall()
    # reference merge loop: mutable symbol sequence per word TYPE, pair
    # counts weighted by the type's frequency (equivalent to enumerating
    # occurrences — proven by test_bpe_train_histogram_vs_occurrences)
    seqs = [(list(w), int(f)) for w, f in hist]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, f in seqs:
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for s, _f in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [a + b]
                else:
                    i += 1
    rows = ",\n          ".join(
        f"(CAST({r} AS BIGINT), {_sql_quote(a)}, {_sql_quote(b)})"
        for r, (a, b) in enumerate(merges)
    )
    sql = f"""
        SELECT * FROM (VALUES {rows}) AS t(rank, "left", "right")
    """
    return _cache_put(_BPE_VALUES_CACHE, sf_dir, key, sql)


# ---------------------------------------------------------------------------
# approximate-ANN exact oracles (VERDICT r10 #2)
#
# The six "approximate" ANN gates are approximate only in RECALL — given
# the frozen, deterministic quantizers the engine trains (seed-quantile
# centroids, md5 hyperplanes, hash-ordered Lloyd codebooks), every one
# of them is a deterministic function of the corpus.  These oracles are
# the ``semindex_values_sql`` construction applied to search: the
# driver-side, non-SQL-expressible parts (quantizer training, bucket /
# probe selection, the ADC candidate pass) are replayed SEQUENTIALLY in
# python/numpy with the same IEEE-double arithmetic, and everything the
# CLUSTER executes — the clustered-corpus derivation, cluster
# assignment, candidate filtering, the exact rerank, top-k ordering and
# the recall@k column — is recomputed independently by duckdb from the
# parquet corpus.  Engine twins: ``pipeline/ann.py`` (lsh_bucketed_topk,
# ivf_topk, ivf_search_index, pq_topk, ivfpq_search_index); gate
# parameters pinned in ``__spark_entry__._q_ann_*``.

_ANN_REPLAY_CACHE: dict = {}
_ANN_SQL_CACHE: dict = {}

#: shared replay intermediates (cluster-assignment map, Lloyd
#: codebooks) memoized per corpus identity — three oracle builders need
#: the same artifacts and recomputing the duckdb argmax scan + training
#: per builder doubled oracle-build time (round-11 review); one entry
#: per sf_dir like every other oracle cache
_ANN_REPLAY_PARTS: dict = {}


def _replay_part(sf_dir: str, file_key: tuple, subkey: tuple, compute):
    entry = _ANN_REPLAY_PARTS.get(sf_dir)
    if entry is None or entry[0] != file_key:
        entry = (file_key, {})
        _ANN_REPLAY_PARTS[sf_dir] = entry
    parts = entry[1]
    if subkey not in parts:
        parts[subkey] = compute()
    return parts[subkey]

_XX_P1 = 0x9E3779B185EBCA87
_XX_P2 = 0xC2B2AE3D27D4EB4F
_XX_P3 = 0x165667B19E3779F9
_XX_P4 = 0x85EBCA77C2B2AE63
_XX_P5 = 0x27D4EB2F165667C5
_XX_M = (1 << 64) - 1


def _spark_xxhash64_long(v: int, seed: int = 42) -> int:
    """Spark's ``F.xxhash64`` over ONE LongType column (seed 42) —
    the xxHash64 single-8-byte-block path, returned SIGNED like Spark's
    LongType so sort order matches.  Replays the hash-ordered training
    sample of ``ann._hash_sample_vectors`` without a SparkSession
    (verified bit-exact against F.xxhash64 in tests/test_round11.py)."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _XX_M

    h = (seed + _XX_P5 + 8) & _XX_M
    k1 = rotl((v & _XX_M) * _XX_P2 & _XX_M, 31) * _XX_P1 & _XX_M
    h = (rotl(h ^ k1, 27) * _XX_P1 + _XX_P4) & _XX_M
    h ^= h >> 33
    h = (h * _XX_P2) & _XX_M
    h ^= h >> 29
    h = (h * _XX_P3) & _XX_M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _py_cosine(a, b) -> float:
    """The engine's own driver-side cosine (``ann._cosine_py``) — the
    probe/bucket ranking runs on the DRIVER in the engine too, so
    importing it is sharing the same frozen input, not weakening the
    oracle (round-11 review: a re-implementation could silently
    desynchronize if the engine arithmetic ever changed)."""
    from fastdb_spark.pipeline.ann import _cosine_py

    return _cosine_py(a, b)


def _ann_replay_corpus(
    sf_dir: str, n_centers: int = 25, spread: float = 0.1, dim: int = 64
):
    """(ids int64, ce float64 matrix) — ``pipeline.corpus.clustered_embs``
    replayed in numpy, bit-exact with both the Spark ``zip_with`` and the
    duckdb CTE (one multiply + one add per element, float32 parquet
    values widen exactly)."""
    import duckdb
    import numpy as np

    from fastdb_spark.pipeline.ann import _hyperplane

    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (n_centers, spread, dim, st.st_mtime_ns, st.st_size)
    cached = _cache_get(_ANN_REPLAY_CACHE, sf_dir, key)
    if cached is not None:
        return cached
    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    centers = np.array(
        [_hyperplane(1000 + c, dim) for c in range(n_centers)],
        dtype=np.float64,
    )
    ce = centers[ids % n_centers] + spread * emb
    out = (ids, ce)
    _cache_put(_ANN_REPLAY_CACHE, sf_dir, key, out)
    return out


def _seed_centroids_replay(ids, ce, k: int):
    """``ann._seed_training_vectors`` replayed on the clustered corpus:
    id-quantile probes -> first id at/after each probe -> vectors in id
    order.  Returns (centroid_matrix, centroid_ids)."""
    import numpy as np

    lo, hi = int(ids.min()), int(ids.max())
    probes = sorted({lo + (hi - lo) * i // max(1, k - 1) for i in range(k)})
    picked = sorted(
        {int(ids[ids >= p].min()) for p in probes if (ids >= p).any()}
    )
    if len(picked) < k:
        picked = sorted(ids.tolist())[:k]
    picked = picked[:k]
    pos = {int(v): i for i, v in enumerate(ids.tolist())}
    cents = np.array([ce[pos[v]] for v in picked], dtype=np.float64)
    return cents, picked


def _cents_values(cents) -> str:
    """Centroids as a duckdb VALUES literal (repr round-trips doubles)."""
    return ",\n          ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(x)) for x in c)
        )
        for i, c in enumerate(cents)
    )


def _ann_prefix(k: int, query_vec_id: int) -> str:
    """Shared CTE prefix: clustered corpus, query vector, exact top-k id
    set (the recall@k denominator — ``ann.cosine_topk``'s twin)."""
    cos6 = _COS.format(a="ce.cemb", b="q.qv")
    return f"""{_clustered_ctes()},
        q AS (SELECT cemb AS qv FROM ce WHERE vec_id = {query_vec_id}),
        exact AS (
          SELECT ce.vec_id FROM ce, q
          ORDER BY {cos6} DESC, ce.vec_id
          LIMIT {k})"""


def _ann_recall_tail(k: int) -> str:
    """Shared closer: recall@k = |appr ∩ exact| / k as a constant column
    (``ann.with_recall``'s twin — the window spans <= k rows)."""
    return f""",
        r AS (SELECT count(*) / {float(k)!r} AS rec
              FROM appr JOIN exact USING (vec_id))
        SELECT appr.vec_id, appr.cos, r.rec AS recall{k}
        FROM appr CROSS JOIN r
    """


def _ivf_asg_ctes(cents_sql: str) -> str:
    """Cluster-assignment CTEs over literal centroids: the round-9
    argmax twin of ``ann.with_ivf_cluster`` / the GEMM assignment
    (cosine DESC, centroid id ASC — the tie rule all engines share;
    gemm==expr membership is regression-pinned in tests/test_round10)."""
    cos9 = _COS.format(a="ce.cemb", b="cents.cv").replace(", 6)", ", 9)")
    return f""",
        cents(c, cv) AS (VALUES {cents_sql}),
        scored AS MATERIALIZED (
          SELECT ce.vec_id, ce.cemb, cents.c, {cos9} AS cosc
          FROM ce CROSS JOIN cents),
        asg AS MATERIALIZED (
          SELECT vec_id, cemb, c AS cluster FROM (
            SELECT *, row_number() OVER (
                        PARTITION BY vec_id
                        ORDER BY cosc DESC, c ASC) AS rk
            FROM scored)
          WHERE rk = 1)"""


def _qvec_of(ids, ce, query_vec_id: int) -> list:
    import numpy as np

    row = ce[ids == query_vec_id]
    if not len(row):
        raise ValueError(f"query vec_id {query_vec_id} not in corpus")
    return [float(x) for x in row[0]]


def ann_ivf_oracle_sql(
    n_clusters: int = 8,
    nprobe: int = 2,
    k: int = 10,
    query_vec_id: int = 0,
    sf_dir: str | None = None,
) -> str:
    """Exact oracle for ``ann_ivf_topk`` AND ``ann_ivf_index`` (identical
    parameters; the index gate persists the same deterministic seed
    quantizer ``build_ivf_index(strategy='seed')`` trains inline).
    Python replays only the driver-side parts — the seed-quantile
    centroid pick and the nprobe centroid ranking (``ann._cosine_py``
    order) — as literals; duckdb independently recomputes assignment
    (round-9 argmax twin), the probed-cluster candidate scan, the
    round-6 exact top-k, and recall@k."""
    sf_dir = _resolve_sf_dir(sf_dir)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (
        "ivf", n_clusters, nprobe, k, query_vec_id,
        st.st_mtime_ns, st.st_size,
    )
    cached = _cache_get(_ANN_SQL_CACHE, f"{sf_dir}|ivf", key)
    if cached is not None:
        return cached
    ids, ce = _ann_replay_corpus(sf_dir)
    cents, _ = _seed_centroids_replay(ids, ce, n_clusters)
    qvec = _qvec_of(ids, ce, query_vec_id)
    order = sorted(
        range(len(cents)),
        key=lambda i: (-_py_cosine(qvec, [float(x) for x in cents[i]]), i),
    )
    probes = ", ".join(str(c) for c in order[:nprobe])
    cos6 = _COS.format(a="a.cemb", b="q.qv")
    sql = f"""
        WITH {_ann_prefix(k, query_vec_id)}{_ivf_asg_ctes(_cents_values(cents))},
        appr AS (
          SELECT a.vec_id, {cos6} AS cos
          FROM asg a, q
          WHERE a.cluster IN ({probes})
          ORDER BY cos DESC, a.vec_id
          LIMIT {k}){_ann_recall_tail(k)}"""
    return _cache_put(_ANN_SQL_CACHE, f"{sf_dir}|ivf", key, sql)


def ann_lsh_oracle_sql(
    n_planes: int = 8,
    multiprobe_bits: int = 2,
    k: int = 10,
    query_vec_id: int = 0,
    dim: int = 64,
    sf_dir: str | None = None,
) -> str:
    """Exact oracle for ``ann_lsh_topk``: the md5 hyperplanes ride as
    VALUES literals and duckdb recomputes every vector's sign-bit bucket
    (``list_dot_product`` — the same sequential fold as the engine's
    ``zip_with`` dot); python replays only the query's bucket and the
    hamming<=m multiprobe flips (``ann.lsh_bucketed_topk``'s own
    driver-side arithmetic, including its ``_round9_py`` sign
    quantization — shared code, so the probe sets are identical by
    construction).

    Since round 12 the sign test rounds the dot at 9 on BOTH engines
    (ADVICE r11 #1): ``round(list_dot_product, 9) > 0`` here vs
    ``F.round(dot, 9) > 0`` in ``ann.with_lsh_bucket`` — a
    reassociation-order difference in duckdb's fold can no longer flip
    a last-ulp near-zero dot across the sign; the comparison now rests
    on the same round-9 cross-engine agreement as every assignment
    twin since round 9."""
    from itertools import combinations

    from fastdb_spark.pipeline.ann import _hyperplane, _round9_py

    sf_dir = _resolve_sf_dir(sf_dir)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (
        "lsh", n_planes, multiprobe_bits, k, query_vec_id, dim,
        st.st_mtime_ns, st.st_size,
    )
    cached = _cache_get(_ANN_SQL_CACHE, f"{sf_dir}|lsh", key)
    if cached is not None:
        return cached
    ids, ce = _ann_replay_corpus(sf_dir)
    qvec = _qvec_of(ids, ce, query_vec_id)
    qbucket = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        if _round9_py(sum(a * b for a, b in zip(qvec, plane))) > 0:
            qbucket |= 1 << p
    probe_set = [qbucket]
    for m in range(1, multiprobe_bits + 1):
        for bits in combinations(range(n_planes), m):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe_set.append(qbucket ^ flip)
    plane_rows = ",\n          ".join(
        "({}, [{}]::DOUBLE[])".format(
            1 << p, ", ".join(repr(x) for x in _hyperplane(p, dim))
        )
        for p in range(n_planes)
    )
    probes = ", ".join(str(b) for b in sorted(set(probe_set)))
    cos6 = _COS.format(a="ce.cemb", b="q.qv")
    sql = f"""
        WITH {_ann_prefix(k, query_vec_id)},
        planes(p2, pv) AS (VALUES {plane_rows}),
        bkt AS MATERIALIZED (
          SELECT ce.vec_id,
                 CAST(sum(CASE WHEN round(list_dot_product(ce.cemb, planes.pv), 9) > 0
                               THEN planes.p2 ELSE 0 END) AS INTEGER)
                   AS bucket
          FROM ce CROSS JOIN planes
          GROUP BY ce.vec_id),
        appr AS (
          SELECT ce.vec_id, {cos6} AS cos
          FROM ce JOIN bkt USING (vec_id) CROSS JOIN q
          WHERE bkt.bucket IN ({probes})
          ORDER BY cos DESC, ce.vec_id
          LIMIT {k}){_ann_recall_tail(k)}"""
    return _cache_put(_ANN_SQL_CACHE, f"{sf_dir}|lsh", key, sql)


def _pq_training_mat(ids, ce, n_train: int):
    """``ann._hash_sample_vectors`` replayed: the ``n_train`` corpus rows
    with the smallest (xxhash64(id), id), IN THAT ORDER (Lloyd k-means
    inits from evenly-spaced rows of this matrix, so order matters),
    L2-normalized like ``ann.train_pq``/``train_pq_residual``."""
    import numpy as np

    order = sorted(
        ids.tolist(), key=lambda v: (_spark_xxhash64_long(int(v)), v)
    )[:n_train]
    pos = {int(v): i for i, v in enumerate(ids.tolist())}
    mat = np.array([ce[pos[v]] for v in order], dtype=np.float64)
    return mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
    )


def _pq_encode(vecs, books) -> "list":
    """``ann.encode_pq``'s per-row argmin replayed in numpy (row-wise —
    the engine's Arrow batching cannot change it): codes[i] = argmin
    over codebook entries of the subspace squared distance, first-min
    tie like np.argmin."""
    import numpy as np

    m = len(books)
    sub = len(books[0][0])
    bnp = [np.array(b, dtype=np.float64) for b in books]
    codes = np.empty((len(vecs), m), dtype=np.int64)
    for i in range(m):
        seg = vecs[:, i * sub : (i + 1) * sub]
        d2 = ((seg[:, None, :] - bnp[i][None, :, :]) ** 2).sum(axis=2)
        codes[:, i] = d2.argmin(axis=1)
    return codes


def _adc_lut(q: list, books) -> list:
    """The engine's broadcast ADC lookup table, verbatim python floats:
    lut[i*K + j] = <q_subvector_i, codebook[i][j]> (sequential sum)."""
    m = len(books)
    kk = len(books[0])
    sub = len(books[0][0])
    return [
        sum(q[i * sub + t] * books[i][j][t] for t in range(sub))
        for i in range(m)
        for j in range(kk)
    ]


def _adc_rank(cand_ids, codes, lut: list, kk: int, rerank: int, offsets=None):
    """The ADC candidate pass replayed with the engine's fold arithmetic
    (acc = 0.0; acc += lut[i*K + code], left to right; optional per-row
    q·c offset added LAST like the residual search's column expression),
    then top-``rerank`` by (score DESC, id ASC)."""
    m = len(codes[0]) if len(codes) else 0
    scored = []
    for row_idx, vid in enumerate(cand_ids):
        acc = 0.0
        for i in range(m):
            acc += lut[i * kk + int(codes[row_idx][i])]
        if offsets is not None:
            acc = offsets[row_idx] + acc
        scored.append((vid, acc))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [int(v) for v, _ in scored[:rerank]]


def _rerank_appr_sql(cand_ids, k: int) -> str:
    """The exact-rerank + top-k half, fully in SQL: round-6 cosine over
    the ORIGINAL stored vectors of the ADC survivors."""
    cos6 = _COS.format(a="ce.cemb", b="q.qv")
    ids_csv = ", ".join(str(v) for v in sorted(cand_ids))
    return f"""
        appr AS (
          SELECT ce.vec_id, {cos6} AS cos
          FROM ce, q
          WHERE ce.vec_id IN ({ids_csv})
          ORDER BY cos DESC, ce.vec_id
          LIMIT {k})"""


def _norm_q(query_vec: list) -> list:
    """``ann.pq_topk``/``ivfpq_search_index``'s query normalization,
    verbatim (python-float sqrt of a sequential sum)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    return [x / qn for x in query_vec]


def _ivf_cluster_map(sf_dir: str, cents) -> dict:
    """vec_id -> cluster from duckdb's round-9 argmax twin (the stored
    assignment; gemm==expr membership is regression-pinned)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    asg_rows = con.execute(
        f"WITH {_clustered_ctes()}{_ivf_asg_ctes(_cents_values(cents))} "
        "SELECT vec_id, cluster FROM asg"
    ).fetchall()
    return {int(v): int(c) for v, c in asg_rows}


def _pq_books_replay(ids, ce, cn, m: int, pq_k: int, residual: bool):
    """``ann.train_pq``/``train_pq_residual`` replayed: hash-ordered
    training matrix -> (residual vs raw) -> per-subspace Lloyd."""
    from fastdb_spark.pipeline.ann import _pq_codebooks_from

    n_train = max(pq_k, min(32 * pq_k, 2048))
    mat = _pq_training_mat(ids, ce, n_train)
    if residual:
        tr_assign = (mat @ cn.T).argmax(axis=1)
        return _pq_codebooks_from(mat - cn[tr_assign], m, pq_k)
    return _pq_codebooks_from(mat, m, pq_k)


def ann_pq_oracle_sql(
    m: int = 8,
    pq_k: int = 16,
    rerank: int = 50,
    k: int = 10,
    query_vec_id: int = 0,
    sf_dir: str | None = None,
) -> str:
    """Exact oracle for ``ann_pq_topk`` (``train_pq`` + ``encode_pq`` +
    ``pq_topk(rerank=50)``): python/numpy replays the driver-side
    deterministic training (hash-ordered Lloyd — the engine's own
    ``_pq_codebooks_from`` fit, a frozen quantizer input exactly like
    the persisted-codebook readback VERDICT r10 proposed) and the ADC
    candidate pass; duckdb independently recomputes the corpus, the
    exact rerank, top-k and recall@k."""
    import numpy as np

    from fastdb_spark.pipeline.ann import _pq_codebooks_from

    sf_dir = _resolve_sf_dir(sf_dir)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (
        "pq", m, pq_k, rerank, k, query_vec_id, st.st_mtime_ns, st.st_size,
    )
    cached = _cache_get(_ANN_SQL_CACHE, f"{sf_dir}|pq", key)
    if cached is not None:
        return cached
    ids, ce = _ann_replay_corpus(sf_dir)
    books = _replay_part(
        sf_dir, (st.st_mtime_ns, st.st_size), ("books_flat", m, pq_k),
        lambda: _pq_books_replay(ids, ce, None, m, pq_k, False),
    )
    vn = ce / np.maximum(np.linalg.norm(ce, axis=1, keepdims=True), 1e-30)
    codes = _pq_encode(vn, books)
    q = _norm_q(_qvec_of(ids, ce, query_vec_id))
    cand = _adc_rank(
        ids.tolist(), codes, _adc_lut(q, books), pq_k, rerank
    )
    sql = f"""
        WITH {_ann_prefix(k, query_vec_id)},{_rerank_appr_sql(cand, k)}{_ann_recall_tail(k)}"""
    return _cache_put(_ANN_SQL_CACHE, f"{sf_dir}|pq", key, sql)


def ann_ivfpq_oracle_sql(
    residual: bool,
    n_clusters: int = 8,
    nprobe: int = 3,
    m: int = 8,
    pq_k: int = 16,
    rerank: int = 50,
    k: int = 10,
    query_vec_id: int = 0,
    sf_dir: str | None = None,
) -> str:
    """Exact oracle for ``ann_ivfpq_topk`` (residual=False) and
    ``ann_ivfpq_res_topk`` (residual=True) — the persisted
    ``build_ivf_index(pq_m=8, strategy='seed')`` layout probed by
    ``ivfpq_search_index(nprobe=3, rerank=50)``.

    Replay split: the seed centroids, hash-ordered Lloyd codebooks,
    centroid ranking, q·c offsets and the ADC candidate pass are
    python/numpy (driver-side deterministic quantities — the engine
    itself computes the LUT and offsets on the driver); the cluster
    ASSIGNMENT that defines the probed candidate set is fetched from
    duckdb's round-9 argmax twin (gemm==expr membership is
    regression-pinned), and the exact rerank / top-k / recall@k are
    recomputed by duckdb from the parquet corpus."""
    import math

    import duckdb
    import numpy as np

    from fastdb_spark.pipeline.ann import _pq_codebooks_from

    sf_dir = _resolve_sf_dir(sf_dir)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    tag = "ivfpq_res" if residual else "ivfpq"
    key = (
        tag, n_clusters, nprobe, m, pq_k, rerank, k, query_vec_id,
        st.st_mtime_ns, st.st_size,
    )
    cached = _cache_get(_ANN_SQL_CACHE, f"{sf_dir}|{tag}", key)
    if cached is not None:
        return cached
    ids, ce = _ann_replay_corpus(sf_dir)
    cents, _ = _seed_centroids_replay(ids, ce, n_clusters)
    cents_list = [[float(x) for x in c] for c in cents]
    qraw = _qvec_of(ids, ce, query_vec_id)
    order = sorted(
        range(len(cents_list)),
        key=lambda i: (-_py_cosine(qraw, cents_list[i]), i),
    )
    probes = order[:nprobe]

    file_key = (st.st_mtime_ns, st.st_size)
    cluster_of = _replay_part(
        sf_dir, file_key, ("cluster_of", n_clusters),
        lambda: _ivf_cluster_map(sf_dir, cents),
    )
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-30
    )
    books = _replay_part(
        sf_dir, file_key, ("books", n_clusters, m, pq_k, residual),
        lambda: _pq_books_replay(ids, ce, cn, m, pq_k, residual),
    )

    # candidate rows = probed clusters only (the engine's partition
    # pruning), encoded exactly like the stored pq_code column
    probe_set = set(probes)
    sel = [i for i, v in enumerate(ids.tolist()) if cluster_of[v] in probe_set]
    cand_ids = [int(ids[i]) for i in sel]
    vn = ce[sel] / np.maximum(
        np.linalg.norm(ce[sel], axis=1, keepdims=True), 1e-30
    )
    if residual:
        assign_vec = np.array([cluster_of[v] for v in cand_ids], dtype=np.int64)
        codes = _pq_encode(vn - cn[assign_vec], books)
    else:
        codes = _pq_encode(vn, books)

    q = _norm_q(qraw)
    offsets = None
    if residual:
        qc = {}
        for c in probes:
            cnorm = math.sqrt(sum(x * x for x in cents_list[c])) or 1.0
            qc[int(c)] = float(
                sum(q[t] * cents_list[c][t] for t in range(len(q))) / cnorm
            )
        offsets = [qc[cluster_of[v]] for v in cand_ids]
    cand = _adc_rank(cand_ids, codes, _adc_lut(q, books), pq_k, rerank, offsets)
    sql = f"""
        WITH {_ann_prefix(k, query_vec_id)},{_rerank_appr_sql(cand, k)}{_ann_recall_tail(k)}"""
    return _cache_put(_ANN_SQL_CACHE, f"{sf_dir}|{tag}", key, sql)


def ann_ivfpq_batch_oracle_sql(
    n_queries: int = 5,
    residual: bool = False,
    n_clusters: int = 8,
    nprobe: int = 3,
    m: int = 8,
    pq_k: int = 16,
    rerank: int = 50,
    k: int = 5,
    sf_dir: str | None = None,
) -> str:
    """Exact oracle for ``ann_ivfpq_batch`` — the BATCHED persisted-index
    probe (``ann.ivfpq_search_index_many``: one pass over the union of
    probed partitions for a whole query batch, the query-service shape).

    Same replay split as :func:`ann_ivfpq_oracle_sql`, per query: the
    engine computes each query's LUT, probes and offsets on the driver,
    so the oracle replays them in python; the per-query exact rerank,
    rank-window top-k and the (query_id, vec_id, cos) output are
    recomputed independently by duckdb."""
    import math

    import duckdb
    import numpy as np

    from fastdb_spark.pipeline.ann import _pq_codebooks_from

    sf_dir = _resolve_sf_dir(sf_dir)
    st = _corpus_stat(sf_dir, "embeddings.parquet")
    key = (
        "ivfpq_batch", n_queries, residual, n_clusters, nprobe, m, pq_k,
        rerank, k, st.st_mtime_ns, st.st_size,
    )
    cached = _cache_get(_ANN_SQL_CACHE, f"{sf_dir}|ivfpq_batch", key)
    if cached is not None:
        return cached
    ids, ce = _ann_replay_corpus(sf_dir)
    cents, _ = _seed_centroids_replay(ids, ce, n_clusters)
    cents_list = [[float(x) for x in c] for c in cents]

    file_key = (st.st_mtime_ns, st.st_size)
    cluster_of = _replay_part(
        sf_dir, file_key, ("cluster_of", n_clusters),
        lambda: _ivf_cluster_map(sf_dir, cents),
    )
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-30
    )
    books = _replay_part(
        sf_dir, file_key, ("books", n_clusters, m, pq_k, residual),
        lambda: _pq_books_replay(ids, ce, cn, m, pq_k, residual),
    )

    # stored codes for the whole corpus (encoded once at build time)
    vn = ce / np.maximum(np.linalg.norm(ce, axis=1, keepdims=True), 1e-30)
    if residual:
        assign_all = np.array(
            [cluster_of[int(v)] for v in ids.tolist()], dtype=np.int64
        )
        codes_all = _pq_encode(vn - cn[assign_all], books)
    else:
        codes_all = _pq_encode(vn, books)
    code_row = {int(v): codes_all[i] for i, v in enumerate(ids.tolist())}

    cand_rows = []
    for qi in range(n_queries):
        qraw = _qvec_of(ids, ce, qi)
        order = sorted(
            range(len(cents_list)),
            key=lambda i: (-_py_cosine(qraw, cents_list[i]), i),
        )
        probes = order[:nprobe]
        probe_set = set(probes)
        cand_ids = [int(v) for v in ids.tolist() if cluster_of[v] in probe_set]
        codes = [code_row[v] for v in cand_ids]
        q = _norm_q(qraw)
        offsets = None
        if residual:
            qc = {}
            for c in probes:
                cnorm = math.sqrt(sum(x * x for x in cents_list[c])) or 1.0
                qc[int(c)] = float(
                    sum(q[t] * cents_list[c][t] for t in range(len(q)))
                    / cnorm
                )
            offsets = [qc[cluster_of[v]] for v in cand_ids]
        top = _adc_rank(
            cand_ids, codes, _adc_lut(q, books), pq_k, rerank, offsets
        )
        cand_rows.extend((qi, v) for v in top)

    cand_values = ",\n          ".join(
        f"('{qi}', {v})" for qi, v in cand_rows
    )
    cos6 = _COS.format(a="ce.cemb", b="qv.qvec")
    sql = f"""
        WITH {_clustered_ctes()},
        cand(query_id, vec_id) AS (VALUES {cand_values}),
        qv AS (SELECT CAST(vec_id AS VARCHAR) AS query_id, cemb AS qvec
               FROM ce WHERE vec_id < {n_queries}),
        scored AS (
          SELECT cand.query_id, ce.vec_id, {cos6} AS cos
          FROM cand
          JOIN ce USING (vec_id)
          JOIN qv ON qv.query_id = cand.query_id)
        SELECT query_id, vec_id, cos FROM (
          SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rk
          FROM scored)
        WHERE rk <= {k}
    """
    return _cache_put(_ANN_SQL_CACHE, f"{sf_dir}|ivfpq_batch", key, sql)
