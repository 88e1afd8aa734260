"""Deterministic stratified sampling — dataset-mixing for training corpora.

A 100 TB training pipeline downsamples per stratum (language, source,
quality bucket) to hit a target mixture.  ``df.sampleBy`` does that with
RNG state — irreproducible across runs/engines and not joinable with an
oracle.  This operator derives a uniform in [0, 1) from md5 of the row id
plus a salt: the SAME rows are kept on every engine, every run, and the
decision is a pure column expression (no shuffle, fully pushed into the
scan stage; changing the mixture re-reads, never re-shuffles).

Spark shape: the per-stratum rate rides along as a broadcast map literal
(``F.create_map``), the keep decision is ``u < rate[stratum]`` — a scan-
stage filter.  Rejection-free, exact in expectation, and deterministic:
re-running a failed job selects the identical sample (same idempotency
trick as the ingest root ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — the md5-prefix uniform's denominator
_DENOM = 4294967296.0


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from md5(salt || id): first 8 hex
    chars -> 32-bit int -> /2^32.  Identical arithmetic is expressible in
    ANSI SQL, so sampling decisions are oracle-checkable."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)


def hash_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``fractions``: stratum value -> keep rate in [0, 1]; strata not listed
    keep ``default_fraction``.  The id must be unique per row (the uniform
    is a pure function of it)."""
    pairs: list[Column] = []
    for k, v in sorted(fractions.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(stratum_col)], F.lit(float(default_fraction))
    )
    return df.filter(hash_uniform(F.col(id_col), salt) < rate)


def domain_mix_sample(
    df: DataFrame,
    stratum_col: str,
    shares: dict[str, float],
    budget_frac: float,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Downsample toward a TARGET MIXTURE: each stratum's keep rate is
    derived from its actual row count so the output approximates
    ``budget_frac`` of the corpus split per ``shares`` (dataset-mixing /
    domain-rebalancing for training corpora — over-represented strata
    get downsampled, rare strata keep everything).

    rate(s) = min(1, shares[s] * budget_frac * N_total / N_s), applied
    with the same deterministic md5 uniform as
    ``hash_stratified_sample`` — exact, reproducible, oracle-checkable.

    Shape: one global count + one per-stratum count (both map-side
    combined), the tiny rate table broadcast back onto the scan — the
    sampling decision itself never shuffles the corpus.
    """
    tot = df.agg(F.count(F.lit(1)).alias("_n_total"))
    cnts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n_stratum"))
    pairs: list[Column] = []
    for k, v in sorted(shares.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    share = F.coalesce(F.create_map(*pairs)[F.col(stratum_col)], F.lit(0.0))
    rates = cnts.crossJoin(tot).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            share
            * F.lit(float(budget_frac))
            * F.col("_n_total")
            / F.col("_n_stratum"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_uniform(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def epoch_mix_materialize(
    df: DataFrame,
    stratum_col: str,
    epochs: dict[str, float],
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """UPsampling counterpart of :func:`domain_mix_sample`: materialize
    fractional EPOCHS per stratum — the public-literature mixing recipe
    where e.g. wiki runs 2.4 epochs while web runs 0.9 (rare, high-value
    domains repeat; bulk domains subsample, both in ONE operator).

    Each row emits ``floor(e)`` copies plus one more with probability
    ``frac(e)``, decided by the deterministic md5 uniform — exact in
    expectation, reproducible, oracle-checkable.  The output carries an
    ``epoch`` copy index (0-based) making the repetition explicit, so a
    downstream :func:`~fastdb_spark.pipeline.shards.shuffle_to_shards`
    over ``(id, epoch)`` spreads copies apart.  Strata absent from
    ``epochs`` emit zero copies.

    Scale shape: a broadcast map literal + ``explode(sequence(...))`` —
    pure scan-stage expressions, zero shuffle; output size is exactly
    the token-weighted mixture the trainer consumes.
    """
    pairs: list[Column] = []
    for k, v in sorted(epochs.items()):
        if float(v) < 0:
            raise ValueError(f"epochs[{k!r}] must be >= 0 (got {v!r})")
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    e = F.coalesce(F.create_map(*pairs)[F.col(stratum_col)], F.lit(0.0))
    n = (
        F.floor(e)
        + (hash_uniform(F.col(id_col), salt) < (e - F.floor(e))).cast("long")
    ).cast("long")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)  # sequence(0,-1) would step backwards
        .withColumn(
            "epoch",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_n") - F.lit(1))
            ),
        )
        .drop("_n")
    )


def epoch_mix_oracle_sql(
    table: str,
    stratum_col: str,
    epochs: dict[str, float],
    id_col: str,
    salt: str = "",
    select_cols: str = "*",
) -> str:
    """duckdb twin of :func:`epoch_mix_materialize` — identical CASE
    epoch table, md5 uniform, and copy-index enumeration.  The internal
    ``_em_ep`` helper column is projected away in every branch, so the
    output columns are exactly ``select_cols`` + ``epoch`` — matching the
    materializer's schema under the default ``select_cols='*'`` too
    (ADVICE r5: the previous shape leaked ``ep`` into ``SELECT *``)."""
    cases = " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(epochs.items())
    )
    u = (
        f"('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT / {_DENOM!r}"
    )
    star = select_cols.strip() == "*"
    outer = "* EXCLUDE (_em_ep, n_copies)" if star else select_cols
    inner = "*" if star else f"{select_cols}, _em_ep"
    return f"""
        WITH e AS (
          SELECT {inner},
                 CAST(floor(_em_ep) AS BIGINT)
                 + CASE WHEN {u} < _em_ep - floor(_em_ep) THEN 1 ELSE 0 END
                   AS n_copies
          FROM (SELECT *, CASE {stratum_col} {cases} ELSE 0.0 END AS _em_ep
                FROM {table}))
        SELECT {outer},
               unnest(generate_series(0, n_copies - 1)) AS epoch
        FROM e WHERE n_copies > 0
    """


def temperature_mix_shares(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
) -> dict[str, float]:
    """Target mixture DERIVED from the corpus by temperature sampling
    (the multilingual-pretraining rebalance, public literature: sample
    stratum s with probability ``p_s^alpha / sum(p^alpha)`` where ``p_s``
    is its empirical share).  ``alpha=1`` keeps the natural mixture,
    ``alpha=0`` is uniform, the conventional 0.3 lifts rare strata
    without drowning common ones.

    One map-side-combined count aggregate; the returned dict (one entry
    per stratum — bounded by domain cardinality, not corpus size) feeds
    :func:`domain_mix_sample` directly::

        shares = temperature_mix_shares(docs, "lang", alpha=0.3)
        mixed = domain_mix_sample(docs, "lang", shares, 0.5, "doc_id")
    """
    rows = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    if not rows:
        return {}
    total = float(sum(r["n"] for r in rows))
    weights = {r[stratum_col]: (r["n"] / total) ** alpha for r in rows}
    z = sum(weights.values())
    return {k: w / z for k, w in sorted(weights.items())}


def epochs_from_shares(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    total_epochs: float = 1.0,
    max_epochs: float | None = None,
) -> dict[str, float]:
    """Per-stratum EPOCH counts realizing ``target_shares`` of the output
    mixture at an overall budget of ``total_epochs`` corpus passes — the
    bridge from a target mixture (hand-written, or
    :func:`temperature_mix_shares`) to :func:`epoch_mix_materialize`.

    With natural share ``p_s`` and target share ``t_s``, stratum ``s``
    needs ``e_s = total_epochs * t_s / p_s`` epochs: the materialized
    output then contains ``total_epochs * t_s * N`` rows of ``s`` —
    exactly the target proportion.  Rare strata get ``e_s > 1``
    (repetition), bulk strata ``e_s < 1`` (subsampling), in ONE
    consistent recipe::

        shares = temperature_mix_shares(docs, "lang", alpha=0.3)
        epochs = epochs_from_shares(docs, "lang", shares, total_epochs=1.0)
        mixed  = epoch_mix_materialize(docs, "lang", epochs, "doc_id")

    ``max_epochs`` caps repetition (public data-constrained-scaling
    guidance: value decays after ~4 reuses); capped strata emit fewer
    rows than their target share, which the caller can renormalize or
    accept.  One count aggregate (map-side combined); the returned dict
    is bounded by stratum cardinality.  Strata absent from
    ``target_shares`` get 0.0 epochs (dropped by the materializer);
    target strata absent from the corpus are ignored."""
    if total_epochs < 0:
        raise ValueError(f"total_epochs must be >= 0 (got {total_epochs!r})")
    rows = df.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
    total = float(sum(r["n"] for r in rows))
    out: dict[str, float] = {}
    for r in rows:
        k = r[stratum_col]
        if k not in target_shares:
            out[k] = 0.0
            continue
        p = r["n"] / total
        e = total_epochs * float(target_shares[k]) / p
        if max_epochs is not None:
            e = min(e, float(max_epochs))
        out[k] = e
    # NULL stratum values arrive as a None key from the groupBy — sort
    # None-safe (they get 0.0 epochs unless explicitly targeted, and a
    # None key cannot be a map key in epoch_mix_materialize anyway)
    return dict(sorted(out.items(), key=lambda kv: (kv[0] is None, kv[0])))


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: Column | str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Train/val/test assignment that cannot leak duplicated content
    across splits: the uniform is drawn from a GROUP key — by default the
    document's content fingerprint — so byte-identical documents (or all
    members of a near-dup cluster, if ``group_col`` carries
    ``dup_cluster_labels`` output) always land in the same split.

    Hashing the row id instead (the naive split) puts two copies of the
    same document in train and test with probability 2·p·(1-p) each —
    the classic eval-contamination bug this operator exists to prevent.

    ``weights`` maps split name -> share and MUST sum to ~1 (validated —
    weights summing past 1 would silently starve the later splits);
    interval assignment follows **sorted split names**, so e.g.
    ``{"train": .8, "test": .1, "val": .1}`` lays out test|train|val on
    the unit interval regardless of dict insertion order.  Assignment is
    by cumulative-interval lookup on the md5 uniform, so it is a pure
    scan-stage expression: no shuffle, deterministic, oracle-checkable.
    Returns the frame with a ``split`` column appended.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(float(v) for v in weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(
            f"split weights must sum to 1 (got {total!r}); normalize them "
            "before calling leakage_safe_split"
        )
    if group_col is None:
        from fastdb_spark.functions.text import doc_fingerprint

        key = doc_fingerprint(F.col(text_col)).cast("string")
    else:
        key = (
            F.col(group_col) if isinstance(group_col, str) else group_col
        ).cast("string")
    u = hash_uniform(key, salt)
    expr: Column | None = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += float(weights[name])
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def split_oracle_sql(
    table: str,
    weights: dict[str, float],
    group_sql: str,
    salt: str = "",
    select_cols: str = "*",
) -> str:
    """duckdb twin of :func:`leakage_safe_split` (``group_sql`` is the
    SQL expression for the group key, e.g. the fingerprint expression)."""
    u = (
        f"('0x' || substr(md5('{salt}' || CAST({group_sql} AS VARCHAR)), 1, 8))"
        f"::BIGINT / {_DENOM!r}"
    )
    names = sorted(weights)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += float(weights[name])
        whens.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    case = " ".join(whens)
    return f"""
        SELECT {select_cols},
               CASE {case} ELSE '{names[-1]}' END AS split
        FROM {table}
    """


def domain_mix_oracle_sql(
    table: str,
    stratum_col: str,
    shares: dict[str, float],
    budget_frac: float,
    id_col: str,
    salt: str = "",
    select_cols: str = "*",
) -> str:
    """duckdb twin of ``domain_mix_sample`` — identical rate arithmetic
    (left-associated share * budget * total / stratum) and md5 uniform."""
    cases = " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(shares.items())
    )
    return f"""
        WITH tot AS (SELECT count(*) AS n_total FROM {table}),
        cnts AS (SELECT {stratum_col}, count(*) AS n_stratum
                 FROM {table} GROUP BY {stratum_col}),
        rates AS (SELECT {stratum_col},
                         least(1.0,
                               (CASE {stratum_col} {cases} ELSE 0.0 END)
                               * {float(budget_frac)!r} * n_total / n_stratum)
                           AS rate
                  FROM cnts, tot)
        SELECT {select_cols} FROM {table} d
        JOIN rates r USING ({stratum_col})
        WHERE ('0x' || substr(md5('{salt}' || CAST(d.{id_col} AS VARCHAR)), 1, 8))
                ::BIGINT / {_DENOM!r}
              < r.rate
    """


def sample_oracle_sql(
    table: str,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> str:
    """The duckdb twin of ``hash_stratified_sample`` (same md5 prefix
    arithmetic, same CASE rates)."""
    cases = " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(fractions.items())
    )
    return f"""
        SELECT * FROM {table}
        WHERE ('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))
                ::BIGINT / {_DENOM!r}
              < (CASE {stratum_col} {cases} ELSE {float(default_fraction)!r} END)
    """
