"""Bounded time-interval (range) join — alert "previous sources" semantics.

The reference reconstructs alerts by attaching, to each detection, the
object's previous sources within ``[t-365, t)`` and previous forced
photometry within ``[t-365, t-1)`` (reference
``src/services/projectsim.py:174-212``; SURVEY.md J9).

Spark has no native range join; the scalable shape is an equi-join on the
entity key (diaobjectid — bounded history per object) with the time band
as a join-condition filter.  Catalyst executes it as a sort-merge join on
the key; the band predicate prunes during the merge.  For key-less range
joins, bucketize time into ``window_days``-wide bins and explode the probe
side into adjacent bins (same zones trick as spatial).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attach_history(
    probe: DataFrame,
    history: DataFrame,
    key: str,
    time_col: str,
    lookback: float | None,
    gap: float = 0.0,
    agg_exprs: list[Column] | None = None,
    probe_time_alias: str = "_t_probe",
) -> DataFrame:
    """For each probe row, aggregate history rows of the same ``key`` with
    ``history.time in [probe.time - lookback, probe.time - gap)``
    (``lookback=None`` -> unbounded lower edge).

    Returns the probe columns + the aggregates (default: ``n_prev`` count).
    The join is equi on ``key`` -> one shuffle each side, partition-local
    band filtering; aggregation is keyed by the probe row identity.
    """
    p = probe.select(
        F.col(key).alias("_k_probe"),
        F.col(time_col).alias(probe_time_alias),
        F.struct(*[F.col(c) for c in probe.columns]).alias("_probe_row"),
    )
    h = history.select(
        F.col(key).alias("_k_hist"),
        F.col(time_col).alias("_t_hist"),
        F.struct(*[F.col(c) for c in history.columns]).alias("_hist_row"),
    )
    t, th = F.col(probe_time_alias), F.col("_t_hist")
    # band predicate must live IN the join condition: a post-join filter
    # would drop probes whose matches all fall outside the window, whereas
    # LEFT JOIN ... ON band keeps them with zero history rows
    cond = (F.col("_k_probe") == F.col("_k_hist")) & (th < t - gap)
    if lookback is not None:
        cond = cond & (th >= t - lookback)
    joined = p.join(h, on=cond, how="left")
    if agg_exprs is None:
        agg_exprs = [
            F.count(F.col("_t_hist")).alias("n_prev"),
        ]
    out = joined.groupBy("_k_probe", probe_time_alias, "_probe_row").agg(*agg_exprs)
    return out.select(
        "_probe_row.*",
        *[
            c
            for c in out.columns
            if c not in ("_k_probe", probe_time_alias, "_probe_row")
        ],
    )


def asof_latest(
    probe: DataFrame,
    history: DataFrame,
    key: str,
    time_col: str,
    payload_cols: list[str],
    gap: float = 0.0,
    lookback: float | None = None,
    tiebreak: list[str] | None = None,
    out_prefix: str = "prev_",
) -> DataFrame:
    """As-of join: attach to each probe row the LATEST history row of the
    same ``key`` with ``history.time < probe.time - gap`` (e.g. the last
    pre-discovery forced-photometry point).  Spark has no native ASOF
    JOIN; the scalable shape is the key-equi range join + a ``max_by``
    argmax per probe row — one shuffle per side, no window over the raw
    join product.  ``tiebreak`` columns order equal-time history rows
    deterministically.  Probes with no history keep NULL payloads
    (left-join semantics).  Bound ``lookback`` at scale so the merge scan
    stays banded."""
    order_cols = [F.col("_t_hist")] + [
        F.col(f"_hist_row.{c}") for c in (tiebreak or [])
    ]
    point = F.struct(*[F.col(f"_hist_row.{c}") for c in payload_cols])
    agg = [
        F.max_by(point, F.struct(*order_cols)).alias("_prev"),
    ]
    out = attach_history(
        probe, history, key, time_col, lookback, gap, agg_exprs=agg
    )
    return out.select(
        *[c for c in out.columns if c != "_prev"],
        *[
            F.col(f"_prev.{c}").alias(f"{out_prefix}{c}")
            for c in payload_cols
        ],
    )


def collect_history_structs(
    probe: DataFrame,
    history: DataFrame,
    key: str,
    time_col: str,
    lookback: float,
    gap: float,
    struct_cols: list[str],
    out_col: str = "prv",
) -> DataFrame:
    """Alert-reconstruction variant: attach the sorted array of previous
    history structs (reference builds ``prvDiaSources`` arrays this way)."""
    point = F.struct(*[F.col(f"_hist_row.{c}") for c in struct_cols])
    agg = [
        F.array_sort(
            F.collect_list(
                F.when(F.col("_t_hist").isNotNull(), point)
            )
        ).alias(out_col)
    ]
    return attach_history(
        probe, history, key, time_col, lookback, gap, agg_exprs=agg
    )
