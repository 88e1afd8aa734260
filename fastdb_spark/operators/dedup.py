"""Argmax-per-group deduplication — THE core operator of the engine.

The reference expresses this as Postgres ``SELECT DISTINCT ON (keys...)
... ORDER BY keys..., pv.priority DESC`` in nearly every query (reference
``src/ltcv.py:645-669``, ``src/parquet_export.py:63-71``,
``src/webserver/server.py:149-169``; SURVEY.md A1/A2/W2): given several
versions of the same logical row (one per base processing version), return
exactly one row per logical key — the one from the highest-priority version.

Spark design — two physical strategies:

``agg`` (default)
    ``groupBy(keys).agg(max_by(struct(<all columns>), struct(<order>)))``.
    A hash aggregate with **map-side partial aggregation**: each input
    partition reduces to at most one candidate row per key before the
    shuffle, so shuffle volume is bounded by the number of *distinct keys*,
    not the number of input rows.  With ~5 base versions per logical row at
    100 TB this cuts shuffled bytes ~5x vs. a window, and avoids the
    window's full partition sort.

``window``
    ``row_number() over (partition by keys order by <order> desc) = 1``.
    Shuffles + sorts every input row.  Kept for cases where the ordering
    columns can be NULL (``max_by`` skips rows whose ordering value is
    NULL, matching SQL ``MAX`` semantics; ``DISTINCT ON`` would keep them).

``narrow``
    Aggregate only (keys + ordering columns) to find each key's winning
    ordering tuple, then join back to fetch the payload.  The wide rows
    never enter an aggregate buffer or sort — at 100 TB with 30-column
    photometry rows this trades one extra (self-)join for shuffling the
    full payload through a SortAggregate.  Requires ordering columns to be
    plain column names and (keys + order) to identify rows uniquely.

Ties: callers must pass a total order (append a unique id as the last
ordering column) — Postgres ``DISTINCT ON`` with a non-total order is
nondeterministic too, but our tests demand determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering_struct(order_by: Sequence[str | Column]) -> Column:
    # struct comparison is lexicographic, exactly what multi-key ORDER BY
    # does; positional aliases allow repeated/expression ordering columns
    cols = [
        (F.col(c) if isinstance(c, str) else c).alias(f"_o{i}")
        for i, c in enumerate(order_by)
    ]
    return F.struct(*cols)


def dedup_top_priority(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    strategy: str = "agg",
) -> DataFrame:
    """One row per ``keys``, taking the row with the LARGEST ``order_by``
    (lexicographic over the sequence).

    Equivalent to Postgres ``DISTINCT ON (keys) ... ORDER BY keys,
    o1 DESC, o2 DESC, ...`` (reference ``src/ltcv.py:645-669``).
    """
    if strategy == "agg":
        payload = F.struct(*[F.col(c) for c in df.columns])
        best = df.groupBy(*keys).agg(
            F.max_by(payload, _ordering_struct(order_by)).alias("_best")
        )
        return best.select("_best.*")
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(
            *[
                (F.col(c) if isinstance(c, str) else c).desc()
                for c in order_by
            ]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "narrow":
        names = [c for c in order_by if isinstance(c, str)]
        if len(names) != len(order_by):
            raise ValueError("narrow strategy needs plain column names")
        winners = df.select(*keys, *names).groupBy(*keys).agg(
            F.max(_ordering_struct(names)).alias("_w")
        )
        winners = winners.select(
            *keys, *[F.col(f"_w._o{i}").alias(n) for i, n in enumerate(names)]
        )
        return df.join(winners, on=[*keys, *names], how="left_semi")
    raise ValueError(f"unknown strategy {strategy!r}")


def dedup_first_seen(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    strategy: str = "agg",
) -> DataFrame:
    """One row per ``keys``, taking the SMALLEST ``order_by`` — first-seen
    wins.

    Mirrors the reference's Mongo staged-read dedup (``$sort`` then
    ``$group``/``$first`` on savetime, reference
    ``src/services/source_importer.py:133-212``,
    ``src/services/all_alerts_importer.py:69-95``; SURVEY.md A2/S4).
    """
    if strategy == "agg":
        payload = F.struct(*[F.col(c) for c in df.columns])
        best = df.groupBy(*keys).agg(
            F.min_by(payload, _ordering_struct(order_by)).alias("_best")
        )
        return best.select("_best.*")
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(
            *[(F.col(c) if isinstance(c, str) else c).asc() for c in order_by]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    raise ValueError(f"unknown strategy {strategy!r}")
