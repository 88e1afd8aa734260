"""Deterministic pagination and sampling (SURVEY.md O3/O4).

The reference paginates exports with OFFSET/LIMIT over a sorted key
(``src/parquet_export.py:95-102``) and serves random lightcurves with
``ORDER BY random() LIMIT 1`` (``src/webserver/ltcvapp.py:128-148``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def paginate(
    df: DataFrame,
    order_by: Sequence[str | Column],
    offset: int,
    limit: int,
) -> DataFrame:
    """OFFSET/LIMIT page over a total order.

    Uses a ranked window (portable, deterministic).  ``order_by`` must be a
    total order (append a unique id) or page boundaries are ambiguous —
    same caveat as SQL OFFSET.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.orderBy(*cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
        .drop("_rn")
    )


def pseudorandom_sample(
    df: DataFrame, id_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Deterministic 'random' sample: order by md5(salt || id), take n.

    Replaces ``ORDER BY random() LIMIT n`` where reproducibility matters
    (tests, oracles); pass a different salt per draw."""
    return (
        df.withColumn("_h", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))))
        .orderBy("_h")
        .limit(n)
        .drop("_h")
    )


def random_sample(df: DataFrame, n: int) -> DataFrame:
    """True random sample (reference ltcvapp random endpoint)."""
    return df.orderBy(F.rand()).limit(n)
