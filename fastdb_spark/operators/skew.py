"""Skew-mitigated aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles JOIN skew; aggregation skew over a few
hot keys (e.g. grouping an alert stream by band or event type) still
funnels each hot key through one reducer.  The classic fix: aggregate by
``(key, salt)`` first — hot keys spread over ``n_salts`` reducers with
map-side combine — then re-aggregate the per-salt partials by key.

Works for ALGEBRAIC aggregates (those with a partial form).  The caller
supplies both phases explicitly; common sum/count/min/max helpers below.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partial columns per key.  The salt is a uniform hash of the whole row
    (not random -> deterministic & retry-safe).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe sum/count/avg of one value column per key."""
    out = salted_aggregate(
        df,
        keys,
        partial_aggs=[
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        ],
        final_aggs=[
            F.sum("_psum").alias("sum_value"),
            F.sum("_pcnt").alias("n"),
        ],
        n_salts=n_salts,
    )
    return out.withColumn("avg_value", F.col("sum_value") / F.col("n"))
