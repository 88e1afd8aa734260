"""Dense-vector column functions over ``array<double>`` columns.

Built on ``zip_with`` / ``aggregate`` — JVM-side, no UDFs.  Summation is
sequential left-to-right, matching duckdb's list aggregates bit-for-bit on
doubles (required for oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(a: Column) -> Column:
    return a.cast("array<double>")
