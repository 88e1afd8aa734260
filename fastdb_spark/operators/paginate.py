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


def paginate_ranged(
    df: DataFrame,
    order_by: Sequence[str | Column],
    offset: int,
    limit: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """OFFSET/LIMIT page WITHOUT a single-task global window — the
    unbounded-scale export path.

    ``paginate`` ranks the whole table through one ``Window.orderBy``
    task: correct, but at 100 TB that task sorts everything.  Here the
    sort is a distributed range shuffle (``repartitionByRange`` — the same
    machinery as ``orderBy``), each partition's row count is gathered with
    one key-only job, and global positions are partition-base + local
    index, computed per partition with no second shuffle.  Partitions
    wholly outside ``[offset, offset+limit)`` emit nothing and short-
    circuit immediately.

    The frame is persisted between the count job and the page read so the
    range shuffle runs once; caller may ``unpersist()`` after consuming.
    ``order_by`` must be a total order (same caveat as SQL OFFSET).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    rdf = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    rdf = rdf.persist()
    counts = {
        r["pid"]: r["count"]
        for r in rdf.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    lo, hi = offset, offset + limit

    schema = rdf.schema

    def op(pid: int, it):
        base = bases.get(pid)
        if base is None or base >= hi or base + counts[pid] <= lo:
            return
        for i, row in enumerate(it):
            g = base + i
            if g >= hi:
                break
            if g >= lo:
                yield row

    out = rdf.rdd.mapPartitionsWithIndex(op, preservesPartitioning=True)
    return df.sparkSession.createDataFrame(out, schema)


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
