"""Deterministic pagination and sampling (SURVEY.md O3/O4).

The reference paginates exports with OFFSET/LIMIT over a sorted key
(``src/parquet_export.py:95-102``) and serves random lightcurves with
``ORDER BY random() LIMIT 1`` (``src/webserver/ltcvapp.py:128-148``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: a frame backed by ONE local file no bigger than this takes the window
#: strategy under ``strategy='auto'`` — the fixed persist+count overhead of
#: the ranged plan (~0.6 s) dwarfs a single-task sort at that size
_SMALL_FILE_BYTES = 128 * 1024 * 1024


#: logical-plan node names that can MULTIPLY rows relative to the scanned
#: file: joins, explode (Generate), Union, Expand (cube/rollup/grouping
#: sets), co-grouping, and the arbitrary-cardinality Python map nodes.
#: Matched against node CLASS names (not the stringified plan), so column
#: names containing e.g. 'Join' cannot false-positive (ADVICE r6).
_WIDENING_NODES = (
    "Join",
    "Generate",
    "Union",
    "Expand",
    "CoGroup",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroups",
    "MapPartitions",
)


def _plan_is_narrow(df: DataFrame) -> bool:
    """Walk the analyzed logical plan's node names; False if any node can
    multiply rows (see :data:`_WIDENING_NODES`) or the walk fails."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            if any(w in name for w in _WIDENING_NODES):
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
    except Exception:
        return False
    return True


def _single_small_file(df: DataFrame, cap: int = _SMALL_FILE_BYTES) -> bool:
    """True iff ``df`` scans exactly one LOCAL file of <= ``cap`` bytes AND
    its plan is narrow (no row-multiplying nodes), so the source-file size
    is an honest proxy for the frame size.  Without the narrowness check a
    self-join / explode / union / rollup over one small file still reports
    one input file and would silently take the single-task window sort on
    an arbitrarily larger frame (ADVICE r5/r6).  Both probes are
    metadata-only (``inputFiles()`` + a walk over the already-analyzed
    logical plan's node names — no job); remote/object-store paths and
    non-file-backed frames report False (ranged stays the default)."""
    if not _plan_is_narrow(df):
        return False
    try:
        files = df.inputFiles()
    except Exception:
        return False
    if len(files) != 1:
        return False
    p = files[0]
    if p.startswith("file:"):
        p = "/" + p[5:].lstrip("/")
    elif "://" in p:
        return False
    try:
        return os.path.getsize(p) <= cap
    except OSError:
        return False


#: most recent paginate_ranged cache, unpersisted when the next call (or
#: :func:`unpersist_pages`) supersedes it — bounds session cache growth to
#: one page frame without making every caller cache-manage.
_LAST_PAGE_CACHE: list = []


def unpersist_pages() -> None:
    """Release the cached range-partitioned frame of the last
    ``paginate_ranged`` call (no-op if none)."""
    while _LAST_PAGE_CACHE:
        _LAST_PAGE_CACHE.pop().unpersist()


def paginate(
    df: DataFrame,
    order_by: Sequence[str | Column],
    offset: int,
    limit: int,
    strategy: str = "auto",
) -> DataFrame:
    """OFFSET/LIMIT page over a total order.

    ``strategy='window'`` ranks through one global ``Window.orderBy`` —
    portable, but that window is a single task sorting everything, so it is
    only acceptable for frames already known to be small.
    ``strategy='ranged'`` delegates to :func:`paginate_ranged`.
    ``'auto'`` (default) is the ranged plan unless the input is a single
    local file of <= 128 MiB AND the plan is narrow — no Join/Generate
    nodes, so the file size bounds the frame size (both metadata-only
    probes: ``inputFiles()`` + the analyzed plan — no job, unlike a
    ``df.rdd`` partition-count probe), in which case the
    window plan is cheaper: the ranged path pays a fixed persist + count
    job that dwarfs a one-task sort at that size.  Pass
    ``strategy='window'`` / ``'ranged'`` to force either.

    ``order_by`` must be a total order (append a unique id) or page
    boundaries are ambiguous — same caveat as SQL OFFSET.
    """
    if strategy == "auto":
        strategy = "window" if _single_small_file(df) else "ranged"
    if strategy == "ranged":
        return paginate_ranged(df, order_by, offset, limit)
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

    The sort is a distributed range shuffle (``repartitionByRange`` — the
    same machinery as ``orderBy``), each range's row count is gathered with
    one key-only job, and the page is then read entirely JVM-side: range
    partitions wholly outside ``[offset, offset+limit)`` are filtered out
    at the scan (at most two boundary ranges plus ⌈limit/range⌉ interior
    ranges survive), each survivor gets a partition-local ``row_number``
    (the window re-clusters only the surviving sliver, not the table), and
    the global position is the broadcast partition-base plus the local
    rank.  No Python row path anywhere.

    The range-partitioned frame is persisted so the shuffle feeding the
    count job is reused by the page read; the cache is released when the
    next call (or :func:`unpersist_pages`) supersedes it.
    ``order_by`` must be a total order (same caveat as SQL OFFSET).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    rdf = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    unpersist_pages()
    rdf = rdf.persist()
    _LAST_PAGE_CACHE.append(rdf)
    counts = {
        r["_pid"]: r["count"]
        for r in rdf.groupBy("_pid").count().collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    lo, hi = offset, offset + limit
    overlap = [
        pid
        for pid in sorted(counts)
        if bases[pid] < hi and bases[pid] + counts[pid] > lo
    ]
    if not overlap:
        return rdf.limit(0).drop("_pid")

    base_map = F.create_map(
        *[F.lit(v) for pid in overlap for v in (pid, bases[pid])]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    page = (
        rdf.filter(F.col("_pid").isin(overlap))
        .withColumn("_g", base_map[F.col("_pid")] + F.row_number().over(w) - 1)
        .filter((F.col("_g") >= lo) & (F.col("_g") < hi))
    )
    # the page is <= limit rows; a final sort keeps global order cheap
    return page.orderBy("_g").drop("_pid", "_g")


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
