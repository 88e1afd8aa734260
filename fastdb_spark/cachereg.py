"""Registry for staged (persisted) intermediate frames.

Pipeline operators persist sketch/staging frames that multiple downstream
branches read (``pipeline.dedup._stage``, ``pipeline.curate``).  The
frames must stay cached until the consuming job has run — which the
operator itself cannot know — so instead of leaking them into the session
forever, every stage registers here and the *consumer* calls
:func:`release_staged` once it has materialized its result (bench does
this between queries; tests in teardown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_STAGED: list[DataFrame] = []


def stage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and track it for later release.

    Eager materialization (count action) by default: branches consuming a
    lazily-filled cache concurrently inside one job lose the race and all
    recompute (measured ~2x on the composed curation pipeline)."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        df.count()
    _STAGED.append(df)
    return df


def release_staged() -> int:
    """Unpersist every tracked stage; returns how many were released."""
    n = 0
    while _STAGED:
        _STAGED.pop().unpersist()
        n += 1
    return n
