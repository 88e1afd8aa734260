"""Driver-side overlap of INDEPENDENT Spark jobs (guide §2.6).

The maintenance paths (index takedown, compaction) rewrite several
independent targets — one directory per table or per cluster partition —
and the pre-r12 loops ran them serially from the driver: each iteration
paid its own job-launch latency and left the executors idle through the
tail of the previous iteration.  Spark's scheduler happily runs several
jobs at once inside one application; submitting the per-target rewrites
from a small thread pool lets the next target's tasks back-fill the
executors as the previous one drains (FIFO scheduling is exactly the
back-fill behaviour wanted here).

``pyspark.InheritableThread`` semantics are not required for these
call sites — the rewrites set no thread-local job groups/descriptions —
so a plain ``ThreadPoolExecutor`` is used, as the optimization guide
does.  Exceptions propagate: the first failure cancels nothing already
running but re-raises to the caller after all submitted work settles,
so a failed rewrite is never silently swallowed.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")

#: default pool width: enough overlap to fill a job's scheduling tail,
#: small enough that concurrent rewrites do not fight for executors
#: (guide §2.6: "2-3 jobs in flight is plenty"; maintenance rewrites are
#: shorter than analytics jobs, so 4 is the sweet spot measured on the
#: sf0.1 takedown/compaction gates)
DEFAULT_JOB_POOL = 4


def run_independent_jobs(
    fn: Callable[[T], R],
    items: Sequence[T] | Iterable[T],
    max_workers: int = DEFAULT_JOB_POOL,
) -> list[R]:
    """Run ``fn(item)`` for every item, overlapping independent Spark
    jobs from a bounded driver thread pool; results come back in item
    order.  Falls back to a plain loop for 0/1 items (no pool setup
    cost on the common single-target path)."""
    items = list(items)
    if len(items) <= 1:
        return [fn(it) for it in items]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(items))) as pool:
        return list(pool.map(fn, items))
