"""Filesystem write locks for single-table critical sections.

The parquet MERGE emulation (storage.py) is a read-merge-write: without
mutual exclusion two concurrent writers both read the pre-batch state and
the second swap silently discards the first batch (lost update — the
anomaly the reference avoids with Postgres row locks around COPY +
``ON CONFLICT``, ``src/db.py:1406-1515``).  A ``.lock`` file created with
``O_CREAT|O_EXCL`` (atomic on POSIX and NFSv3+) serializes them; locks
from crashed writers are broken after a staleness horizon.  The same
mechanism backs the query-queue claim (streaming/queue.py).

This is the portable answer; the transactional one is
``DeltaTableStore`` (real MERGE INTO under optimistic concurrency) when
the Delta jars are present.  Assumptions, stated plainly: a shared POSIX
filesystem and roughly-synchronized wall clocks for staleness — the same
assumptions as the reference's NFS-deployed queue runner.
"""

from __future__ import annotations

import contextlib
import os
import time

LOCK_TIMEOUT = 60.0  # seconds a writer waits for the mutex
LOCK_STALE = 300.0  # break locks older than this (crashed writer)


@contextlib.contextmanager
def table_write_lock(
    path: str,
    suffix: str = ".write.lock",
    timeout: float = LOCK_TIMEOUT,
    stale: float = LOCK_STALE,
):
    """Exclusive advisory lock for the table at ``path``.

    Spin with backoff on ``FileExistsError``; break locks older than
    ``stale``; raise ``TimeoutError`` after ``timeout``.  The lock file
    records the holder's pid for post-mortems.  ``path`` is normalized
    here so every spelling of the same table directory (trailing slash,
    ``./`` prefix) contends on ONE lock file — callers previously
    normalized ad hoc, and two spellings would have silently taken two
    locks around the same table.
    """
    lock = os.path.normpath(path) + suffix
    os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > stale:
                    os.unlink(lock)  # break a crashed writer's lock
                    continue
            except OSError:
                continue  # lock vanished between check and stat
            if time.monotonic() > deadline:
                raise TimeoutError(f"write lock held too long: {lock}")
            time.sleep(0.05)
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(lock)
