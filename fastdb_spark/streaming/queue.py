"""Async long-query queue (reference ``src/webserver/dbapp.py:126-160``
submit + ``src/services/long_query_runner.py`` runner; SURVEY.md §3.3/O5).

State machine on a small parquet-backed table: queued (started NULL) ->
started -> finished/error; results land as csv or parquet files; rows and
results prune after ``PRUNE_DAYS``.

Claiming: the reference serializes claims across up to 20 runner
processes with ``LOCK TABLE`` (``src/services/long_query_runner.py:
92-109,236-251``).  The parquet analog is a filesystem mutex: the whole
read-pick-write claim section runs under an atomically-created lockfile
(O_CREAT|O_EXCL — atomic on POSIX and NFSv3+), so N runners sharing the
queue directory cannot double-claim; a crashed claimant's lock is broken
after ``CLAIM_LOCK_STALE`` seconds.  On a transactional table (Delta/
Iceberg) the same API maps to a conditional MERGE on ``started IS NULL``.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid as uuidlib

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from fastdb_spark import schemas
from fastdb_spark.storage import ParquetTable

PRUNE_DAYS = 7  # reference long_query_runner.py:69-89
CLAIM_LOCK_TIMEOUT = 30.0  # seconds a claimant waits for the mutex
CLAIM_LOCK_STALE = 120.0  # break locks older than this (crashed claimant)


class QueryQueue:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = ParquetTable(spark, os.path.join(root, "query_queue.parquet"))
        self.results_dir = os.path.join(root, "query_results")
        os.makedirs(self.results_dir, exist_ok=True)

    # -- submit ------------------------------------------------------------

    def submit(
        self,
        userid: str,
        queries: list[str],
        subdicts: list[str] | None = None,
        fmt: str = "csv",
    ) -> str:
        qid = str(uuidlib.uuid4())
        row = Row(
            queryid=qid,
            userid=userid,
            submitted=dt.datetime.now(dt.timezone.utc),
            started=None,
            finished=None,
            error=None,
            errortext=None,
            queries=queries,
            subdicts=subdicts or [],
            format=fmt,
        )
        df = self.spark.createDataFrame([row], schemas.QUERY_QUEUE)
        self.table.upsert(df, ["queryid"], "nothing")
        return qid

    # -- runner ------------------------------------------------------------

    def _claim_mutex(self):
        """Filesystem mutex for the read-pick-write claim section (the
        LOCK TABLE analog) — the shared lockfile primitive, under a
        distinct suffix so a claimant (which upserts INSIDE its claim,
        taking the table's ``.write.lock``) never self-deadlocks."""
        from fastdb_spark.locks import table_write_lock

        return table_write_lock(
            self.table.path,
            suffix=".claim.lock",
            timeout=CLAIM_LOCK_TIMEOUT,
            stale=CLAIM_LOCK_STALE,
        )

    def claim_next(self) -> Row | None:
        """Claim the oldest unstarted row (FIFO, reference ORDER BY
        submitted).  Safe under concurrent runners: the read-pick-write
        runs inside the claim mutex, so the 'started IS NULL' check a
        claimant bases its write on cannot be invalidated by another."""
        if not self.table.exists():
            return None
        with self._claim_mutex():
            q = self.table.read()
            nxt = (
                q.filter(F.col("started").isNull())
                .orderBy("submitted", "queryid")
                .limit(1)
                .collect()
            )
            if not nxt:
                return None
            row = nxt[0]
            claimed = self.spark.createDataFrame(
                [row.asDict() | {"started": dt.datetime.now(dt.timezone.utc)}],
                schemas.QUERY_QUEUE,
            )
            self.table.upsert(claimed, ["queryid"], "update")
            return row

    def run_one(self) -> str | None:
        """Claim and execute the next queued query against the registered
        temp views (the reference executes statements sequentially on a
        read-only connection; ``spark.sql`` over views is read-only by
        construction — SURVEY.md S11)."""
        row = self.claim_next()
        if row is None:
            return None
        qid = row["queryid"]
        try:
            result: DataFrame | None = None
            for sql in row["queries"]:
                result = self.spark.sql(sql)
            out = os.path.join(self.results_dir, qid)
            if row["format"] == "csv":
                result.write.mode("overwrite").option("header", "true").csv(out)
            else:
                result.write.mode("overwrite").parquet(out)
            self._finish(row, error=False, errortext=None)
        except Exception as e:  # noqa: BLE001 - error surface is the row
            self._finish(row, error=True, errortext=str(e)[:2000])
        return qid

    def _finish(self, row: Row, error: bool, errortext: str | None) -> None:
        done = self.spark.createDataFrame(
            [
                row.asDict()
                | {
                    "started": row["started"] or dt.datetime.now(dt.timezone.utc),
                    "finished": dt.datetime.now(dt.timezone.utc),
                    "error": error,
                    "errortext": errortext,
                }
            ],
            schemas.QUERY_QUEUE,
        )
        self.table.upsert(done, ["queryid"], "update")

    # -- status / results --------------------------------------------------

    def status(self, queryid: str) -> Row | None:
        if not self.table.exists():
            return None
        rows = self.table.read().filter(F.col("queryid") == queryid).collect()
        return rows[0] if rows else None

    def results_path(self, queryid: str) -> str:
        return os.path.join(self.results_dir, queryid)

    def prune(self, now: dt.datetime | None = None) -> int:
        """Drop finished rows older than PRUNE_DAYS (+ their results)."""
        if not self.table.exists():
            return 0
        now = now or dt.datetime.now(dt.timezone.utc)
        cutoff = now - dt.timedelta(days=PRUNE_DAYS)
        q = self.table.read()
        stale = q.filter(F.col("finished") < F.lit(cutoff))
        stale_ids = [r["queryid"] for r in stale.select("queryid").collect()]
        if not stale_ids:
            return 0
        self.table.overwrite(q.filter(~F.col("queryid").isin(stale_ids)))
        import shutil

        for qid in stale_ids:
            p = self.results_path(qid)
            if os.path.exists(p):
                shutil.rmtree(p)
        return len(stale_ids)
