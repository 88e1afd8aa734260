"""Table storage with MERGE/upsert semantics.

The reference upserts via COPY-into-temp + ``INSERT ... ON CONFLICT DO
NOTHING / DO UPDATE`` (reference ``src/db.py:1406-1515``; SURVEY.md S5/Q6).
The Spark-native equivalent is Delta ``MERGE INTO`` — gated behind an
import-try because the runtime image may not carry the Delta jars.  The
portable fallback emulates MERGE on plain parquet:

    read target -> (DO NOTHING: left-anti new rows  |  DO UPDATE:
    target-minus-matched + updates) -> union -> atomic directory swap

The emulation rewrites the table (fine for dimension/workflow tables and
micro-batch silver tables at test scale); at 100 TB the real deployment
uses Delta/Iceberg MERGE with partition pruning on the join keys — the
call-site API is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - delta not in the test image
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except ImportError:
    HAVE_DELTA = False


class ParquetTable:
    """A parquet-backed table directory with upsert support."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        # write-then-swap: never leave a half-written table behind
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def compact(self, target_partitions: int | None = None) -> None:
        """Rewrite the table into few large files (the OPTIMIZE analog —
        append-only ingest accumulates small files per micro-batch)."""
        df = self.read()
        n = target_partitions or max(
            1, self.spark.sparkContext.defaultParallelism // 4
        )
        self.overwrite(df.coalesce(n))

    def file_count(self) -> int:
        import glob

        return len(glob.glob(os.path.join(self.path, "*.parquet")))

    def upsert(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        on_conflict: str = "nothing",
    ) -> None:
        """MERGE semantics (reference bulk_insert_or_upsert):

        - ``on_conflict='nothing'`` — insert rows whose key is absent
          (``ON CONFLICT DO NOTHING``); existing rows untouched.  New rows
          are appended (no table rewrite).
        - ``on_conflict='update'``  — replace matched rows with the update
          and insert the rest (``DO UPDATE SET col = EXCLUDED.col``).

        ``updates`` must be key-unique (dedup upstream — the reference
        requires the same, its temp table carries no duplicate PKs).
        """
        ks = list(keys)
        if not self.exists():
            self.overwrite(updates)
            return
        target = self.read()
        if on_conflict == "nothing":
            fresh = updates.join(target.select(*ks), on=ks, how="left_anti")
            # append-only: cheap, idempotent under re-run of the same batch
            self.append(fresh.select(*target.columns))
        elif on_conflict == "update":
            kept = target.join(updates.select(*ks), on=ks, how="left_anti")
            self.overwrite(kept.unionByName(updates.select(*target.columns)))
        else:
            raise ValueError(f"unknown on_conflict={on_conflict!r}")


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    on_conflict: str = "nothing",
) -> None:
    """Functional facade; dispatches to Delta MERGE when available."""
    # Delta path intentionally unimplemented in this image (no jars);
    # the ParquetTable emulation is the portable behavior under test.
    ParquetTable(spark, path).upsert(updates, keys, on_conflict)
