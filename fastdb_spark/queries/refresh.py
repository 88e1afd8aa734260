"""Gold-table refresh jobs (SURVEY.md Q7).

The reference maintains per-procver materialized views refreshed manually
(``src/ltcv.py:1537-1831`` create/refresh).  Here the gold tables are
parquet outputs of one-pass jobs; search reads gold when fresh, or builds
on the fly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fastdb_spark.queries.objstats import build_objstats
from fastdb_spark.storage import ParquetTable
from fastdb_spark.versions import ProcverResolver


def objstats_paths(gold_root: str, procver: str) -> tuple[str, str]:
    safe = procver.replace("/", "_")
    return (
        os.path.join(gold_root, f"objstats_{safe}.parquet"),
        os.path.join(gold_root, f"objstatscomb_{safe}.parquet"),
    )


def refresh_objstats(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    resolver: ProcverResolver,
    procver: str,
    gold_root: str,
) -> tuple[str, str]:
    """Rebuild the per-band and combined objstats gold tables for one
    processing version (the REFRESH MATERIALIZED VIEW analog)."""
    per_band, combined = build_objstats(tables, resolver, procver)
    p1, p2 = objstats_paths(gold_root, procver)
    ParquetTable(spark, p1).overwrite(per_band)
    ParquetTable(spark, p2).overwrite(combined)
    return p1, p2


def read_objstats(
    spark: SparkSession, gold_root: str, procver: str
) -> tuple[DataFrame, DataFrame] | None:
    p1, p2 = objstats_paths(gold_root, procver)
    if not (os.path.exists(p1) and os.path.exists(p2)):
        return None
    return spark.read.parquet(p1), spark.read.parquet(p2)
