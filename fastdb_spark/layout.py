"""Physical table layout for the big catalog tables at survey scale.

The reference's physical tuning is btree + q3c indexes (reference
``db/2026-02-02_refactor.sql:279-285,412-417``); columnar Spark replaces
indexes with LAYOUT (SURVEY.md Q1/Q10/Q11):

- **partition by a coarse dec-zone bucket** (default 1 degree): cone
  searches and spatial joins prune whole partitions via Catalyst partition
  filters — the stored-table analog of the q3c index expression;
- **cluster files by (diaobjectid, midpointmjdtai)** inside each bucket:
  per-object lightcurve reads touch few row groups (parquet min/max
  stats give row-group pruning on object id);
- photometry without positions partitions by ``diaobjectid`` range via
  the same helper with ``zone_source`` pointing at a precomputed column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastdb_spark.operators.spatial import cone_search

ZONE_DEG = 1.0
ZONE_COL = "zone_bucket"


def zone_bucket(dec, zone_deg: float = ZONE_DEG):
    return F.floor(dec / F.lit(zone_deg)).cast("int")


def write_spatial(
    df: DataFrame,
    path: str,
    dec_col: str = "dec",
    cluster_by: tuple[str, ...] = ("diaobjectid", "midpointmjdtai"),
    zone_deg: float = ZONE_DEG,
) -> None:
    """Write a spatially-partitioned, object-clustered parquet table."""
    out = df.withColumn(ZONE_COL, zone_bucket(F.col(dec_col), zone_deg))
    avail = [c for c in cluster_by if c in df.columns]
    (
        out.repartition(ZONE_COL)
        .sortWithinPartitions(ZONE_COL, *avail)
        .write.mode("overwrite")
        .partitionBy(ZONE_COL)
        .parquet(path)
    )


def read_cone(
    spark: SparkSession,
    path: str,
    center_ra: float,
    center_dec: float,
    radius_deg: float,
    zone_deg: float = ZONE_DEG,
) -> DataFrame:
    """Cone search over a zone-partitioned table with partition pruning.

    The zone-range predicate is on the PARTITION column, so Catalyst
    prunes directories before any file is opened; the exact haversine
    runs only inside surviving partitions.
    """
    df = spark.read.parquet(path)
    zlo = math.floor((center_dec - radius_deg) / zone_deg)
    zhi = math.floor((center_dec + radius_deg) / zone_deg)
    pruned = df.filter(F.col(ZONE_COL).between(zlo, zhi))
    return cone_search(pruned, center_ra, center_dec, radius_deg)
