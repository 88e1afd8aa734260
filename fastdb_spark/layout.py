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


def morton_key(ra, dec, bits: int = 16):
    """Z-order (Morton) interleave of quantized (ra, dec) — a pure Column
    expression (shift/or chain, whole-stage codegen'd).

    Sorting files by this key clusters 2-D-nearby sky positions into the
    same row groups, so parquet min/max stats prune cone-search scans in
    BOTH coordinates (the dec-zone partition prunes only one).  This is
    the columnar analog of the reference's q3c spatial index (reference
    ``db/2026-02-02_refactor.sql:279-285``), built as layout instead of a
    btree.  ``bits`` per axis; 16 gives ~0.005 deg cells.
    """
    scale_ra = (1 << bits) / 360.0
    scale_dec = (1 << bits) / 180.0
    qra = F.least(
        F.lit((1 << bits) - 1),
        F.floor(ra * F.lit(scale_ra)).cast("long"),
    )
    qdec = F.least(
        F.lit((1 << bits) - 1),
        F.floor((dec + F.lit(90.0)) * F.lit(scale_dec)).cast("long"),
    )
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(qra, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qdec, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return key


def write_spatial_zordered(
    df: DataFrame,
    path: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    zone_deg: float = ZONE_DEG,
) -> None:
    """Zone-partitioned + Z-ORDER-clustered layout: partition pruning on
    dec zones, then files sorted by the Morton key inside each zone so
    row-group stats prune on both ra and dec (the Delta OPTIMIZE ZORDER
    analog on plain parquet)."""
    out = df.withColumn(ZONE_COL, zone_bucket(F.col(dec_col), zone_deg)).withColumn(
        "_zkey", morton_key(F.col(ra_col), F.col(dec_col))
    )
    (
        out.repartition(ZONE_COL)
        .sortWithinPartitions(ZONE_COL, "_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .partitionBy(ZONE_COL)
        .parquet(path)
    )
