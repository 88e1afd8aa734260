"""Batch catalog loaders (SURVEY.md S6/S7).

- ``snana_transform``  — the SNANA photometry semantics from the reference
  FITS loader (``src/admin/load_snana_fits.py:115-246``): zeropoint
  rescale to 31.4, visit synthesis ``floor(mjd*20000)``, detection
  derivation from the photflag bitmask.  The FITS *parsing* needs astropy
  (not in this image) and is gated; the transform itself is pure column
  code over any tabular source (parquet/pandas in tests).
- ``load_survey_parquet`` — the DP1-style parquet loader
  (``src/admin/load_dp1_parquet.py:119-188``): read, rename-map, append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastdb_spark.functions.photometry import ZEROPOINT, visit_from_mjd


def read_snana_fits(spark: SparkSession, paths: list[str]) -> DataFrame:
    """FITS ingestion requires astropy — gated (not in the runtime image)."""
    try:
        import astropy.io.fits  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "SNANA FITS parsing requires astropy; load the PHOT/HEAD tables "
            "to parquet externally and use snana_transform instead"
        ) from e
    raise NotImplementedError("driver-side FITS reader: out of scope for v1")


def snana_transform(
    phot: DataFrame,
    zeropoint_col: str = "zeropt",
    photflag_detect: int = 4096,
) -> DataFrame:
    """SNANA photometry -> catalog-shaped rows.

    flux_nJy = fluxcal * 10**(0.4*(31.4 - zeropt)) (zeropoint rescale),
    visit = floor(mjd*20000) (F12), detection = photflag & detect-bit.
    """
    scale = F.pow(10.0, 0.4 * (F.lit(ZEROPOINT) - F.col(zeropoint_col)))
    return phot.select(
        F.col("snid").cast("long").alias("diaobjectid"),
        visit_from_mjd(F.col("mjd")).alias("visit"),
        F.col("band").alias("band"),
        F.col("mjd").cast("double").alias("midpointmjdtai"),
        (F.col("fluxcal") * scale).cast("float").alias("psfflux"),
        (F.col("fluxcalerr") * scale).cast("float").alias("psffluxerr"),
        (
            F.col("photflag").bitwiseAND(F.lit(photflag_detect)) != 0
        ).alias("is_detection"),
    )


def load_survey_parquet(
    spark: SparkSession,
    path: str,
    column_map: dict[str, str],
    cast_map: dict[str, str] | None = None,
) -> DataFrame:
    """Read survey parquet and rename/cast to catalog columns (S7)."""
    df = spark.read.parquet(path)
    for src, dst in column_map.items():
        df = df.withColumnRenamed(src, dst)
    df = df.select(*[column_map[k] for k in column_map])
    if cast_map:
        for col, typ in cast_map.items():
            df = df.withColumn(col, F.col(col).cast(typ))
    return df
