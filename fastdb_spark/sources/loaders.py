"""Batch catalog loaders (SURVEY.md S6/S7).

- ``snana_transform``  — the SNANA photometry semantics from the reference
  FITS loader (``src/admin/load_snana_fits.py:115-246``): zeropoint
  rescale to 31.4, visit synthesis ``floor(mjd*20000)``, detection
  derivation from the photflag bitmask.  The FITS *parsing* needs astropy
  (not in this image) and is gated; the transform itself is pure column
  code over any tabular source (parquet/pandas in tests).
- ``load_survey_parquet`` — flat survey-parquet loader: read, rename-map,
  append.
- ``load_dp1_nested`` — the DP1 nested-parquet loader
  (``src/admin/load_dp1_parquet.py:119-188``): per-object struct arrays
  flattened to the three catalog tables via JVM-side explodes, with the
  DP1ColumnMapper rename/keep/drop policy as declarative projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastdb_spark.functions.photometry import ZEROPOINT, visit_from_mjd


#: SNANA photflag detection bit (reference load_snana_fits.py CLI default)
SNANA_PHOTFLAG_DETECT = 4096


def read_snana_fits(
    spark: SparkSession,
    head_paths: list[str],
    max_sources_per_object: int = 100000,
    snana_zeropoint: float = 27.5,
) -> DataFrame:
    """SNANA ``*HEAD.FITS.gz``/``*PHOT.FITS.gz`` pairs -> forced-photometry
    rows (reference ``src/admin/load_snana_fits.py:115-246``; SURVEY.md S6).

    Distributed by FILE PAIR: each (head, phot) pair is one Arrow task —
    the reference fans a process pool across files the same way.  Per
    pair: HEAD's 1-indexed ``PTROBS_MIN/MAX`` pointers slice PHOT into
    per-object lightcurves; fluxes rescale from the SNANA zeropoint to
    31.4 (nJy); ``visit = floor(mjd*20000)``;
    ``diaforcedsourceid = snid*max_sources_per_object + seq``.  Detection
    rows are this frame filtered on ``is_detection`` (photflag bit 4096),
    exactly the reference's second pass.  FITS parsing is
    ``sources.fits.read_bintable`` (pure numpy, no astropy).
    """
    import pandas as pd

    from fastdb_spark.sources.fits import read_bintable

    pairs = [(h, h.replace("HEAD", "PHOT")) for h in head_paths]
    pairs_df = spark.createDataFrame(pairs, "head_path string, phot_path string")
    zp_scale = 10.0 ** ((31.4 - snana_zeropoint) / 2.5)

    def op(batches):
        import numpy as np

        for pdf in batches:
            for head_path, phot_path in zip(pdf["head_path"], pdf["phot_path"]):
                head = read_bintable(head_path)
                if not len(head["SNID"]):
                    continue
                phot = read_bintable(phot_path)
                snid = head["SNID"].astype(np.int64)
                n_phot = len(phot["MJD"])
                objid = np.full(n_phot, -1, dtype=np.int64)
                fsid = np.full(n_phot, -1, dtype=np.int64)
                ra = np.full(n_phot, -1.0)
                dec = np.full(n_phot, -100.0)
                for k in range(len(snid)):
                    # pointers are 1-indexed inclusive (reference :202-216)
                    pmin = int(head["PTROBS_MIN"][k]) - 1
                    pmax = int(head["PTROBS_MAX"][k]) - 1
                    n = pmax - pmin + 1
                    if n > max_sources_per_object:
                        raise ValueError(
                            f"SNID {snid[k]}: {n} sources > cap "
                            f"{max_sources_per_object}"
                        )
                    objid[pmin : pmax + 1] = snid[k]
                    fsid[pmin : pmax + 1] = (
                        snid[k] * max_sources_per_object + np.arange(n)
                    )
                    ra[pmin : pmax + 1] = head["RA"][k]
                    dec[pmin : pmax + 1] = head["DEC"][k]
                keep = objid >= 0  # PHOT has -777 separator rows between objects
                mjd = phot["MJD"][keep].astype(np.float64)
                band_col = phot.get("BAND", phot.get("FLT"))
                out = pd.DataFrame(
                    {
                        "diaobjectid": objid[keep],
                        "diaforcedsourceid": fsid[keep],
                        "visit": np.floor(mjd * 20000).astype(np.int64),
                        "band": np.char.strip(band_col[keep].astype(str)),
                        "midpointmjdtai": mjd,
                        "psfflux": (phot["FLUXCAL"][keep] * zp_scale).astype(
                            np.float32
                        ),
                        "psffluxerr": (
                            phot["FLUXCALERR"][keep] * zp_scale
                        ).astype(np.float32),
                        "ra": ra[keep],
                        "dec": dec[keep],
                        "is_detection": (
                            phot["PHOTFLAG"][keep].astype(np.int64)
                            & SNANA_PHOTFLAG_DETECT
                        )
                        != 0,
                    }
                )
                yield out

    schema = (
        "diaobjectid long, diaforcedsourceid long, visit long, band string, "
        "midpointmjdtai double, psfflux float, psffluxerr float, "
        "ra double, dec double, is_detection boolean"
    )
    return pairs_df.repartition(max(1, len(pairs))).mapInPandas(op, schema=schema)


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


# --- DP1 nested loader (S7) -------------------------------------------------
# The reference's DP1 column policy (src/admin/load_dp1_parquet.py:20-75,
# class DP1ColumnMapper): keep-list columns are renamed to lowercase,
# explicit mapper entries are renamed, everything else is dropped.

#: diaobject keep-list (reference load_dp1_parquet.py:38-42)
DP1_OBJECT_KEEP = {"diaObjectId", "radecMjdTai", "ra", "dec"}

#: diasource keep-list (reference load_dp1_parquet.py:50-61)
DP1_SOURCE_KEEP = {
    "diaObjectId", "ssObjectId", "visit", "detector",
    "x", "y", "xErr", "yErr", "band", "midpointMjdTai",
    "ra", "dec", "raErr", "decErr", "ra_dec_Cov",
    "psfFlux", "psfFluxErr", "psfNdata", "snr",
    "scienceFlux", "scienceFluxErr",
    "extendedness", "reliability", "ixx", "iyy", "ixy",
    "ixxPSF", "ixyPSF", "iyyPSF",
}

#: diaforcedsource rename map + keep-list (reference load_dp1_parquet.py:63-75)
DP1_FORCED_MAP = {
    "coord_ra": "ra",
    "coord_dec": "dec",
    "psfDiffFlux": "psfflux",
    "psfDiffFluxErr": "psffluxerr",
    "psfFlux": "scienceflux",
    "psfFluxErr": "sciencefluxerr",
}
DP1_FORCED_KEEP = {"diaObjectId", "visit", "detector", "midpointMjdTai", "band"}


def _dp1_project(df: DataFrame, mapper: dict[str, str], keep: set) -> DataFrame:
    """Apply the DP1 column policy declaratively: one ``select`` of alias
    expressions (mapper renames + keep-list lowercasing), dropping every
    other column — Catalyst prunes the dropped columns at the scan."""
    cols = []
    for c in df.columns:
        if c in mapper:
            cols.append(F.col(c).alias(mapper[c]))
        elif c in keep:
            cols.append(F.col(c).alias(c.lower()))
    return df.select(*cols)


def load_dp1_nested(
    spark: SparkSession,
    path: str,
    base_procver: str | None = None,
) -> dict[str, DataFrame]:
    """DP1 nested-parquet loader (S7): one input row per object carrying
    ``diaSource`` / ``diaObjectForcedSource`` struct arrays, returned as
    the three flat catalog frames ``{"diaobject", "diasource",
    "diaforcedsource"}``.

    The reference (``src/admin/load_dp1_parquet.py:119-188``) flattens the
    nested pandas columns per file in a worker-process pool and bulk-
    upserts each table; here the same flatten is a JVM-side
    ``explode`` + child-field projection per table — fully distributed,
    no Python in the path, and the scan reads ONLY the nested column each
    frame needs (column pruning reaches the parquet footer).  The
    ``DP1ColumnMapper`` rename/keep/drop policy (``load_dp1_parquet.py:
    20-75``) is applied as one declarative projection per table, and
    ``base_procver`` (when given) is stamped on every row the way the
    loader stamps ``base_procver_id`` (``load_dp1_parquet.py:137-140``).
    """
    df = spark.read.parquet(path)
    obj = _dp1_project(df, {}, DP1_OBJECT_KEEP)
    src = _dp1_project(
        df.select(
            "diaObjectId", F.explode("diaSource").alias("_s")
        ).select("diaObjectId", "_s.*"),
        {},
        DP1_SOURCE_KEEP,
    )
    frc = _dp1_project(
        df.select(
            "diaObjectId", F.explode("diaObjectForcedSource").alias("_f")
        ).select("diaObjectId", "_f.*"),
        DP1_FORCED_MAP,
        DP1_FORCED_KEEP,
    )
    out = {"diaobject": obj, "diasource": src, "diaforcedsource": frc}
    if base_procver is not None:
        out = {
            k: v.withColumn("base_procver_id", F.lit(base_procver))
            for k, v in out.items()
        }
    return out
