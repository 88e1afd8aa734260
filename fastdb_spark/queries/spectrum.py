"""Spectrum-followup workflow queries (reference ``src/spectrum.py:23-339``;
SURVEY.md §7 phase 3).

The cycle: users register *wanted* spectra; facilities *plan* (claim) and
eventually *report* observed spectra.  The query surface:

- ``spectra_wanted``: wanted, minus those already planned after the want,
  minus those with a spectrum reported after the want — an anti-join chain
  (J4), with optional detection-recency and limiting-magnitude filters.
- ``latest_mag_per_band``: newest detection magnitude per (root, band)
  (argmax, A4 + F1).
- ``declare_spectrum_info``: plain insert (storage layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.functions.photometry import flux2mag
from fastdb_spark.operators.dedup import dedup_top_priority


def spectra_wanted(
    wantedspectra: DataFrame,
    plannedspectra: DataFrame,
    spectruminfo: DataFrame,
    detections: DataFrame | None = None,
    requester: str | None = None,
    not_claimed_in_last_days: float | None = None,
    no_spectra_in_last_days: float | None = None,
    now=None,
    lim_mag: float | None = None,
    mjd_now: float | None = None,
) -> DataFrame:
    """Wanted spectra not yet claimed or observed (reference
    ``src/spectrum.py:101-230`` ``get_spectrum_info`` wanted branch).

    The reference expresses 'not claimed' / 'no recent spectrum' as LEFT
    JOIN ... IS NULL; here they are left-anti joins against time-filtered
    right sides.
    """
    w = wantedspectra
    if requester is not None:
        w = w.filter(F.col("requester") == requester)

    planned = plannedspectra
    if not_claimed_in_last_days is not None and now is not None:
        cutoff = F.lit(now) - F.expr(f"INTERVAL {int(not_claimed_in_last_days)} DAYS")
        planned = planned.filter(F.col("created_at") >= cutoff)
    w = w.join(
        planned.select("root_diaobject_id").distinct(),
        on="root_diaobject_id",
        how="left_anti",
    )

    observed = spectruminfo
    if no_spectra_in_last_days is not None and now is not None:
        cutoff = F.lit(now) - F.expr(f"INTERVAL {int(no_spectra_in_last_days)} DAYS")
        observed = observed.filter(F.col("inserted_at") >= cutoff)
    w = w.join(
        observed.select("root_diaobject_id").distinct(),
        on="root_diaobject_id",
        how="left_anti",
    )

    if lim_mag is not None and detections is not None:
        # objects whose latest detection is brighter than lim_mag
        latest = latest_mag_per_object(detections, mjd_now)
        bright = latest.filter(F.col("latest_mag") <= F.lit(lim_mag)).select(
            F.col("rootid").alias("root_diaobject_id")
        )
        w = w.join(bright, on="root_diaobject_id", how="left_semi")
    return w


def latest_mag_per_band(
    detections: DataFrame, mjd_now: float | None = None
) -> DataFrame:
    """Most recent detection magnitude per (rootid, band) — the pandas
    ``groupby().idxmax()`` the reference does client-side
    (``src/spectrum.py:266-291``), as one max_by aggregate."""
    df = detections
    if mjd_now is not None:
        df = df.filter(F.col("midpointmjdtai") <= F.lit(mjd_now))
    latest = dedup_top_priority(
        df.select("rootid", "band", "midpointmjdtai", "psfflux", "psffluxerr"),
        keys=("rootid", "band"),
        order_by=("midpointmjdtai", "psfflux", "psffluxerr"),
    )
    return latest.select(
        "rootid",
        "band",
        F.col("midpointmjdtai").alias("latest_mjd"),
        F.round(flux2mag(F.col("psfflux")), 6).alias("latest_mag"),
    )


def latest_mag_per_object(
    detections: DataFrame, mjd_now: float | None = None
) -> DataFrame:
    """Cross-band latest detection magnitude per root."""
    df = detections
    if mjd_now is not None:
        df = df.filter(F.col("midpointmjdtai") <= F.lit(mjd_now))
    latest = dedup_top_priority(
        df.select("rootid", "midpointmjdtai", "psfflux"),
        keys=("rootid",),
        order_by=("midpointmjdtai", "psfflux"),
    )
    return latest.select(
        "rootid",
        F.col("midpointmjdtai").alias("latest_mjd"),
        F.round(flux2mag(F.col("psfflux")), 6).alias("latest_mag"),
    )
