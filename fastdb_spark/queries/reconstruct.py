"""Alert reconstruction — the reference's simulation/egress path
(reference ``src/services/projectsim.py:94-270``; SURVEY.md S10/J9/X3).

For each "new" detection, build the full outgoing alert record: the
detection itself, the object, previous sources within the last 365 days,
and previous forced photometry within [t-365, t-1) (the 1-day forced-
photometry lag).  The result is a nested frame matching
``sources.alerts.ALERT_SCHEMA``'s relational content — feed it to
``sources.kafka.write_alert_stream`` (avro) or any sink.

Scale shape: two range joins keyed on diaobjectid (bounded per-object
history) + per-alert collect_list — shuffle keys are object ids, uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRV_WINDOW_DAYS = 365.0
FORCED_GAP_DAYS = 1.0

_SRC_COLS = ["diasourceid", "visit", "band", "midpointmjdtai", "psfflux", "psffluxerr"]
_FRC_COLS = ["diaforcedsourceid", "visit", "band", "midpointmjdtai", "psfflux", "psffluxerr"]


def reconstruct_alerts(
    new_detections: DataFrame,
    source_history: DataFrame,
    forced_history: DataFrame,
    objects: DataFrame,
) -> DataFrame:
    """Nested alert frame: one row per new detection with prv arrays.

    ``new_detections`` / histories are diasource/diaforcedsource-shaped;
    ``objects`` maps diaobjectid -> (ra, dec).
    """
    probe = new_detections.select(
        "diasourceid", "diaobjectid", "visit", "band", "midpointmjdtai",
        "psfflux", "psffluxerr",
    )
    # ONE range join over the tagged union of both histories, then a single
    # group-by with tag-conditional collect_list per prv array.  Two
    # separate collect_history_structs passes + a rejoin on the full probe
    # identity costs double the shuffles (measured ~1.8x slower); the union
    # widens the joined row set but every row is consumed by exactly one
    # conditional aggregate.
    src = source_history.select(
        F.col("diaobjectid").alias("_k_hist"),
        F.lit("s").alias("_tag"),
        F.col("diasourceid").alias("_hid"),
        F.col("visit").alias("_visit"),
        F.col("band").alias("_band"),
        F.col("midpointmjdtai").alias("_t_hist"),
        F.col("psfflux").alias("_flux"),
        F.col("psffluxerr").alias("_fluxerr"),
    )
    frc = forced_history.select(
        F.col("diaobjectid").alias("_k_hist"),
        F.lit("f").alias("_tag"),
        F.col("diaforcedsourceid").alias("_hid"),
        F.col("visit").alias("_visit"),
        F.col("band").alias("_band"),
        F.col("midpointmjdtai").alias("_t_hist"),
        F.col("psfflux").alias("_flux"),
        F.col("psffluxerr").alias("_fluxerr"),
    )
    hist = src.unionByName(frc)
    p = probe.select(
        F.struct(*[F.col(c) for c in probe.columns]).alias("_probe_row"),
        F.col("diaobjectid").alias("_k_probe"),
        F.col("midpointmjdtai").alias("_t_probe"),
    )
    t, th = F.col("_t_probe"), F.col("_t_hist")
    # join condition carries the WIDEST window [t-365, t); the forced-
    # photometry gap (< t-1) narrows inside its conditional aggregate.
    # left join: probes with zero history keep empty prv arrays.
    cond = (
        (F.col("_k_probe") == F.col("_k_hist"))
        & (th >= t - PRV_WINDOW_DAYS)
        & (th < t)
    )
    joined = p.join(hist, on=cond, how="left")
    src_point = F.struct(
        F.col("_hid").alias("diasourceid"),
        F.col("_visit").alias("visit"),
        F.col("_band").alias("band"),
        F.col("_t_hist").alias("midpointmjdtai"),
        F.col("_flux").alias("psfflux"),
        F.col("_fluxerr").alias("psffluxerr"),
    )
    frc_point = F.struct(
        F.col("_hid").alias("diaforcedsourceid"),
        F.col("_visit").alias("visit"),
        F.col("_band").alias("band"),
        F.col("_t_hist").alias("midpointmjdtai"),
        F.col("_flux").alias("psfflux"),
        F.col("_fluxerr").alias("psffluxerr"),
    )
    with_frc = (
        joined.groupBy("_probe_row")
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("_tag") == "s", src_point))
            ).alias("prvDiaSources"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        (F.col("_tag") == "f") & (th < t - FORCED_GAP_DAYS),
                        frc_point,
                    )
                )
            ).alias("prvDiaForcedSources"),
        )
        .select("_probe_row.*", "prvDiaSources", "prvDiaForcedSources")
    )
    obj = objects.select(
        "diaobjectid",
        F.struct(
            F.col("diaobjectid").alias("diaObjectId"),
            F.col("ra"),
            F.col("dec"),
        ).alias("diaObject"),
    )
    return with_frc.join(obj, on="diaobjectid", how="left").select(
        F.col("diasourceid").alias("alertId"),
        F.struct(
            F.col("diasourceid").alias("diaSourceId"),
            F.col("diaobjectid").alias("diaObjectId"),
            F.col("visit"),
            F.col("band"),
            F.col("midpointmjdtai").alias("midpointMjdTai"),
            F.col("psfflux").alias("psfFlux"),
            F.col("psffluxerr").alias("psfFluxErr"),
        ).alias("diaSource"),
        F.col("prvDiaSources"),
        F.col("prvDiaForcedSources"),
        F.col("diaObject"),
    )
