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

from fastdb_spark.operators.rangejoin import collect_history_structs

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
    # attach each history to the SLIM probe independently, then equi-join
    # the two array columns back — chaining the second collect over the
    # first's output would drag the prv array through another
    # group-by-struct (measured ~2x slower)
    with_prv = collect_history_structs(
        probe,
        source_history.select("diaobjectid", *_SRC_COLS),
        key="diaobjectid",
        time_col="midpointmjdtai",
        lookback=PRV_WINDOW_DAYS,
        gap=0.0,
        struct_cols=_SRC_COLS,
        out_col="prvDiaSources",
    )
    frc_arrays = collect_history_structs(
        probe,
        forced_history.select("diaobjectid", *_FRC_COLS),
        key="diaobjectid",
        time_col="midpointmjdtai",
        lookback=PRV_WINDOW_DAYS,
        gap=FORCED_GAP_DAYS,
        struct_cols=_FRC_COLS,
        out_col="prvDiaForcedSources",
    )
    # join on the FULL probe identity: ids alone may not be unique, and
    # both branches dedup identical probe rows the same way (1:1 join)
    with_frc = with_prv.join(frc_arrays, on=list(probe.columns), how="left")
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
