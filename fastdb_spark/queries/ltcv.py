"""Lightcurve retrieval — the reference's workhorse query family.

Re-expresses ``src/ltcv.py:294-924`` (``many_object_ltcvs`` /
``object_ltcv``) as a DataFrame program (SURVEY.md §3.1):

1. normalize requested object ids -> semi-join restriction (J5)
2. per-table version resolution + priority dedup (J1 + A1)
3. optional band filter (P4) and ``mjd_now`` time-travel cut (P3)
4. ``which='detections'|'forced'|'patch'`` — patch is the full-outer
   forced-vs-detections join (J3)
5. per-root nested assembly via collect_list(struct) (X1/A7)

The reference stages steps 2-4 through Postgres temp tables with planner
hints (``src/ltcv.py:569-712``); here each stage is a lazily-composed
DataFrame and Catalyst plans the whole program at once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.operators.patch import patch_lightcurve
from fastdb_spark.versions import ProcverResolver, versioned

#: photometry value columns returned by lightcurve queries
LTCV_COLS = ("diaobjectid", "band", "midpointmjdtai", "psfflux", "psffluxerr")


def resolve_objects(
    diaobject: DataFrame, resolver: ProcverResolver, procver: str
) -> DataFrame:
    """Version-resolved diaobjectid -> rootid map (reference stages this as
    ``tmp_objids``, ``src/ltcv.py:569-630``): the object table gets its OWN
    priority dedup per diaobjectid, independent of the photometry's base
    version — a bpv2a source row still resolves through the bpv2 object."""
    mapping = resolver.bpv_mapping(procver, "diaobject")
    resolved = versioned(
        diaobject,
        mapping,
        keys=("diaobjectid",),
        extra_order=("base_procver_id",),
    )
    return resolved.select("diaobjectid", "rootid")


def _extract(
    photometry: DataFrame,
    diaobject: DataFrame,
    resolver: ProcverResolver,
    procver: str,
    table: str,
    id_col: str,
    bands: Sequence[str] | None = None,
    mjd_now: float | None = None,
    objids: DataFrame | None = None,
) -> DataFrame:
    """Shared detections/forced extract (reference ``src/ltcv.py:638-712``):
    procver restriction + priority dedup per (rootid, visit), band and
    mjd_now filters, optional object-list semi-join."""
    df = photometry
    if bands:
        df = df.filter(F.col("band").isin(list(bands)))  # P4
    if mjd_now is not None:
        df = df.filter(F.col("midpointmjdtai") <= F.lit(mjd_now))  # P3
    # object map can be millions of rows at full scale — let AQE pick the
    # join strategy (broadcasts when the restricted map is small)
    objmap = resolve_objects(diaobject, resolver, procver)
    df = df.join(objmap, on="diaobjectid", how="inner")
    if objids is not None:
        df = df.join(objids.select("rootid"), on="rootid", how="left_semi")  # J5
    mapping = resolver.bpv_mapping(procver, table)
    # one row per (rootid, visit): highest priority, id as tiebreaker (A1)
    return versioned(df, mapping, keys=("rootid", "visit"), extra_order=(id_col,))


def many_object_ltcvs(
    tables: dict[str, DataFrame],
    resolver: ProcverResolver,
    procver: str,
    which: str = "patch",
    bands: Sequence[str] | None = None,
    mjd_now: float | None = None,
    objids: DataFrame | None = None,
) -> DataFrame:
    """Flat (one row per photometry point) lightcurves for many objects.

    Mirrors reference ``src/ltcv.py:294-924``.  ``which``:

    - ``'detections'`` — diasource points only
    - ``'forced'``     — diaforcedsource points only
    - ``'patch'``      — forced, patched with detections where forced
                         photometry is missing (isdet / ispatch flags)
    """
    sel = [
        "rootid",
        "visit",
        *LTCV_COLS,
    ]
    if which in ("detections", "patch"):
        det = _extract(
            tables["diasource"],
            tables["diaobject"],
            resolver,
            procver,
            "diasource",
            "diasourceid",
            bands,
            mjd_now,
            objids,
        ).select(*sel)
        if which == "detections":
            return det.withColumn("isdet", F.lit(True)).withColumn(
                "ispatch", F.lit(False)
            )
    if which in ("forced", "patch"):
        forced = _extract(
            tables["diaforcedsource"],
            tables["diaobject"],
            resolver,
            procver,
            "diaforcedsource",
            "diaforcedsourceid",
            bands,
            mjd_now,
            objids,
        ).select(*sel)
        if which == "forced":
            return forced.withColumn("isdet", F.lit(False)).withColumn(
                "ispatch", F.lit(False)
            )
    if which == "patch":
        return patch_lightcurve(
            forced, det, keys=("rootid", "visit"), value_cols=list(LTCV_COLS)
        )
    raise ValueError(f"unknown which={which!r}")


def assemble_nested(ltcv: DataFrame) -> DataFrame:
    """Per-root nested lightcurve: array of photometry structs sorted by
    mjd (replaces the reference's cursor iteration + Python grouping,
    ``src/ltcv.py:743-793``; SURVEY.md X1/A7).  Also the parquet-export
    format (``src/parquet_export.py:54-93``)."""
    point = F.struct(
        F.col("visit"),
        F.col("midpointmjdtai"),
        F.col("band"),
        F.col("psfflux"),
        F.col("psffluxerr"),
        F.col("isdet"),
        F.col("ispatch"),
    )
    return (
        ltcv.groupBy("rootid")
        .agg(F.array_sort(F.collect_list(point)).alias("lightcurve"))
        .withColumn("nobs", F.size("lightcurve"))
    )


def get_object_infos(
    tables: dict[str, DataFrame],
    resolver: ProcverResolver,
    procver: str,
    objids: DataFrame | None = None,
) -> DataFrame:
    """Per-root object info: resolved position + cross-band detection
    stats (reference ``src/ltcv.py:177-203`` get_object_infos —
    diaobjectid always included via the object map)."""
    from fastdb_spark.queries.objstats import build_objstats

    _, combined = build_objstats(tables, resolver, procver)
    roots = tables["root_diaobject"].select(
        F.col("id").alias("rootid"), "ra", "dec"
    )
    out = combined.join(roots, on="rootid", how="left")
    if objids is not None:
        out = out.join(objids.select("rootid"), on="rootid", how="left_semi")
    return out


def get_hot_ltcvs(
    tables: dict[str, DataFrame],
    resolver: ProcverResolver,
    procver: str,
    detected_since_mjd: float,
    detected_in_last_days: float | None = None,
    mjd_now: float | None = None,
) -> DataFrame:
    """Objects with a detection since a given MJD, with their full patched
    lightcurves (reference ``src/ltcv.py:1290-1518`` ``get_hot_ltcvs``;
    SURVEY.md T6 — a batch filter, not a stream window)."""
    cut = detected_since_mjd
    if detected_in_last_days is not None and mjd_now is not None:
        cut = mjd_now - detected_in_last_days
    det = _extract(
        tables["diasource"],
        tables["diaobject"],
        resolver,
        procver,
        "diasource",
        "diasourceid",
        None,
        mjd_now,
        None,
    )
    hot_roots = (
        det.filter(F.col("midpointmjdtai") >= F.lit(cut))
        .select("rootid")
        .distinct()
    )
    return many_object_ltcvs(
        tables, resolver, procver, which="patch", mjd_now=mjd_now, objids=hot_roots
    )
