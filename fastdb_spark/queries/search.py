"""Object search over the objstats gold table (reference
``src/ltcv.py:1060-1287`` ``object_search``; SURVEY.md §7 phase 1).

Search criteria (the documented API surface): detection-count bounds,
first/last/peak MJD bounds, magnitude bounds, S/N-count bounds — all
compiled by the keyword-spec predicate compiler (P1) — plus an optional
cone constraint (J6) against the object positions.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.operators.predicates import FieldSpec, apply_where
from fastdb_spark.operators.spatial import cone_search

#: searchable objstats fields (mirrors the reference's object_search kwargs)
SEARCH_FIELDS = {
    "ndets": FieldSpec(minmax=True),
    "ndets24": FieldSpec(minmax=True),
    "ndets23": FieldSpec(minmax=True),
    "ndets22": FieldSpec(minmax=True),
    "ndets21": FieldSpec(minmax=True),
    "nsn10": FieldSpec(minmax=True),
    "nsn7": FieldSpec(minmax=True),
    "nsn5": FieldSpec(minmax=True),
    "firstdetmjd": FieldSpec(minmax=True),
    "lastdetmjd": FieldSpec(minmax=True),
    "maxdetmjd": FieldSpec(minmax=True),
    "maxdetflux": FieldSpec(minmax=True),
    "band": FieldSpec(mult=True),
}


def object_search(
    objstats: DataFrame,
    positions: DataFrame | None = None,
    ra: float | None = None,
    dec: float | None = None,
    radius_deg: float | None = None,
    **criteria: Any,
) -> DataFrame:
    """Filter the objstats gold table by keyword criteria + optional cone.

    ``positions`` is a (rootid, ra, dec) frame (root_diaobject or the
    weighted-position gold table); the cone restricts via a semi-join so
    the stats table never widens.
    """
    out = apply_where(objstats, SEARCH_FIELDS, criteria)
    if radius_deg is not None:
        if positions is None or ra is None or dec is None:
            raise ValueError("cone search needs positions + ra/dec/radius")
        hit_roots = cone_search(positions, ra, dec, radius_deg).select(
            F.col("id").alias("rootid") if "id" in positions.columns else F.col("rootid")
        )
        out = out.join(hit_roots, on="rootid", how="left_semi")
    return out
