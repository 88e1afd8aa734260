"""Spatial cone search and small-radius crossmatch.

The reference uses the Postgres q3c extension (reference
``src/services/source_importer.py:430-437`` for the 1-arcsec root
association, ``src/ltcv.py:1229-1260`` for cone search, index expressions
``q3c_ang2ipix`` in ``db/2026-02-02_refactor.sql:133,285,417``; SURVEY.md
J6/Q11/F10).  Spark has no spatial builtin; we use the classic Zones
algorithm (Gray et al., "The Zones Algorithm for Finding Points-Near-a-Point
or Cross-Matching Spatial Datasets", MSR-TR-2006-52):

- **Fixed-center cone search** needs no join at all: a dec band + cos(dec)-
  corrected ra window prefilter (both pushed down to the parquet scan by
  Catalyst) followed by the exact haversine predicate.

- **Crossmatch** buckets both sides into dec zones of height = radius;
  each left row probes its own zone +/- 1 via an exploded zone key, so the
  join is a plain equi-join on ``zone`` (shuffle-partitioned, no cross
  product), refined by an ra-window band condition and the exact haversine.
  At 100 TB the zone key is also the natural partition column for the
  stored catalog, so the shuffle prunes to co-located partitions.

All math is column expressions — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: degrees per zone row; for N-arcsec matching use radius itself.
DEFAULT_ZONE_HEIGHT_DEG = 1.0 / 3600.0


def haversine_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle separation in DEGREES between two (ra, dec) points.

    2*asin(sqrt(sin^2(dd/2) + cos(d1)cos(d2)sin^2(dr/2))) — numerically
    stable at small separations (unlike acos of a dot product).
    """
    dd = F.radians(dec2 - dec1) / 2.0
    dr = F.radians(ra2 - ra1) / 2.0
    a = (
        F.sin(dd) * F.sin(dd)
        + F.cos(F.radians(dec1)) * F.cos(F.radians(dec2)) * F.sin(dr) * F.sin(dr)
    )
    return F.degrees(2.0 * F.asin(F.sqrt(a)))


def cone_search(
    df: DataFrame,
    center_ra: float,
    center_dec: float,
    radius_deg: float,
    ra_col: str = "ra",
    dec_col: str = "dec",
) -> DataFrame:
    """Rows within ``radius_deg`` of a fixed center.

    Mirrors q3c_radial_query with a constant center (reference
    ``src/ltcv.py:1229-1260``).  The dec-band and ra-window prefilters are
    plain comparisons against literals -> parquet row-group pruning; the
    haversine runs only on survivors.
    """
    ra, dec = F.col(ra_col), F.col(dec_col)
    cond = dec.between(center_dec - radius_deg, center_dec + radius_deg)

    # cos(dec)-corrected ra window; near the poles the window covers all ra.
    import math

    cosd = math.cos(math.radians(center_dec))
    max_cosd = math.cos(
        math.radians(min(89.9999, abs(center_dec) + radius_deg))
    )
    if max_cosd > 1e-6:
        dra = min(radius_deg / max_cosd, 180.0)
        lo, hi = center_ra - dra, center_ra + dra
        if lo >= 0.0 and hi < 360.0:
            cond = cond & ra.between(lo, hi)
        else:
            # wraparound: two windows
            cond = cond & (
                ra.between(lo % 360.0, 360.0) | ra.between(0.0, hi % 360.0)
            )
    _ = cosd
    exact = haversine_deg(ra, dec, F.lit(center_ra), F.lit(center_dec)) <= F.lit(
        radius_deg
    )
    return df.filter(cond & exact)


def with_zone(
    df: DataFrame,
    zone_height_deg: float = DEFAULT_ZONE_HEIGHT_DEG,
    dec_col: str = "dec",
    zone_col: str = "zone",
) -> DataFrame:
    """Attach the integer dec-zone id (persisted layout column at scale,
    replacing the reference's ``q3c_ang2ipix`` index expression)."""
    return df.withColumn(
        zone_col, F.floor(F.col(dec_col) / F.lit(zone_height_deg)).cast("long")
    )


def crossmatch(
    left: DataFrame,
    right: DataFrame,
    radius_deg: float,
    left_cols: tuple[str, str] = ("ra", "dec"),
    right_cols: tuple[str, str] = ("ra", "dec"),
    sep_col: str | None = "sep_deg",
) -> DataFrame:
    """All (left, right) pairs within ``radius_deg`` (e.g. the 1-arcsec
    root-object association, reference
    ``src/services/source_importer.py:430-437``).

    Zones equi-join: left rows are exploded into {zone-1, zone, zone+1}
    probe keys, the join runs on the zone key only (hash-partitioned), and
    an ra-band + exact haversine refine.  Column name collisions are
    avoided by prefixing right-side columns that clash.
    """
    lra, ldec = left_cols
    rra, rdec = right_cols
    zh = max(radius_deg, 1e-9)

    clash = set(left.columns) & set(right.columns)
    right_renamed = right
    rmap = {}
    for c in clash:
        right_renamed = right_renamed.withColumnRenamed(c, f"right_{c}")
        rmap[c] = f"right_{c}"
    rra2, rdec2 = rmap.get(rra, rra), rmap.get(rdec, rdec)

    l_probe = left.withColumn(
        "_zone",
        F.explode(
            F.array(
                F.floor(F.col(ldec) / zh).cast("long") - 1,
                F.floor(F.col(ldec) / zh).cast("long"),
                F.floor(F.col(ldec) / zh).cast("long") + 1,
            )
        ),
    )
    r_keyed = right_renamed.withColumn(
        "_zone", F.floor(F.col(rdec2) / zh).cast("long")
    )

    sep = haversine_deg(F.col(lra), F.col(ldec), F.col(rra2), F.col(rdec2))
    # ra band prefilter (cheap, cuts haversine evaluations within a zone);
    # conservative 89.9-degree clamp avoids div-by-zero at the poles.
    ra_band = (
        F.abs(
            (F.col(lra) - F.col(rra2) + 540.0) % 360.0 - 180.0
        )
        * F.cos(F.radians(F.least(F.abs(F.col(ldec)), F.lit(89.9))))
        <= F.lit(radius_deg) * 1.01
    )
    out = l_probe.join(r_keyed, on="_zone", how="inner").filter(
        ra_band & (sep <= F.lit(radius_deg))
    )
    if sep_col:
        out = out.withColumn(sep_col, sep)
    return out.drop("_zone")
