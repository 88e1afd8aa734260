"""Lightcurve "patch" — full-outer join of forced photometry vs detections.

The reference's workhorse query shape (reference ``src/ltcv.py:714-741``;
SURVEY.md J3): forced photometry FULL OUTER JOIN detections on
``(rootid, visit)``, with **row-level** preference for the forced side —
``CASE WHEN f.rootid IS NULL THEN s.x ELSE f.x END`` for every column —
plus two derived flags:

- ``isdet``   — a detection exists for this (rootid, visit)
- ``ispatch`` — no forced row exists; the detection "patches" the hole
                (forced photometry arrives >=24h late, SURVEY.md T5)

Scale notes: both inputs are already deduplicated per (rootid, visit), so
the join is 1:1.  Spark plans a sort-merge join on the two shuffled sides;
when the query is restricted to a small object list (the common API case,
J5 semi-join first) AQE downgrades it to a broadcast join at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def patch_lightcurve(
    forced: DataFrame,
    sources: DataFrame,
    keys: Sequence[str] = ("rootid", "visit"),
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer patch join, reference ``src/ltcv.py:714-741`` semantics.

    Returns ``keys + value_cols + [isdet, ispatch]``.  Row-level preference:
    if a forced row exists, ALL its values win (even NULL ones); otherwise
    the detection's values are used.
    """
    if value_cols is None:
        shared = [c for c in forced.columns if c in set(sources.columns)]
        value_cols = [c for c in shared if c not in set(keys)]

    # A full-outer join coalesces the key columns, so "forced side present"
    # can't be probed via keys; explicit presence flags added pre-join
    # distinguish "row absent" from "value NULL".
    f = forced.select(
        *keys,
        F.lit(True).alias("_f_present"),
        *[F.col(c).alias(f"_f_{c}") for c in value_cols],
    )
    s = sources.select(
        *keys,
        F.lit(True).alias("_s_present"),
        *[F.col(c).alias(f"_s_{c}") for c in value_cols],
    )
    joined = f.join(s, on=list(keys), how="full_outer")

    forced_present = F.col("_f_present").isNotNull()
    det_present = F.col("_s_present").isNotNull()

    out_cols = [F.col(k) for k in keys]
    for c in value_cols:
        out_cols.append(
            F.when(forced_present, F.col(f"_f_{c}"))
            .otherwise(F.col(f"_s_{c}"))
            .alias(c)
        )
    out_cols.append(det_present.alias("isdet"))
    out_cols.append((~forced_present).alias("ispatch"))
    return joined.select(*out_cols)
