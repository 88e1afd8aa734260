"""Reusable relational operators the reference implements as generated SQL.

Each module maps one family from SURVEY.md §2:

- ``dedup``       — priority / first-seen argmax-per-group dedup (A1, A2, W2)
- ``patch``       — forced-vs-detection full-outer lightcurve patch join (J3)
- ``spatial``     — cone search + 1-arcsec crossmatch (J6, Q11, F10)
- ``predicates``  — the keyword-spec WHERE-clause compiler (P1)
- ``rangejoin``   — bounded time-interval join for alert reconstruction (J9)
- ``paginate``    — deterministic OFFSET/LIMIT pagination + random sample (O3, O4)
"""

from fastdb_spark.operators.dedup import dedup_first_seen, dedup_top_priority
from fastdb_spark.operators.patch import patch_lightcurve
from fastdb_spark.operators.predicates import compile_where
from fastdb_spark.operators.spatial import cone_search, crossmatch

__all__ = [
    "dedup_top_priority",
    "dedup_first_seen",
    "patch_lightcurve",
    "compile_where",
    "cone_search",
    "crossmatch",
]
