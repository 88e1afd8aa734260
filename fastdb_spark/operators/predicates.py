"""Keyword-spec predicate compiler.

Re-expresses the reference's dynamic WHERE-clause builder (reference
``src/db.py:463-577`` ``construct_pgsql_where_clause``; SURVEY.md P1) as a
Column-expression compiler.  The user-facing spec surface is identical:

- field spec ``{"mult": True}``   -> value may be a list: ``f IN (...)``
- field spec ``{"substr": True}`` -> ``f LIKE '%v%'`` (list -> OR of contains)
- field spec ``{"minmax": True}`` -> accepts ``f_min`` / ``f_max`` kwargs:
  ``f >= min`` / ``f <= max``; and cross-field ``f1_minus_f2_min`` /
  ``..._max`` -> ``(f1 - f2) >= v`` / ``<= v``
- plain field                     -> ``f = v`` (or IN for lists with mult)

Everything compiles to native Column expressions, so Catalyst pushes the
resulting conjunction into the parquet scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FieldSpec:
    """Searchable-field description (reference ``src/db.py:463-490``)."""

    def __init__(self, mult: bool = False, substr: bool = False, minmax: bool = False):
        self.mult = mult
        self.substr = substr
        self.minmax = minmax


def _eq_or_isin(field: str, value: Any, spec: FieldSpec) -> Column:
    col = F.col(field)
    if isinstance(value, (list, tuple, set)):
        if not spec.mult:
            raise ValueError(f"field {field} does not accept lists")
        return col.isin(list(value))
    return col == F.lit(value)


def _substr(field: str, value: Any) -> Column:
    col = F.col(field)
    vals = value if isinstance(value, (list, tuple)) else [value]
    cond = None
    for v in vals:
        c = col.contains(str(v))
        cond = c if cond is None else (cond | c)
    return cond


def compile_where(
    fieldspecs: dict[str, FieldSpec],
    criteria: dict[str, Any],
) -> Column | None:
    """Compile search kwargs into one conjunctive Column predicate.

    ``criteria`` keys: a known field name, ``{field}_min`` / ``{field}_max``
    for minmax fields, or ``{f1}_minus_{f2}_min`` / ``..._max`` for
    cross-field differences (reference ``src/db.py:516-560``).
    Returns None when no criteria given (no filtering).
    """
    conds: list[Column] = []
    for key, value in criteria.items():
        if value is None:
            continue
        if key in fieldspecs:
            spec = fieldspecs[key]
            conds.append(_substr(key, value) if spec.substr else _eq_or_isin(key, value, spec))
            continue

        matched = False
        for suffix, op in (("_min", ">="), ("_max", "<=")):
            if not key.endswith(suffix):
                continue
            base = key[: -len(suffix)]
            if "_minus_" in base:
                f1, f2 = base.split("_minus_", 1)
                if f1 in fieldspecs and f2 in fieldspecs and (
                    fieldspecs[f1].minmax or fieldspecs[f2].minmax
                ):
                    diff = F.col(f1) - F.col(f2)
                    conds.append(diff >= F.lit(value) if op == ">=" else diff <= F.lit(value))
                    matched = True
                    break
            elif base in fieldspecs and fieldspecs[base].minmax:
                col = F.col(base)
                conds.append(col >= F.lit(value) if op == ">=" else col <= F.lit(value))
                matched = True
                break
        if not matched:
            raise ValueError(f"unknown search criterion {key!r}")

    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def apply_where(
    df: DataFrame,
    fieldspecs: dict[str, FieldSpec],
    criteria: dict[str, Any],
) -> DataFrame:
    """Filter ``df`` by the compiled predicate (no-op when empty)."""
    cond = compile_where(fieldspecs, criteria)
    return df if cond is None else df.filter(cond)
