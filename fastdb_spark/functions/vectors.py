"""Dense-vector column functions over ``array<double>`` columns.

Built on ``zip_with`` / ``aggregate`` — JVM-side, no UDFs.  Summation is
sequential left-to-right, matching duckdb's list aggregates bit-for-bit on
doubles (required for oracle parity).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def norm_py(values) -> float:
    """Driver-side twin of :func:`norm`: the same left-to-right double
    fold (0.0 start, ``acc + x*x`` per element) and a correctly-rounded
    IEEE-754 sqrt, so the result is BIT-IDENTICAL to the JVM fold over
    the same doubles (both run binary64 primitive ops in the same
    order; ``math.sqrt`` and ``java.lang.Math.sqrt`` are both exactly
    rounded — regression-tested incl. -0.0 and denormals)."""
    acc = 0.0
    for x in values:
        x = float(x)
        acc += x * x
    return math.sqrt(acc)


def cosine_to_lit(v: Column, query_vec) -> Column:
    """``cosine(v, lit(query_vec))`` with the query-side norm folded
    ONCE on the driver instead of re-folded per row (guide §1.2: the
    query norm is loop-invariant across the corpus scan).  The emitted
    expression is ``dot(v, q) / (norm(v) * qn)`` — the same primitive
    double ops in the same order as :func:`cosine`, with the constant
    ``norm(q)`` subtree replaced by its (bit-identical, see
    :func:`norm_py`) value — so scores are unchanged to the last ulp.
    Non-finite inputs (or an overflowing norm) fall back to the plain
    fold."""
    data = [float(x) for x in query_vec]
    qn = norm_py(data) if all(_finite(x) for x in data) else float("nan")
    if not _finite(qn):
        return cosine(v, double_array_lit(data))
    return dot(v, double_array_lit(data)) / (norm(v) * F.lit(qn))


def as_double_array(a: Column) -> Column:
    return a.cast("array<double>")


def let1(bound: Column, body) -> Column:
    """Evaluate ``bound`` ONCE per row and pass it to ``body`` as a
    lambda variable: ``element_at(transform(array(bound), x ->
    body(x)), 1)``.

    This is the portable way to hoist a loop-invariant subexpression
    out of a higher-order-function lambda: the optimizer cannot inline
    a lambda variable back into its use sites, whereas a single-use
    projected alias is re-inlined by CollapseProject into the consuming
    lambda — the r12 finding that left ``with_ivf_cluster``'s per-row
    ``norm(v)`` re-folding once per centroid.  Values are the plain
    composition (the lambda variable carries exactly the value of
    ``bound``, nulls included), so results are bit-identical."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def _finite(x: float) -> bool:
    return x == x and x not in (float("inf"), float("-inf"))


def double_array_lit(values) -> Column:
    """``array<double>`` literal built as ONE SQL expression string.

    ``F.lit(list)`` round-trips py4j once PER ELEMENT (~1.3 ms each on
    this JVM): a 64-dim query vector costs ~80 ms of driver time and a
    25x64 centroid list ~2 s — per *plan construction*, which the
    ANN/semantic gates pay on every call (r12 profile: the single
    largest driver gap in ``semantic_dedup``).  One ``expr()`` string
    is a single py4j call and parses JVM-side in ~1 ms.  ``repr(float)``
    is the shortest round-trip decimal form and SQL's ``xD`` literal
    parses via correctly-rounded ``Double.parseDouble``, so the parsed
    doubles are BIT-IDENTICAL to the ``F.lit`` path (regression-tested
    incl. -0.0, denormals, and DBL_MAX).  Non-finite values fall back
    to ``F.lit`` (SQL has no inf/nan double literal)."""
    data = [float(x) for x in values]
    if not all(_finite(x) for x in data):
        return F.lit(data).cast("array<double>")
    return F.expr(
        "CAST(array(" + ",".join(repr(x) + "D" for x in data)
        + ") AS array<double>)"
    )


def nested_double_array_lit(vectors) -> Column:
    """``array<array<double>>`` literal as ONE SQL expression string —
    the centroid/plane-list shape (see :func:`double_array_lit`; the
    per-element py4j cost there is quadratic in practice for nested
    lists: 25x64 centroids measured 1.0-2.1 s per construction, the
    expr string 6 ms, values bit-identical)."""
    data = [[float(x) for x in v] for v in vectors]
    if not all(_finite(x) for v in data for x in v):
        return F.lit(data).cast("array<array<double>>")
    return F.expr(
        "CAST(array("
        + ",".join(
            "array(" + ",".join(repr(x) + "D" for x in v) + ")" for v in data
        )
        + ") AS array<array<double>>)"
    )


def int_array_lit(values) -> Column:
    """``array<int>`` literal as one SQL expression string (same py4j
    rationale as :func:`double_array_lit`; exact — integers print
    exactly)."""
    return F.expr(
        "CAST(array(" + ",".join(str(int(x)) for x in values)
        + ") AS array<int>)"
    )
