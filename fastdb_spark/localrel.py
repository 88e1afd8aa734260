"""KB-sized driver-side tables as Arrow-backed local relations.

``spark.createDataFrame(list_of_tuples)`` parallelizes the PICKLED rows
over ``defaultParallelism`` Python-RDD partitions: every evaluation of
the frame (each broadcast build, each reuse in another action) runs a
Spark job whose tasks spin up Python workers to unpickle a handful of
rows — measured ~0.3-0.6 s per evaluation on local[32], paid by every
query that ships a tiny mapping/id-list/query table (guide §4: keep
Python out of the execution path; §6: Arrow for driver transfers).

Routing the same rows through pandas makes the frame an Arrow-backed
LocalRelation: same rows, same explicit schema, no Python worker and no
job at all when it is broadcast.  Doubles cross Arrow bit-exactly, so
values are identical to the pickled path (this matters for oracle
hash parity on double-typed columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tiny_local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a small DataFrame from driver-side ``rows`` (sequence of
    tuples) with an explicit schema — a DDL string (``"name type, ..."``)
    or a typed ``StructType``.

    r13: field names come from ``StructType.fromDDL`` instead of a
    string split (ADVICE r12: ``decimal(10,2)`` / ``map<string,int>``
    commas silently misaligned names with columns), and a ``StructType``
    schema routes timestamp columns through tz-aware
    ``datetime64[ns, UTC]`` so typed row-builders (the spectrum-workflow
    API tables, tokenizer merges) take the Arrow LocalRelation path too
    — plain ``object``-dtype datetimes make the Arrow converter fall
    back to pickled rows.  The engine pins the session timezone to UTC,
    so the UTC interpretation of (always tz-aware at the call sites)
    timestamps is instant-identical to the legacy path.  Empty input
    falls back to ``createDataFrame([], schema)`` (pandas cannot carry
    a zero-row typed frame through the converter)."""
    from pyspark.sql.types import StructType, TimestampType

    rows = list(rows)
    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if not rows:
        return spark.createDataFrame([], st)
    import pandas as pd

    pdf = pd.DataFrame(dict(zip(st.fieldNames(), map(list, zip(*rows)))))
    for f in st.fields:
        if isinstance(f.dataType, TimestampType):
            pdf[f.name] = pd.to_datetime(pdf[f.name], utc=True)
    return spark.createDataFrame(pdf, schema=st)
