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


def tiny_local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a small DataFrame from driver-side ``rows`` (sequence of
    tuples) with an explicit comma-separated ``"name type"`` schema.
    Empty input falls back to ``createDataFrame([], schema)`` (pandas
    cannot carry a zero-row typed frame through the converter)."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    names = [f.strip().split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(dict(zip(names, map(list, zip(*rows)))))
    return spark.createDataFrame(pdf, schema=schema)
