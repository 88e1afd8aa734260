"""fastdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of LSSTDESC/FASTDB.

The reference system (see SURVEY.md) is a Postgres + MongoDB + Kafka + Flask
pipeline for transient-astronomy survey catalogs.  This package re-expresses
its semantics Spark-first:

- catalog tables          -> Parquet tables with explicit StructType schemas
                             (``fastdb_spark.schemas``)
- processing-version      -> broadcast dimension joins + a single-shuffle
  priority fallback          argmax-per-group operator
                             (``fastdb_spark.operators.dedup``)
- lightcurve patch query  -> full-outer join + row-level coalesce
                             (``fastdb_spark.operators.patch``)
- q3c spatial cone/join   -> zone-bucketed equi-join + exact haversine
                             (``fastdb_spark.operators.spatial``)
- object-stats matview    -> one-pass groupBy with min_by/max_by/conditional
                             counts (``fastdb_spark.queries.objstats``)
- Kafka avro alert ingest -> Structured Streaming + foreachBatch idempotent
                             merge (``fastdb_spark.streaming``)

plus large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) under ``fastdb_spark.pipeline``.
"""

__version__ = "0.1.0"
