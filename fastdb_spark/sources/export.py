"""Result export sinks (reference ``src/parquet_export.py:6-137`` S8,
``src/services/long_query_runner.py:159-165`` S9).

The reference exports via Postgres pg_parquet COPY with OFFSET/LIMIT
chunking; Spark writes are natively parallel and chunked by partition, so
the export is one job: join objects with nested per-root lightcurve arrays
and write zstd parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fastdb_spark.queries.ltcv import assemble_nested


def export_lightcurves_parquet(
    ltcv_flat: DataFrame,
    root_positions: DataFrame | None,
    path: str,
    compression: str = "zstd",
) -> None:
    """Nested export: one row per root with a sorted lightcurve struct
    array (the reference's ``array_agg((visit, mjd, band, flux, err)::
    srcrow ORDER BY mjd)`` shape)."""
    nested = assemble_nested(ltcv_flat)
    if root_positions is not None:
        nested = nested.join(root_positions, on="rootid", how="left")
    nested.write.mode("overwrite").option("compression", compression).parquet(path)


def export_csv(df: DataFrame, path: str) -> None:
    """Long-query csv result sink."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def export_pandas_pickle(df: DataFrame, path: str) -> None:
    """Pickled-DataFrame sink (small results only — collects to driver,
    same contract as the reference's query-runner pickle format)."""
    df.toPandas().to_pickle(path)


def export_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """JSON-lines sink — the interchange format LLM data pipelines live
    on (one JSON object per line, gzip-compressed shards).  Spark's json
    writer IS jsonl (one object per line, one shard per partition), so
    this is a single parallel job; binary columns come out base64."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source; pass ``schema`` (DDL string) to skip the
    inference scan — at 100 TB schema inference is a full extra pass, so
    production callers should always pass it."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)
