"""SparkSession construction with scale-appropriate defaults.

Local test boxes run ``local[N]`` (single JVM); production is a multi-
executor cluster.  Everything here is cluster-safe: the knobs below tune
shuffle parallelism, adaptive execution, and Arrow transfer — none of them
assume local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "fastdb-spark"


def builder(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession.Builder:
    """Return a configured SparkSession builder.

    ``master=None`` leaves master selection to spark-submit / the cluster
    manager (correct for production); tests and bench pass ``local[N]``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # Local mode: one partition per core avoids tiny-task overhead.
        # On a real cluster AQE coalesces, so a higher static value is fine.
        shuffle_partitions = cpus

    b = (
        SparkSession.builder.appName(app_name)
        # Adaptive execution: runtime shuffle-partition coalescing, skew-join
        # splitting, and dynamic join-strategy switching.  Essential at 100 TB
        # where static planning misguesses cardinalities.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # The catalog's dimension tables (processing versions, bpv mappings)
        # are tiny; raise the broadcast threshold so they always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Joins on (rootid, visit) over tables bucketed by rootid alone
        # may reuse the storage distribution instead of re-shuffling
        # (subset co-partitioning) — the patch join on the engine layout
        # is Exchange-free with this.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Arrow for any pandas_udf / toPandas path (10-100x over pickling).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The reference pins UTC everywhere (source_importer.py:1-12 documents
        # the TZ pitfalls); so do we — also required for duckdb-oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # Timestamps written by external tools (duckdb) may be INT96/micros.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # Parquet files written with isAdjustedToUTC=false would otherwise
        # surface as TIMESTAMP_NTZ, which unix_micros() and window() reject;
        # with the session TZ pinned UTC the LTZ reading is instant-identical.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Runtime bloom-filter join pruning: when one join side carries a
        # selective filter (the id-list semi-join pattern — P5/J5), inject
        # a bloom filter of its keys into the other side's scan so rows
        # that cannot match are dropped BEFORE the shuffle.  The size
        # thresholds stay at their defaults (creation side <= 10 MB,
        # application side >= 10 GB scanned) — i.e. this activates exactly
        # in the 100 TB regime it exists for, never on test-size inputs.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # InferFiltersFromGenerate turns explode(f(text)) into an inferred
        # `size(f(text)) > 0` filter and pushes it into the scan — so every
        # expensive generator input (shingle arrays, n-grams, signatures)
        # is computed TWICE per row, once in the scan filter and once in
        # the projection.  The rule only pays when many rows carry empty
        # arrays (ours essentially never do: sketches derive from non-null
        # text); measured on the sketch pipelines it costs 40-50%.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if master:
        b = b.master(master)
        if master.startswith("local"):
            # local mode: the driver heap IS the cluster memory; must be
            # set before the JVM starts (no-op on an existing session)
            # 16g default: measured ~25% faster than a 48g heap on the
            # bench workload (G1 first-touch/region overhead); memory-
            # hungry jobs (bench_scale) raise it via SPARK_DRIVER_MEMORY
            b = b.config(
                "spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
            )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b


def tune_micro_batch_shuffle(spark: SparkSession, ceiling: int = 64) -> None:
    """Clamp ``spark.sql.shuffle.partitions`` to the session's default
    parallelism for micro-batch workloads (streaming ``foreachBatch``
    upserts: batches are batch-sized, not table-sized, and the default
    200 shuffle partitions turn every merge into confetti tasks).

    Shared by all three streaming entry points (alert ingest, text dedup
    index, media index) — ADVICE r8: platforms where AQE manages the
    value report a NON-NUMERIC conf (``'auto'``), and a bare ``int()``
    killed the stream at start; a non-numeric value means the engine is
    already sizing shuffles at runtime, so leave it unchanged."""
    try:
        current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return
    if current > ceiling:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    **kwargs,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    spark = builder(app_name, master, **kwargs).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_spark(cores: int | None = None, app_name: str = DEFAULT_APP_NAME) -> SparkSession:
    """Local-mode session used by tests and bench."""
    cpus = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return get_spark(app_name, master=f"local[{cpus}]", shuffle_partitions=cpus)
