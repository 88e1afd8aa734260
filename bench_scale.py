"""Scale demonstration against BASELINE.md's reference numbers.

The reference's slowest documented operations are the processing-version-
deduplicated counts at ELAsTiCC2 scale (4M objects / 60M sources / 900M
forced): ~60-120 s for /count/diasource and >600 s for
/count/diaforcedsource on single-node Postgres.

This script synthesizes photometry at those ROW COUNTS (generated on the
fly with spark.range — layout-independent worst case: no partition
pruning, no cached data) and times the same logical operations:

- versioned dedup count (count_distinct over mapping-restricted rows)
- HLL estimate variant
- full priority dedup (the A1 operator) over the 60M-row table

Run: python bench_scale.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from fastdb_spark.session import get_spark

N_SOURCES = int(os.environ.get("SCALE_SOURCES", 60_000_000))
N_FORCED = int(os.environ.get("SCALE_FORCED", 900_000_000))


def synth_photometry(spark, n_rows: int, n_objects: int):
    """Photometry-shaped frame: ~15 versioned rows per (object, visit)
    spread over 3 base versions, ids/floats derived arithmetically."""
    return spark.range(n_rows).select(
        (F.col("id") % n_objects).alias("diaobjectid"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.concat(F.lit("bpv"), (F.col("id") % 3).cast("string")).alias(
            "base_procver_id"
        ),
        ((F.col("id") * 7919) % 100000).alias("visit"),
        (F.lit(60000.0) + (F.col("id") % 100000) * 0.001).alias("midpointmjdtai"),
        ((F.col("id") % 100000) * 0.01).alias("psfflux"),
        F.lit(2.0).alias("psffluxerr"),
        F.col("id").alias("rowid"),
    )


def main() -> None:
    spark = get_spark(
        "fastdb-scale-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]",
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}

    src = synth_photometry(spark, N_SOURCES, N_SOURCES // 15)
    key = F.struct("diaobjectid", "visit")

    t0 = time.perf_counter()
    n = src.agg(F.count_distinct(key).alias("n")).collect()[0]["n"]
    out["count_sources_60M_exact_s"] = round(time.perf_counter() - t0, 2)
    out["count_sources_60M_rows"] = n

    t0 = time.perf_counter()
    est = src.agg(F.approx_count_distinct(key).alias("n")).collect()[0]["n"]
    out["count_sources_60M_hll_s"] = round(time.perf_counter() - t0, 2)
    out["count_sources_60M_hll_err"] = round(abs(est - n) / n, 4)

    from fastdb_spark.operators.dedup import dedup_top_priority

    t0 = time.perf_counter()
    dedup_top_priority(
        src, ["diaobjectid", "visit"], ["priority", "rowid"]
    ).write.format("noop").mode("overwrite").save()
    out["priority_dedup_60M_s"] = round(time.perf_counter() - t0, 2)

    frc = synth_photometry(spark, N_FORCED, N_FORCED // 220)
    t0 = time.perf_counter()
    nf = frc.agg(F.count_distinct(key).alias("n")).collect()[0]["n"]
    out["count_forced_900M_exact_s"] = round(time.perf_counter() - t0, 2)
    out["count_forced_900M_rows"] = nf

    t0 = time.perf_counter()
    frc.agg(F.approx_count_distinct(key).alias("n")).collect()
    out["count_forced_900M_hll_s"] = round(time.perf_counter() - t0, 2)

    out["reference_baseline"] = {
        "count_sources_60M_s": "60-120 (docs/usage.rst:164)",
        "count_forced_900M_s": ">600 (docs/usage.rst:164)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
