"""Driver-simulation sweep: stock SparkSession, duckdb oracle, value-hash compare.

Mimics the adjudicator: NO fastdb_spark.session confs, fresh process.
THE mandatory pre-round-end check (docs/ROUND_NOTES.md) — a pytest can't
replace it because same-JVM sessions share conf, and two hash-parity bugs
(signed zero, HUGEINT widening) plus a cogroup analyzer difference were
only ever caught here.

Usage: python tools/stock_sweep.py [query ...]   # default: all
       SF_DIR=/root/testdata/sf0.1 python tools/stock_sweep.py
Writes /tmp/stock_sweep.json; prints FAILED list last.
"""
import hashlib
import json
import os
import sys
import traceback

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

# must run with the repo as cwd so executors can import fastdb_spark
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)
import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def value_hash(pdf: pd.DataFrame) -> str:
    parts = []
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype.kind == "f":
            col = col.round(9)
        parts.append(col.astype(str).str.cat(sep="|"))
    return hashlib.md5("||".join(parts).encode()).hexdigest()


def main():
    only = sys.argv[1:] or None
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "12g")
        .appName("stock-sweep").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}

    # conf-leak gate: keys any gate has ever touched or could plausibly
    # touch, with each key's Spark default so "explicitly set to the
    # default" (e.g. a try/finally restore) is not a false positive.
    WATCHED_CONF = {
        "spark.sql.legacy.parquet.nanosAsLong": "false",
        "spark.sql.analyzer.failAmbiguousSelfJoin": "true",
        "spark.sql.session.timeZone": None,
        "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.ansi.enabled": None,
    }

    def conf_snapshot():
        return {
            k: spark.conf.get(k, None) or default
            for k, default in WATCHED_CONF.items()
        }

    # the Catalog applies its documented session normalizations
    # (nanosAsLong for NANOS-timestamp events, inferTimestampNTZ off) the
    # first time a table is touched and leaves them set ON PURPOSE — the
    # conf must still be in effect when lazy plans over its tables
    # execute.  Take the baseline AFTER one Catalog touch so the gate
    # flags only undocumented per-query drift.
    from fastdb_spark.catalog import Catalog

    Catalog(spark, SF_DIR).table("events").limit(1).collect()
    baseline_conf = conf_snapshot()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row = {}
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            row["spark_rows"] = len(spdf)
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                row["oracle_rows"] = len(opdf)
                row["rows_match"] = len(spdf) == len(opdf)
                a, b = canon(spdf), canon(opdf)
                row["schema_match"] = list(a.columns) == list(b.columns)
                try:
                    row["hash_match"] = bool(
                        row["schema_match"] and value_hash(a) == value_hash(b)
                    )
                    if not row["hash_match"] and row["schema_match"]:
                        # find first differing column
                        for c in a.columns:
                            av, bv = a[c].astype(str), b[c].astype(str)
                            if not av.equals(bv):
                                d = av != bv
                                row["first_diff"] = {
                                    "col": c,
                                    "spark": av[d].head(3).tolist(),
                                    "duck": bv[d].head(3).tolist(),
                                }
                                break
                except Exception as ex:
                    row["hash_match"] = False
                    row["hash_err"] = str(ex)[:200]
            else:
                row["err"] = "no_oracle"
        except Exception:
            row["err"] = traceback.format_exc()[-600:]
        # conf-leak gate: no query may leave the shared session conf
        # modified (the nanosAsLong leak class — VERDICT r3 wrong #3)
        now = conf_snapshot()
        leaked = {
            k: (baseline_conf.get(k), now.get(k))
            for k in set(baseline_conf) | set(now)
            if baseline_conf.get(k) != now.get(k)
        }
        if leaked:
            row["conf_leak"] = leaked
            row.setdefault("err", f"conf leak: {leaked}")
        results[name] = row
        ok = row.get("hash_match")
        tag = "OK" if ok else ("rows-only" if row.get("err") == "no_oracle" else "FAIL")
        print(f"{tag:9s} {name}: rows={row.get('spark_rows')} vs {row.get('oracle_rows')}", flush=True)
        if tag == "FAIL":
            print(json.dumps(row, default=str)[:1200], flush=True)

    bad = [n for n, r in results.items()
           if r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False]
    print("\nFAILED:", bad)
    json.dump(results, open("/tmp/stock_sweep.json", "w"), indent=1, default=str)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
