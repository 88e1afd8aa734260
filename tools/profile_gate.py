"""Min-of-N quiet-host profiler for a single gate (VERDICT r9 #3
discipline: a noisy gate needs a reproduced number with an explanation,
not another co-tenancy shrug).

Runs one named gate K times in ONE session (bench.py conditions: noop
sink, cache released between runs), prints per-run wall times plus the
executor-side aggregate metrics that separate "the plan got slower"
from "the host was busy": total task time, shuffle bytes written, and
GC time, via the SparkListener-free route of diffing
``sc.statusTracker``-independent accumulators exposed on
``spark.sparkContext._jsc.sc().statusStore()``... which pyspark does
not expose portably — so instead each run records wall time AND
process CPU time: a run where wall >> cpu-delta is host steal, a run
where cpu-delta itself grows is a real plan cost.

Usage: python tools/profile_gate.py <gate> [runs] [parallelism]
       SF_DIR=/root/testdata/sf0.1 python tools/profile_gate.py alert_reconstruct 5
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from fastdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    gate = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fastdb-profile", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    fn = entry_mod.queries()[gate]
    out = []
    for i in range(runs):
        cpu0 = time.process_time()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        dcpu = time.process_time() - cpu0
        from fastdb_spark.cachereg import release_staged
        from fastdb_spark.operators.paginate import unpersist_pages

        release_staged()
        unpersist_pages()
        spark.catalog.clearCache()
        out.append({"run": i, "wall_s": round(dt, 3),
                    "driver_cpu_s": round(dcpu, 3)})
        print(json.dumps(out[-1]), file=sys.stderr)
    best = min(r["wall_s"] for r in out)
    print(json.dumps({"gate": gate, "sf_dir": sf_dir, "cpus": cpus,
                      "runs": out, "min_wall_s": best}))


if __name__ == "__main__":
    main()
