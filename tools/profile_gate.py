"""Min-of-N quiet-host profiler for a single gate (VERDICT r9 #3
discipline: a noisy gate needs a reproduced number with an explanation,
not another co-tenancy shrug).

Runs one named gate K times in ONE session (bench.py conditions: noop
sink, cache released between runs) and prints per-run wall times.  The
run-index PROFILE is the signal: a gate whose cost decays run-over-run
(run0 >> run1 > steady) is paying JVM whole-stage-codegen compilation
and JIT tiering, not plan cost; a gate whose steady state moved
between code versions has a real plan change; and re-running at a
different parallelism separates shuffle-width effects from both.
``driver_cpu_s`` is the PYTHON CLI process CPU only — in local-mode
PySpark, Catalyst analysis and task execution burn CPU in the JVM
child and Python workers, NOT here, so this column can only show that
the CLI itself was idle (it cannot detect a plan regression; use the
run-index profile and cross-version steady states for that).

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
