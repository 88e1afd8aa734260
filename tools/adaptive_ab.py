"""Interleaved one-session A/B of cachereg.stage_adaptive (r13): for
each gate, alternate runs with the adaptive narrowing ON and OFF inside
one session, min per side — host noise hits both sides equally, unlike
consecutive whole-session A/Bs (the r12/r13 contention lesson).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        AB_PAIRS=3 python tools/adaptive_ab.py <gate> [<gate> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    pairs = int(os.environ.get("AB_PAIRS", "3"))

    import __spark_entry__ as entrymod
    from fastdb_spark import cachereg
    from fastdb_spark.session import get_spark

    spark = get_spark("fastdb-adaptive-ab", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qmap = entrymod.queries()
    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "pairs": pairs,
                 "loadavg_start": round(os.getloadavg()[0], 2)}

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        from fastdb_spark.operators.paginate import unpersist_pages

        cachereg.release_staged()
        unpersist_pages()
        spark.catalog.clearCache()
        return round(dt, 4)

    for gate in sys.argv[1:]:
        fn = qmap[gate]
        on: list[float] = []
        off: list[float] = []
        for _ in range(pairs):
            cachereg.ADAPTIVE_ENABLED = True
            on.append(run_once(fn))
            cachereg.ADAPTIVE_ENABLED = False
            off.append(run_once(fn))
        cachereg.ADAPTIVE_ENABLED = True
        out[gate] = {
            "on_min": min(on), "off_min": min(off),
            "speedup": round(min(off) / min(on), 3),
            "on": on, "off": off,
        }
        print(
            f"# {gate}: on {min(on):.3f}s off {min(off):.3f}s "
            f"({min(off)/min(on):.2f}x) on={on} off={off}",
            file=sys.stderr,
        )
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
