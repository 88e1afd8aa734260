"""Capture .explain("formatted") for declared queries into plans/$PLANS_ROUND/
(default r13).

Usage:
    python tools/capture_plans.py before <gate> [<gate> ...]
    python tools/capture_plans.py after  <gate> [<gate> ...]

For index/roundtrip gates the returned frame is a plain readback of the
persisted table — the heavy work runs eagerly inside the query function —
so the capture still runs the function (the side effects happen), then
records the plan of the frame the bench's noop sink forces.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)


def main() -> None:
    phase = sys.argv[1]
    gates = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from fastdb_spark.session import get_spark

    spark = get_spark("fastdb-plans", master=f"local[{cpus}]")
    qmap = entrymod.queries()
    for gate in gates:
        df = qmap[gate](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{gate}_{phase}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        from fastdb_spark.cachereg import release_staged

        release_staged()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
