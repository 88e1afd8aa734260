"""Benchmark harness: runs every gate query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect).  Times are single-shot after a session warmup — the point
is plan quality (shuffles, pushdown, broadcast), not JIT micro-variance.

Contention discipline (VERDICT r10 #3 — three rounds of driver BENCH rows
were poisoned by co-tenancy min-of-2 could not reject):

- gates whose current best exceeds ``SPARK_GRAFT_BENCH_SLOW_S`` (default
  5 s) automatically get extra runs up to ``SPARK_GRAFT_BENCH_MAX_RUNS``
  (default 3) — the expensive gates are exactly where one contended run
  distorts a min-of-2;
- the sidecar records every per-run sample (not just the min), so a
  hot-host artifact is visibly hot (wide spread) instead of silently
  inflated;
- host-contention sentinels ride in the payload: loadavg at start/end
  and the /proc/stat busy+steal fraction over the whole bench — a busy
  fraction far above this process's own footprint means co-tenancy, and
  the judge can discount the artifact without re-measuring;
- ``SPARK_GRAFT_BENCH_QUIET=1`` writes the sidecar to BENCH_QUIET.json —
  the structured quiet-host record diffed against the driver's
  BENCH_r{N} artifact, replacing prose notes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import __spark_entry__ as entrymod
from fastdb_spark.session import get_spark


def _force(df) -> int:
    # noop datasource executes the whole plan without materializing output
    df.write.format("noop").mode("overwrite").save()
    return 0


def _host_cpu_sample() -> tuple[int, int, int] | None:
    """(total, idle, steal) jiffies from the /proc/stat cpu line —
    deltas over the bench give the HOST busy fraction, co-tenants
    included, which a per-process timer cannot see.  Returns None when
    /proc/stat is unreadable (ADVICE r11 #3: a zero sample would make
    the busy fraction compute to 1.0 and a clean run read as fully
    contended; absence must stay distinguishable from contention)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return None
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return (sum(vals), idle, steal)


def _contended_gates(
    samples: dict[str, list[float]], timings: dict[str, float]
) -> list[str]:
    """Self-discounting artifact (VERDICT r11 next-round #7): the gates
    whose own per-run samples show contention — spread > 1.5x between
    the best and worst run on a non-trivial (>0.5 s) gate.  Together
    with the host steal flag, the driver artifact names its own suspect
    rows without cross-referencing the quiet sidecar."""
    return sorted(
        name
        for name, seen in samples.items()
        if timings[name] > 0.5 and max(seen) > 1.5 * timings[name]
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("fastdb-spark-bench", master=f"local[{cpus}]")
    # warmup: JVM + parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    total = 0.0
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    max_runs = max(runs, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "3")))
    slow_s = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_S", "5"))
    load0 = os.getloadavg()
    cpu0 = _host_cpu_sample()
    for name, fn in sorted(entrymod.queries().items()):
        best = None
        seen: list[float] = []
        while True:
            # time build + execute: some operators stage intermediates
            # eagerly (persist+count), so timing only the final action
            # would undercount.  min-of-N: the shared test host shows up
            # to 3x run-to-run CPU-steal variance, and the first run pays
            # one-time whole-stage-codegen compilation; the min is the
            # reproducible per-query cost.
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _force(df)
            dt = time.perf_counter() - t0
            seen.append(round(dt, 4))
            best = dt if best is None else min(best, dt)
            # each query self-contained: release tracked stages, then
            # drop any remaining cached blocks — no cross-run reuse
            from fastdb_spark.cachereg import release_staged
            from fastdb_spark.operators.paginate import unpersist_pages

            release_staged()
            unpersist_pages()
            spark.catalog.clearCache()
            if len(seen) < runs:
                continue
            # expensive gates get extra runs: min-of-2 cannot reject a
            # host that was busy for both runs, and the >5 s gates are
            # where co-tenancy distorted three rounds of driver artifacts
            if best > slow_s and len(seen) < max_runs:
                continue
            break
        timings[name] = round(best, 4)
        samples[name] = seen
        total += best
        print(f"# {name}: {best:.3f}s {seen}", file=sys.stderr)
    load1 = os.getloadavg()
    cpu1 = _host_cpu_sample()
    if cpu0 is not None and cpu1 is not None:
        dt_total = max(cpu1[0] - cpu0[0], 1)
        # host-wide busy/steal fraction over the bench window — far
        # above this process's own footprint => co-tenant contention
        busy_frac = round(1.0 - (cpu1[1] - cpu0[1]) / dt_total, 4)
        steal_frac = round((cpu1[2] - cpu0[2]) / dt_total, 4)
    else:
        # sentinel unavailable != contended (ADVICE r11 #3)
        busy_frac = None
        steal_frac = None
    host = {
        "loadavg_start": round(load0[0], 2),
        "loadavg_end": round(load1[0], 2),
        "cpu_busy_frac": busy_frac,
        "cpu_steal_frac": steal_frac,
    }
    contended = _contended_gates(samples, timings)
    host_contended = steal_frac is not None and steal_frac > 0.02

    payload = {
        "metric": "sum_query_seconds",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # self-describing sidecar (VERDICT r5 #9): the sidecar alone must
        # identify the run even when the driver's stdout capture truncates
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_queries": len(timings),
        "host": host,
        "host_contended": host_contended,
        "contended": contended,
        "runs": {"base": runs, "max": max_runs, "slow_s": slow_s},
        # the persisted-index gates build on run 1 and probe on later
        # runs (their declared train-once semantics): the min is
        # probe-only (VERDICT r12 #5 — the timing contract, named)
        "probe_only": sorted(getattr(entrymod, "PERSISTED_INDEX_GATES", ())),
    }
    print(json.dumps(payload))
    # stable sidecar: the driver's stdout capture has truncated the tail of
    # this line before (BENCH_r04 parsed=null); the full per-query map in a
    # file keeps round-over-round diffs independent of capture length.
    # SPARK_GRAFT_BENCH_QUIET=1 -> BENCH_QUIET.json, the structured
    # quiet-host record the judge diffs against the driver artifact
    # (VERDICT r10 #3); per-run samples ride only in the sidecar.
    quiet = os.environ.get("SPARK_GRAFT_BENCH_QUIET") == "1"
    base = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(
        base, "BENCH_QUIET.json" if quiet else "BENCH_LOCAL.json"
    )
    with open(sidecar, "w") as f:
        json.dump({**payload, "samples": samples}, f, indent=1)
    # ALSO keyed by core count (VERDICT r12 #4: the driver's 8-core
    # scaling run clobbered the 32-core full per-gate map — two runs at
    # different $SPARK_GRAFT_CPUS must both leave their full maps on
    # disk; the unkeyed file above stays the latest-run view)
    keyed = sidecar.replace(".json", f"_c{cpus}.json")
    with open(keyed, "w") as f:
        json.dump({**payload, "samples": samples}, f, indent=1)
    # FINAL line: the driver keeps only the LAST ~2000 chars of stdout and
    # parses the tail as JSON — the full payload line above is ~4 KB, so
    # its head gets cut and parsing fails (BENCH_r05/r06 parsed=null,
    # VERDICT r6 #7).  Emit a compact self-describing line that fits the
    # window: headline metric + the slowest queries, with the full map
    # delegated to the sidecar.
    compact = dict(payload)
    # keep the compact line bounded: name at most the 10 most expensive
    # contended gates (the sidecar holds the full list + samples)
    if len(contended) > 10:
        compact["contended"] = sorted(
            contended, key=lambda n: -timings[n]
        )[:10]
        compact["contended_omitted"] = len(contended) - 10
    slow = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:20]
    )
    compact["queries"] = slow
    compact["queries_omitted"] = len(timings) - len(slow)
    compact["queries_full"] = os.path.basename(sidecar)
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1500 and len(slow) > 1:
        slow.pop(next(reversed(slow)))
        compact["queries"] = slow
        compact["queries_omitted"] = len(timings) - len(slow)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
