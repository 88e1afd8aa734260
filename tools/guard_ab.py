"""One-off clean A/B for the minhash bucket-guard price (VERDICT r6 #3):
capped (DEFAULT_MAX_BUCKET count-window guard) vs uncapped fast-path
minhash over the 1M-doc synthetic slice, min-of-2 within one session on
a quiet host.  Replaces the contradictory 41.5/54.9 pair in
BENCH_SCALE.json with one self-consistent number."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fastdb_spark.cachereg import release_staged
from fastdb_spark.session import get_spark


def main() -> None:
    import bench_scale

    spark = get_spark(
        "fastdb-guard-ab",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]",
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fastdb_spark.pipeline.dedup import minhash_lsh_pairs

    n = int(os.environ.get("SCALE_NEARDUP_DOCS", 1_000_000))
    docs = bench_scale.synth_documents(spark, n).where(F.col("doc_id") < n)
    out = {"docs_n": n, "loadavg_start": os.getloadavg()[0]}
    label = f"{n // 1_000_000}M" if n >= 1_000_000 else str(n)
    best_by_tag = {}
    for tag, kw in (("capped", {}), ("uncapped", {"max_bucket_size": None})):
        best, pairs = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = minhash_lsh_pairs(docs, hash_impl="fast", **kw).count()
            dt = time.perf_counter() - t0
            release_staged()
            best = dt if best is None else min(best, dt)
        best_by_tag[tag] = best
        out[f"minhash_fast_{tag}_{label}_s"] = round(best, 2)
        out[f"minhash_fast_{tag}_pairs"] = pairs
    out["guard_overhead_pct"] = round(
        100.0
        * (best_by_tag["capped"] - best_by_tag["uncapped"])
        / best_by_tag["uncapped"],
        1,
    )
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
