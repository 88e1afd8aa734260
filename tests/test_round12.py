"""Round-12 structural tests: the ADVICE-r11 fixes (quantized LSH sign
test, loud corrupt-meta error, null-safe bench sentinels, explicit
greedy-MIS null-edge contract), the doc_similar_w2v retirement, the
batched-hybrid born gate, and the r12 rotation invariant."""

import json
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from tests.test_round11 import LAGGARDS_R12

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# ADVICE r11 #1 — quantized LSH sign test


def test_round9_py_matches_spark_round(spark):
    """_round9_py is the driver-side twin of F.round(col, 9): HALF_UP
    over the shortest decimal repr.  Checked on values straddling the
    grid boundary (the sign-test regime) and ordinary dots."""
    from fastdb_spark.pipeline.ann import _round9_py

    vals = [
        0.0, 1e-9, -1e-9, 4.9e-10, 5e-10, 5.1e-10, -5e-10,
        1.5e-9, 2.5e-9, -2.5e-9, 0.123456789123, -0.987654321987,
        12.3456789015, 1e-18, -1e-18, 3.14159265358979,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.col("x"), F.round("x", 9).alias("r")
    )
    got = {r["x"]: r["r"] for r in df.collect()}
    for v in vals:
        assert _round9_py(v) == got[v], v


def test_lsh_sign_test_is_quantized(spark):
    """with_lsh_bucket's sign test rounds the plane dot at 9 before
    comparing: a vector whose dot with plane 0 is +2e-10 (inside the
    round-to-zero band) must NOT set bit 0, while +1e-9 must."""
    import numpy as np

    from fastdb_spark.pipeline.ann import _hyperplane, with_lsh_bucket

    plane = np.array(_hyperplane(0, 4))
    # build vectors v with dot(v, plane0) == target exactly:
    # v = (target / plane[0], 0, 0, 0)
    def vec_for(target: float) -> list[float]:
        return [float(target / plane[0]), 0.0, 0.0, 0.0]

    rows = [(0, vec_for(2e-10)), (1, vec_for(1e-9)), (2, vec_for(-2e-10))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["bucket"]
        for r in with_lsh_bucket(df, n_planes=1, dim=4).collect()
    }
    assert got[0] & 1 == 0  # +2e-10 rounds to 0 -> not > 0
    assert got[1] & 1 == 1  # +1e-9 survives the round
    assert got[2] & 1 == 0


# ---------------------------------------------------------------------------
# ADVICE r11 #2 — corrupt index meta raises instead of guessing


def test_corrupt_ivf_meta_raises(spark, tmp_path):
    """A PRESENT but torn/strategy-less _ivf_meta.json raises (builds
    write atomically since r11, so damage means a damaged index); a
    MISSING file is a pre-r11 layout and still falls back to gemm."""
    from fastdb_spark.pipeline.ann import (
        _IVF_META,
        _stored_assign_strategy,
        build_ivf_index,
    )

    embs = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    p = str(tmp_path / "ivf")
    build_ivf_index(embs, p, n_clusters=4, assign_strategy="expr")
    assert _stored_assign_strategy(p) == "expr"
    meta = os.path.join(p, _IVF_META)
    # torn write: truncated JSON
    with open(meta, "w") as f:
        f.write('{"assign_str')
    with pytest.raises(ValueError, match="corrupt index meta"):
        _stored_assign_strategy(p)
    # parseable but strategy-less: also refuse to guess
    with open(meta, "w") as f:
        json.dump({"n_clusters": 4}, f)
    with pytest.raises(ValueError, match="no assign_strategy"):
        _stored_assign_strategy(p)
    # pre-r11 layout (no meta at all) keeps the documented fallback
    os.remove(meta)
    assert _stored_assign_strategy(p) == "gemm"


# ---------------------------------------------------------------------------
# ADVICE r11 #3 — bench host sentinel: absence != contention


def test_host_cpu_sample_unreadable_returns_none(monkeypatch):
    import builtins

    import bench

    real_open = builtins.open

    def deny(path, *a, **kw):
        if path == "/proc/stat":
            raise OSError("denied")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", deny)
    assert bench._host_cpu_sample() is None


def test_host_cpu_sample_shape():
    import bench

    s = bench._host_cpu_sample()
    # on this host /proc/stat is readable; the tuple is (total, idle,
    # steal) with total >= idle + steal
    assert s is not None and len(s) == 3
    assert s[0] >= s[1] + s[2] > 0


# ---------------------------------------------------------------------------
# ADVICE r11 #4 — greedy-MIS null-endpoint contract


def test_greedy_mis_drops_null_endpoints_explicitly(spark):
    """An edge with a NULL endpoint is dropped by the explicit
    null filter (stated contract), and the remaining well-formed edges
    still produce the greedy-MIS drop set."""
    from fastdb_spark.pipeline.dedup import greedy_mis_drops

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 7), (8, None), (None, None), (3, 4)],
        "id_a long, id_b long",
    )
    got = sorted(
        r["doc_id"] for r in greedy_mis_drops(pairs, "doc_id").collect()
    )
    # chain 1-2-3-4: greedy keeps 1 and 3, drops 2 and 4; the null
    # edges contribute nothing (7 and 8 are NOT dropped)
    assert got == [2, 4]
