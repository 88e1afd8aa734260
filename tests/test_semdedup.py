"""SemDeDup semantic deduplication (pipeline/semdedup.py) regressions.

Covers: GEMM-vs-expr strategy equality on the gate corpus, keeper
policies, transitive closure over multi-hop chains, the oversized-
cluster guard + audit, and a hypothesis property test against a pure
union-find ground truth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastdb_spark.pipeline.semdedup import (
    LAST_SEMDEDUP_AUDIT,
    assign_clusters,
    semantic_dedup,
    semantic_pairs,
)

SF_DIR = "/root/testdata/sf0.01"


def _gate_corpus(spark):
    from fastdb_spark.pipeline.ann import _hyperplane
    from fastdb_spark.pipeline.corpus import clustered_embs

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = [_hyperplane(1000 + c, 64) for c in range(25)]
    return clustered_embs(embs, spread=0.8), cents


def _toy(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_gemm_equals_expr_on_gate_corpus(spark):
    corpus, cents = _gate_corpus(spark)
    a = (
        semantic_pairs(corpus, cents, eps=0.92, strategy="gemm")
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    b = (
        semantic_pairs(corpus, cents, eps=0.92, strategy="expr")
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_keeper_is_farthest_from_centroid(spark):
    corpus, cents = _gate_corpus(spark)
    out = semantic_dedup(corpus, cents, eps=0.92, keep="farthest").toPandas()
    assert len(out) == 500
    # exactly one keeper per group, and it minimizes (cos_c, vec_id)
    for gid, grp in out.groupby("group_id"):
        keepers = grp[grp.is_keeper]
        assert len(keepers) == 1
        best = grp.sort_values(["cos_c", "vec_id"]).iloc[0]
        assert keepers.iloc[0].vec_id == best.vec_id
        assert (grp.group_size == len(grp)).all()
    # non-trivial structure at this spread/eps (multi-member groups AND
    # singletons)
    assert out.group_size.max() > 2
    assert (out.group_size == 1).any()


def test_keep_min_id_policy(spark):
    corpus, cents = _gate_corpus(spark)
    out = semantic_dedup(corpus, cents, eps=0.92, keep="min_id").toPandas()
    # group label IS the minimum member id, so that member keeps
    assert (out[out.is_keeper].vec_id == out[out.is_keeper].group_id).all()
    with pytest.raises(ValueError):
        semantic_dedup(corpus, cents, keep="nope")
    with pytest.raises(ValueError):
        semantic_pairs(corpus, cents, strategy="nope")


def test_transitive_chain_closes(spark):
    # A-B and B-C are eps-close, A-C is not: one group of three.
    # One centroid so everything lands in a single cluster.
    rows = [
        (10, [1.0, 0.0]),
        (11, [1.0, 0.4]),
        (12, [1.0, 0.9]),
        (13, [-1.0, 4.0]),  # far: singleton
    ]
    df = _toy(spark, rows)
    cents = [[1.0, 0.2], [-0.5, 2.0]]
    pairs = semantic_pairs(
        df, cents, eps=0.9, strategy="expr", max_cluster_size=None
    ).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (10, 11) in got and (11, 12) in got and (10, 12) not in got
    out = semantic_dedup(df, cents, eps=0.9, strategy="expr").toPandas()
    lbl = dict(zip(out.vec_id, out.group_id))
    assert lbl[10] == lbl[11] == lbl[12] == 10
    assert lbl[13] == 13
    assert out.set_index("vec_id").loc[13, "is_keeper"]


def test_oversized_cluster_guard_audits_and_skips(spark):
    corpus, cents = _gate_corpus(spark)
    # every cluster has 20 members at sf0.01 -> cap 10 skips all 25
    out = semantic_dedup(
        corpus, cents, eps=0.92, max_cluster_size=10
    ).toPandas()
    assert LAST_SEMDEDUP_AUDIT["skipped_clusters"] == 25
    assert len(LAST_SEMDEDUP_AUDIT["sample"]) == 25
    assert all(sz == 20 for _, sz in LAST_SEMDEDUP_AUDIT["sample"])
    # skipped members surface as singletons (under-dedup, never a crash)
    assert (out.group_size == 1).all()
    assert out.is_keeper.all()
    # an adequate cap leaves the audit empty
    semantic_pairs(corpus, cents, eps=0.92, max_cluster_size=20).count()
    assert LAST_SEMDEDUP_AUDIT["skipped_clusters"] == 0


def test_assignment_matches_generating_center(spark):
    corpus, cents = _gate_corpus(spark)
    asg = assign_clusters(corpus, cents).select("vec_id", "cluster", "cos_c")
    bad = asg.filter(
        F.col("cluster") != F.pmod(F.col("vec_id"), F.lit(25)).cast("int")
    ).count()
    assert bad == 0
    rng = asg.agg(F.min("cos_c"), F.max("cos_c")).head()
    assert 0.0 < rng[0] <= rng[1] <= 1.0


def test_gemm_assignment_equals_expr(spark):
    """The vectorized Arrow assignment (the scale path — 136 s -> ~3 s
    at 1M rows, k=256) must agree with the expr oracle twin: identical
    cluster choice, cos_c within one round-9 ULP."""
    corpus, cents = _gate_corpus(spark)
    a = (
        assign_clusters(corpus, cents, strategy="expr")
        .select("vec_id", "cluster", "cos_c")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    b = (
        assign_clusters(corpus, cents, strategy="gemm")
        .select("vec_id", "cluster", "cos_c")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert (a.cluster == b.cluster).all()
    assert np.abs(a.cos_c - b.cos_c).max() <= 1e-9
    with pytest.raises(ValueError):
        assign_clusters(corpus, cents, strategy="nope")
    # the full report is identical through either assignment path here
    full_a = (
        semantic_dedup(corpus, cents, eps=0.92)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    full_b = (
        semantic_dedup(corpus, cents, eps=0.92, assign_strategy="gemm")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        full_a.drop(columns=["cos_c"]), full_b.drop(columns=["cos_c"])
    )
    assert np.abs(full_a.cos_c - full_b.cos_c).max() <= 1e-9


def _ground_truth(vecs: dict[int, np.ndarray], cents: np.ndarray, eps: float):
    """Pure-python SemDeDup: argmax-cosine assignment (round 9, tie to
    lowest centroid), within-cluster round-6 cosine graph, union-find,
    farthest-from-centroid keeper."""
    ids = sorted(vecs)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cl, cosc = {}, {}
    for i in ids:
        scores = [round(cos(vecs[i], c), 9) for c in cents]
        best = max(range(len(cents)), key=lambda j: (scores[j], -j))
        cl[i], cosc[i] = best, scores[best]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and cl[i] == cl[j] and round(cos(vecs[i], vecs[j]), 6) >= eps:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    groups: dict[int, list[int]] = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    out = {}
    for root, members in groups.items():
        keeper = min(members, key=lambda m: (cosc[m], m))
        for m in members:
            out[m] = (cl[m], root, len(members), m == keeper)
    return out


def test_property_random_vectors_match_union_find(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n, dim, k = 40, 6, 3
        cents = rng.randn(k, dim)
        vecs = {
            int(i): cents[i % k] + 0.6 * rng.randn(dim) for i in range(n)
        }
        df = _toy(spark, [(i, list(v)) for i, v in vecs.items()])
        got = semantic_dedup(
            df, [list(map(float, c)) for c in cents], eps=0.9,
            strategy="gemm",
        ).toPandas()
        want = _ground_truth(vecs, cents, 0.9)
        assert len(got) == n
        for r in got.itertuples():
            wcl, wgid, wsz, wkeep = want[r.vec_id]
            assert (r.cluster, r.group_id, r.group_size, r.is_keeper) == (
                wcl, wgid, wsz, wkeep,
            ), (trial, r.vec_id)
