"""Connected-components / duplicate-cluster operator tests.

The oracle here is a plain union-find recomputed in Python — the same
golden-recompute pattern the reference uses for its lightcurve stats
(reference tests/conftest.py:1412-1620)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.pipeline.cluster import (
    connected_components,
    dup_cluster_labels,
)


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_labels(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_single_chain(spark):
    # a long path is the worst case for label propagation; the star
    # algorithm must still converge (in O(log n) rounds)
    pairs = [(i, i + 1) for i in range(1, 12)]
    got = _spark_labels(spark, pairs)
    assert got == {n: 1 for n in range(1, 13)}


def test_cc_multiple_components_and_unordered_input(spark):
    pairs = [(5, 3), (9, 7), (3, 1), (20, 20 + 1), (7, 8)]
    got = _spark_labels(spark, pairs)
    assert got == _uf_components(pairs)
    assert got[5] == 1 and got[8] == 7 and got[21] == 20


def test_cc_duplicate_and_reversed_edges(spark):
    pairs = [(2, 1), (1, 2), (2, 1), (3, 2)]
    got = _spark_labels(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_matches_union_find_on_dense_random_graph(spark):
    # deterministic pseudo-random edge set: LCG over 60 nodes
    x, pairs = 17, []
    for _ in range(80):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a, b = (x >> 8) % 60, (x >> 16) % 60
        if a != b:
            pairs.append((a + 1, b + 1))
    got = _spark_labels(spark, pairs)
    assert got == _uf_components(pairs)


def test_dup_cluster_labels_sizes_and_keepers(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dup_cluster_labels(df).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[1]["cluster_size"] == 3 and rows[10]["cluster_size"] == 2
    assert rows[1]["is_keeper"] and not rows[2]["is_keeper"]
    assert rows[10]["is_keeper"] and not rows[11]["is_keeper"]


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_long_path_converges_exactly(spark):
    """A 200-node path forces many alternation rounds (the edge set
    keeps relinking at constant count before settling), and the result
    must still be the exact transitive closure whatever the loop's
    materialization stride — iterating past the fixpoint is the
    identity.  (Pinned when the stride-2 variant was tried mid-r12;
    kept after its revert as the long-path exactness pin.)"""
    pairs = [(i, i + 1) for i in range(1, 200)]
    got = _spark_labels(spark, pairs)
    assert got == {n: 1 for n in range(1, 201)}

    # descending-id star with interleaved chain: a shape where count
    # stabilizes rounds before the set does (the stride-2 hazard case)
    pairs2 = [(200 - i, 201) for i in range(0, 40, 2)] + [
        (i, i + 3) for i in range(1, 60)
    ]
    got2 = _spark_labels(spark, pairs2)
    assert got2 == _uf_components(pairs2)
