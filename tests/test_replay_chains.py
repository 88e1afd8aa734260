"""Replay idempotency on near-dup CHAINS (round 9, second extension).

The one-shot in-batch rule (drop the higher id of every refined pair)
over-drops chain tails: with A<B<C where only A~B and B~C are near,
C is dropped by the never-admitted B — and a torn-checkpoint REPLAY of
the same batch then phantom-admits C, because its only near neighbor
was never indexed.  Reproduced on all three index families; fixed by
greedy-MIS admission (``dedup.greedy_mis_drops``: keep x iff no KEPT
lower-id neighbor — every dropped item then has an INDEXED neighbor,
so replays classify every row as a duplicate).  These tests pin the
fix with explicit chain constructions per family, plus a property test
of the fixpoint against the sequential definition.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _greedy_sequential(n, edges):
    """The definitional rule: ascending ids, keep x iff no kept
    neighbor precedes it.  Returns the DROPPED set."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    kept = set()
    for x in sorted(n):
        if not (adj.get(x, set()) & kept):
            kept.add(x)
    return set(n) - kept


def test_greedy_mis_fixpoint_matches_sequential(spark):
    """Property: the parallel fixpoint equals the sequential greedy on
    random DAG-ordered graphs, including deep chains."""
    import random

    from fastdb_spark.pipeline.dedup import greedy_mis_drops

    rng = random.Random(17)
    for trial in range(4):
        n = list(range(30))
        edges = sorted(
            {
                tuple(sorted(rng.sample(n, 2)))
                for _ in range(rng.randint(5, 40))
            }
        )
        # always include one long path (the worst case for convergence)
        edges += [(i, i + 1) for i in range(0, 12)]
        edges = sorted(set(edges))
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r[0] for r in greedy_mis_drops(pairs, "doc_id").collect()
        }
        want = _greedy_sequential(n, edges)
        assert got == want, (trial, sorted(got), sorted(want))
    # empty edge list -> nothing dropped
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert greedy_mis_drops(empty, "doc_id").count() == 0


# the 30-token jaccard chain: B differs from A by one word
# (jac .806 >= .5), C from B by three more (jac .514 >= .5), while
# jac(A, C) = .400 < .5 — a genuine chain at threshold 0.5
_A = (("w%02d " * 30) % tuple(range(30))).split()
_B = list(_A)
_B[5] = "xx"
_C = list(_B)
_C[12] = "yy"
_C[20] = "zz"
_C[26] = "qq"


def test_text_index_chain_replay_absorbed(spark, tmp_path):
    from fastdb_spark.pipeline.incdedup import (
        build_dedup_index,
        dedup_index_probe,
        dedup_index_upsert,
    )

    path = str(tmp_path / "idx")
    seed = spark.createDataFrame(
        [(999, "completely unrelated seed document about spark catalyst "
               "optimizer internals and parquet footers")],
        "doc_id long, text string",
    )
    # bands=12 (rows=1): banding recall ~1 at jaccard .5, so the chain
    # edges are guaranteed to surface as candidate pairs
    build_dedup_index(seed, path, n_hashes=12, bands=12)
    batch = spark.createDataFrame(
        [(1, " ".join(_A)), (2, " ".join(_B)), (3, " ".join(_C))],
        "doc_id long, text string",
    )
    n1 = dedup_index_upsert(spark, batch, path)
    stored = sorted(
        r[0]
        for r in spark.read.parquet(os.path.join(path, "fingerprints"))
        .select("doc_id")
        .collect()
    )
    # greedy admits the maximal independent set {1, 3} — 3 is NOT near 1
    # (the one-shot rule admitted only {1}: not even maximal)
    assert sorted(n1) == [1, 3] and stored == [1, 3, 999]
    # the replay is fully absorbed
    v = dedup_index_probe(spark, batch, path).toPandas()
    assert not (v.verdict == "fresh").any(), v
    n2 = dedup_index_upsert(spark, batch, path)
    assert list(n2) == []
    stored2 = sorted(
        r[0]
        for r in spark.read.parquet(os.path.join(path, "fingerprints"))
        .select("doc_id")
        .collect()
    )
    assert stored2 == stored


def test_media_index_chain_replay_absorbed(spark, tmp_path):
    """Hamming chain via precomputed fingerprints: h(A,B) = h(B,C) = 2
    in different bands, h(A,C) = 4 > max_hamming."""
    from fastdb_spark.pipeline.incmedia import (
        build_media_index,
        media_index_probe,
        media_index_upsert,
    )

    path = str(tmp_path / "midx")
    fp_a = 0x0123456789ABCDEF
    fp_b = fp_a ^ 0x3  # 2 bits in band 0
    fp_c = fp_b ^ (0x3 << 16)  # 2 more bits in band 2
    seed = spark.createDataFrame(
        [(999, 0x7EADBEEF00000000)], "media_id long, payload long"
    )
    build_media_index(
        seed, path, method="precomputed", max_hamming=2, bands=8
    )
    batch = spark.createDataFrame(
        [(1, fp_a), (2, fp_b), (3, fp_c)], "media_id long, payload long"
    )
    n1 = media_index_upsert(spark, batch, path)
    stored = sorted(
        r[0]
        for r in spark.read.parquet(os.path.join(path, "hashes"))
        .select("media_id")
        .collect()
    )
    assert sorted(n1) == [1, 3] and stored == [1, 3, 999]
    v = media_index_probe(spark, batch, path).toPandas()
    assert not (v.verdict == "fresh").any(), v
    n2 = media_index_upsert(spark, batch, path)
    assert list(n2) == []


def test_semantic_index_chain_replay_absorbed(spark, tmp_path):
    """The embedding chain that exposed the defect: on the sf0.01 gate
    corpus the one-shot rule phantom-admitted 2 vectors per replay
    (425 via the 175 chain, 461 via 261); greedy-MIS absorbs it."""
    from fastdb_spark.pipeline.ann import _hyperplane
    from fastdb_spark.pipeline.corpus import clustered_embs
    from fastdb_spark.pipeline.incsem import (
        build_semantic_index,
        semantic_index_upsert,
    )

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = clustered_embs(embs, spread=0.8)
    cents = [_hyperplane(1000 + c, 64) for c in range(25)]
    path = str(tmp_path / "semidx")
    build_semantic_index(
        corpus.filter("vec_id % 2 = 0"), path, eps=0.92, centroids=cents
    )
    odds = corpus.filter("vec_id % 2 = 1")
    semantic_index_upsert(odds, path)
    stored = {
        r[0]
        for r in spark.read.parquet(os.path.join(path, "vectors"))
        .select("vec_id")
        .collect()
    }
    # structural assertion: the replay appends nothing and membership
    # is unchanged (under one-shot this measured 2 phantom admissions)
    assert semantic_index_upsert(odds, path) == 0
    stored2 = {
        r[0]
        for r in spark.read.parquet(os.path.join(path, "vectors"))
        .select("vec_id")
        .collect()
    }
    assert stored2 == stored
