"""Connected-component clustering of near-duplicate pairs.

Near-dup operators (``pipeline.dedup``) emit candidate PAIRS; turning
pairs into duplicate GROUPS — one canonical keeper per transitive group
— is a connected-components problem: A~B and B~C put {A, B, C} in one
cluster even though (A, C) never shared an LSH bucket.  The reference
hits the same issue with its 1-arcsec root association and punts on
transitivity (reference src/services/source_importer.py:430-437,
src/ltcv.py:486-493 admits near-duplicate roots exist); here we close
the transitive hull properly.

Algorithm: alternating **large-star / small-star**, the canonical
map-reduce CC algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC '14), expressed as DataFrame joins and
aggregations:

- *large-star*: every node connects each strictly-larger neighbor to
  the minimum of its neighborhood (including itself);
- *small-star*: every node connects its smaller neighbors and itself to
  that minimum.

Each half-round is one groupBy plus one equi-join keyed on node ids.
The edge set converges to a star forest (every node points at its
component minimum) in O(log n) rounds — 2-3 rounds for the near-clique
clusters LSH emits.  Per-round ``localCheckpoint`` truncates lineage so
the plan does not grow with iterations.

100 TB notes: each round shuffles only the CURRENT edge set, which
shrinks monotonically toward one edge per non-root node.  High-degree
hub nodes are exactly what large-star splits, so skew self-corrects —
that is the reason to prefer this over naive min-label propagation,
whose round count is the graph diameter and whose hubs never split.
On a real cluster swap ``localCheckpoint`` for reliable
``checkpoint(dir)`` to survive executor loss between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over an undirected edge list (a, b), a != b.

    Emits (v, m) for every neighbor v > u, where m = min(N(u) + {u}).
    Output satisfies a > b.
    """
    sym = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_nbr_min"))
        .select("a", F.least(F.col("_nbr_min"), F.col("a")).alias("m"))
    )
    return (
        sym.join(m, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over a directed edge list with a > b.

    For each node a: m = min of its smaller neighbors; reconnect those
    neighbors and a itself to m.  Output satisfies a > b.
    """
    m = edges.groupBy("a").agg(F.min("b").alias("m"))
    nbrs = edges.select("a", "b").union(
        edges.select("a", F.col("a").alias("b"))
    )
    return (
        nbrs.join(m, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap convergence signature: (row count, XOR-fold of per-edge
    64-bit hashes).  bit_xor is order-independent and cannot overflow
    (sum would, under ANSI mode).  Equal signatures on consecutive
    rounds => the edge set is a fixed point of both stars (collision
    odds ~2^-64, and a false positive only costs an early stop on an
    already-star-shaped set)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Component label for every node that appears in ``pairs``.

    Returns (node, component) where component is the minimum node id of
    the connected component.  Nodes absent from ``pairs`` (singletons)
    are not emitted — union them in with label = own id if needed.
    """
    # lazy checkpoints: the _signature() collect right after is the one
    # action that materializes each round — eager=True would run a second
    # job per round for nothing
    cur = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("a"),
            F.least(F.col(src), F.col(dst)).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig = _signature(cur)
    # ONE alternation round per materialization.  The stride-2 variant
    # (two alternations per signature check, tried mid-r12) was REVERTED
    # by a quiet A/B at sf0.1: the near-clique graphs the dedup
    # operators emit converge in ~2 alternations, so stride-2 ran 4
    # star-pair shuffles where 2 suffice and the extra shuffle work
    # dwarfed the ~0.4 s signature action it saved — dup_clusters
    # 4.3 -> 7.6 s, semantic_dedup 6.2 -> 13.0 s (min-of-3, local[32]).
    # At 100 TB the same argument holds harder: a star-pair round
    # shuffles the full edge set, a signature is one tiny aggregate.
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    labels = cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = (
        cur.select(F.col("b").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    return labels.union(roots).distinct()


def dup_cluster_labels(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-document duplicate-cluster assignment from candidate pairs:
    (doc_id, cluster_id, cluster_size, is_keeper).  cluster_id is the
    minimum doc id in the transitive cluster; the keeper is that doc."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    # plain equi-join: AQE broadcasts `sizes` when it is small; forcing a
    # broadcast here would cap cluster count by driver memory at scale
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("node") == F.col("component")).alias("is_keeper"),
        )
    )
