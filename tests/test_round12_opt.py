"""Round-12 optimization equivalence pins.

The r12 optimization round rewrites the ``expr``-strategy assignment /
LSH-bucket expression trees from O(k) per-centroid lambda subtrees to
ONE higher-order-function lambda over a single nested-array literal
(guide §7.3: very large plans are single-threaded driver-side analysis
work — measured ~8 s per materialization at k=25 pre-rewrite).  The
rewrite must be VALUE-IDENTICAL: the per-element arithmetic is the same
left-to-right ``zip_with``/``aggregate`` fold, the same rounding, the
same tie rules.  These tests pin the new shapes against inline copies
of the pre-r12 constructions on corpora with deliberate ties and
zero-ish dots.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.functions.vectors import as_double_array, cosine, dot
from fastdb_spark.pipeline.ann import (
    _hyperplane,
    with_ivf_cluster,
    with_lsh_bucket,
)


def _legacy_with_ivf_cluster(embeddings, centroids, vec_col="embedding",
                             cluster_col="cluster"):
    """Verbatim pre-r12 construction: one cosine subtree per centroid."""
    v = as_double_array(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                F.round(cosine(v, F.lit(c).cast("array<double>")), 9).alias(
                    "cos"
                ),
                F.lit(-i).alias("negidx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return embeddings.withColumn(cluster_col, (-best["negidx"]).cast("int"))


def _legacy_with_lsh_bucket(embeddings, n_planes=8, dim=64,
                            vec_col="embedding", bucket_col="bucket"):
    """Verbatim pre-r12 construction: one dot subtree per plane."""
    v = as_double_array(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.lit(_hyperplane(p, dim)).cast("array<double>")
        bucket = bucket + F.when(
            F.round(dot(v, plane), 9) > 0, F.lit(1 << p)
        ).otherwise(0)
    return embeddings.withColumn(bucket_col, bucket.cast("int"))


@pytest.fixture(scope="module")
def vec_corpus(spark):
    """Vectors that exercise the tie and sign edges: duplicates of a
    centroid (exact cos=1 ties), negatives, zeros, and md5-derived
    noise."""
    dim = 8
    cents = [_hyperplane(1000 + c, dim) for c in range(5)]
    rows = []
    # exact centroid copies (cos=1.0 vs own centroid), scaled copies
    # (same cosine — argmax tie between equal-cos centroids is decided
    # by index), and noise
    for i, c in enumerate(cents):
        rows.append((100 + i, list(c)))
        rows.append((200 + i, [2.0 * x for x in c]))
    for j in range(40):
        rows.append((300 + j, _hyperplane(j, dim)))
    rows.append((998, [0.0] * dim))  # zero vector: every cosine NULL-ish
    rows.append((999, [1e-12] * dim))  # near-zero: sign-test edge
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, cents, dim


def test_ivf_cluster_hof_equals_legacy(spark, vec_corpus):
    # the exact-zero vector (998) throws DIVIDE_BY_ZERO in cosine under
    # ANSI in BOTH the legacy and the HOF shape (verified identical) —
    # no production call site feeds zero-norm vectors to
    # with_ivf_cluster (semdedup eps-guards upstream, ANN corpora are
    # md5-derived nonzero); exclude it so the equality can evaluate.
    # the 1e-12 near-zero row (999) stays: tiny but valid norm.
    df, cents, dim = vec_corpus
    df = df.filter(F.col("vec_id") != 998)
    new = with_ivf_cluster(df, cents).select("vec_id", "cluster")
    old = _legacy_with_ivf_cluster(df, cents).select("vec_id", "cluster")
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    # same row count (exceptAll alone would pass on empty frames)
    assert new.count() == df.count()


def test_lsh_bucket_hof_equals_legacy(spark, vec_corpus):
    df, _cents, dim = vec_corpus
    new = with_lsh_bucket(df, n_planes=8, dim=dim).select("vec_id", "bucket")
    old = _legacy_with_lsh_bucket(df, n_planes=8, dim=dim).select(
        "vec_id", "bucket"
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() == df.count()


def test_ivf_cluster_tie_breaks_to_lowest_index(spark):
    """Two identical centroids: every vector's cosine ties exactly, and
    the argmax must pick the LOWER centroid id (the contract the oracle
    replays)."""
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [0.0, 2.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in with_ivf_cluster(df, cents).collect()
    }
    assert got[1] == 0  # ties with centroid 1, lower id wins
    assert got[2] == 2
    assert got[3] == 0  # 45 degrees: ties all three? no — cos equal for
    # centroids 0/1 (0.707...) and centroid 2 (0.707...): all three tie
    # at round-9, lowest id wins


def test_assignment_plan_is_small_in_k(spark):
    """The r12 point: the analyzed plan must not grow with the centroid
    count.  At k=64 the pre-r12 shape embedded 64 cosine subtrees
    (~10^4 expression nodes); the HOF shape stays under a few hundred
    characters per row expression."""
    dim = 16
    cents = [_hyperplane(c, dim) for c in range(64)]
    df = spark.createDataFrame(
        [(1, [0.5] * dim)], "vec_id long, embedding array<double>"
    )
    plan = with_ivf_cluster(df, cents)._jdf.queryExecution().analyzed().toString()
    # one transform lambda, not 64 aggregate folds
    assert plan.count("aggregate(") <= 4
    assert plan.count("transform(") <= 4


def test_expr_string_array_literals_bit_exact(spark):
    """The r12 literal helpers (ONE expr() string per array instead of
    one py4j call per element) must parse to BIT-IDENTICAL doubles —
    repr(float) round-trips and SQL 'xD' parses correctly-rounded.
    Edge values: signed zero, denormal min, DBL_MAX, mantissa-dense
    irrationals, and the md5-derived hyperplane constants the gates
    actually use."""
    import math
    import struct

    from fastdb_spark.functions.vectors import (
        double_array_lit,
        int_array_lit,
        nested_double_array_lit,
    )

    edge = [
        0.0, -0.0, 5e-324, 1.7976931348623157e308, -1e-308,
        math.pi, 1 / 3, 123456789.123456789,
    ]
    vectors = [edge, _hyperplane(1000, 8), _hyperplane(7, 8)]

    df = spark.range(1)
    row = df.select(
        F.lit([list(map(float, v)) for v in vectors])
        .cast("array<array<double>>").alias("lit"),
        nested_double_array_lit(vectors).alias("ex"),
        F.lit(list(map(float, edge))).cast("array<double>").alias("flat_lit"),
        double_array_lit(edge).alias("flat_ex"),
        int_array_lit(range(5)).alias("ints"),
    ).head()
    pack = lambda x: struct.pack("<d", x)
    for lv, ev in zip(row["lit"], row["ex"]):
        assert [pack(a) for a in lv] == [pack(b) for b in ev]
    assert [pack(a) for a in row["flat_lit"]] == [
        pack(b) for b in row["flat_ex"]
    ]
    assert row["ints"] == list(range(5))
    # non-finite values take the F.lit fallback rather than failing
    nf = df.select(double_array_lit([1.0, float("nan")]).alias("v")).head()
    assert math.isnan(nf["v"][1])


def test_norm_py_bit_exact_vs_jvm_fold(spark):
    """The r12 norm hoist rests on ``norm_py`` being the bit-identical
    driver-side twin of the JVM ``norm()`` fold: same left-to-right
    double accumulation, correctly-rounded sqrt on both sides.  Pin it
    over edge doubles (signed zero, denormals, large magnitudes) and
    md5-derived noise vectors."""
    import struct

    from fastdb_spark.functions.vectors import norm, norm_py
    from fastdb_spark.pipeline.ann import _hyperplane

    vecs = [
        [-0.0, 5e-324, 1e154, -1e-308, 3.141592653589793],
        [2.2250738585072014e-308] * 4,
        [0.1, 0.2, 0.3],
        [0.0] * 6,
    ] + [_hyperplane(i, 16) for i in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    rows = df.select("vec_id", norm(F.col("v")).alias("n"), "v").collect()
    pack = lambda x: struct.pack("<d", x)
    for r in rows:
        assert pack(norm_py(r["v"])) == pack(r["n"]), r["vec_id"]


def test_cosine_norm_hoist_forms_bit_exact(spark):
    """The three r12 norm-hoisted scoring shapes must equal the plain
    ``cosine()`` fold to the last bit:

    - ``cosine_to_lit`` (literal query, query norm folded driver-side);
    - the pair form ``dot/(na*nb)`` with per-row norms hoisted below a
      self-join (semdedup/incsem expr paths, cosine_topk_many);
    - ``with_ivf_cluster``'s per-centroid ``dot/(norm(v)*cn_lit)``
      (covered transitively by test_ivf_cluster_hof_equals_legacy).
    """
    from fastdb_spark.functions.vectors import (
        cosine,
        cosine_to_lit,
        dot,
        double_array_lit,
        norm,
    )
    from fastdb_spark.pipeline.ann import _hyperplane

    dim = 16
    vecs = [_hyperplane(i, dim) for i in range(30)]
    vecs.append([1e-12] * dim)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    q = _hyperplane(999, dim)
    d = df.select(
        cosine(F.col("v"), double_array_lit(q)).alias("old"),
        cosine_to_lit(F.col("v"), q).alias("new"),
    ).filter("(old <=> new) = false")
    assert d.count() == 0

    wn = df.withColumn("_n", norm(F.col("v")))
    a = wn.select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("_n").alias("na"),
    )
    b = wn.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("_n").alias("nb"),
    )
    pairs = a.crossJoin(b).where("ia < ib")
    d2 = pairs.select(
        cosine(F.col("va"), F.col("vb")).alias("old"),
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
            "new"
        ),
    ).filter("(old <=> new) = false")
    assert d2.count() == 0


def test_tiny_local_df_values_and_schema(spark):
    """The Arrow local-relation helper must reproduce the pickled
    ``createDataFrame`` path exactly: same schema, same values (doubles
    bit-exact through Arrow), and no Python-RDD scan in the plan."""
    import struct

    from fastdb_spark.localrel import tiny_local_df

    rows = [("a", 1, [0.1, -0.0, 5e-324]), ("b", -7, [1e154, 2.5, 0.0])]
    schema = "k string, n bigint, v array<double>"
    new = tiny_local_df(spark, rows, schema)
    old = spark.createDataFrame(rows, schema)
    assert new.schema == old.schema
    pack = lambda x: struct.pack("<d", x)
    for rn, ro in zip(
        sorted(new.collect(), key=lambda r: r["k"]),
        sorted(old.collect(), key=lambda r: r["k"]),
    ):
        assert rn["k"] == ro["k"] and rn["n"] == ro["n"]
        assert [pack(x) for x in rn["v"]] == [pack(x) for x in ro["v"]]
    # the point of the helper: a LocalRelation/LocalTableScan, not a
    # Python-RDD scan that spins up workers per broadcast build
    plan = new._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan
    # empty input stays a readable typed frame
    assert tiny_local_df(spark, [], schema).count() == 0
