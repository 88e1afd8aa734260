"""Pipeline operator tests: planted-duplicate recovery, ANN recall,
multimodal batch plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.catalog import Catalog
from fastdb_spark.pipeline.ann import cosine_topk, lsh_bucketed_topk, with_lsh_bucket
from fastdb_spark.pipeline.corpus import exactdup_docs, neardup_docs, neardup_embs
from fastdb_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from fastdb_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return Catalog(spark, SF).table("documents")


@pytest.fixture(scope="module")
def embs(spark):
    return Catalog(spark, SF).table("embeddings")


def test_exact_dedup_recovers_planted(docs):
    groups = exact_dedup(exactdup_docs(docs))
    dup_groups = groups.filter(F.col("group_size") >= 2).toPandas()
    n_planted = docs.filter(F.col("doc_id") % 7 == 0).count()
    assert len(dup_groups) == n_planted
    # canonical representative is the original (minimum) id
    assert (dup_groups.keep_id < 2000000).all()


def test_minhash_recovers_planted(docs):
    pairs = minhash_lsh_pairs(neardup_docs(docs)).toPandas()
    planted = {
        (i, i + 1000000)
        for i in docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .toPandas()["doc_id"]
    }
    found = set(zip(pairs.id_a, pairs.id_b))
    # LSH is approximate: short docs (few shingles) can slip the banding.
    # Demand >=95% recall of planted pairs; every accepted pair passed the
    # exact jaccard refine, so precision is by construction.
    assert len(found & planted) >= 0.95 * len(planted)
    assert (pairs.jaccard >= 0.5).all()


def test_simhash_recovers_planted(docs):
    pairs = simhash_pairs(neardup_docs(docs)).toPandas()
    planted = {
        (i, i + 1000000)
        for i in docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .toPandas()["doc_id"]
    }
    found = set(zip(pairs.id_a, pairs.id_b))
    # banding is approximate (a pair can flip a bit in every band);
    # demand high planted recall — extra accepted pairs are genuinely
    # similar short docs (they also pass the exact-jaccard operators)
    assert len(found & planted) >= 0.9 * len(planted)
    assert (pairs.hamming <= 16).all()


def test_ann_lsh_recall_vs_exact(embs):
    qvec = list(embs.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(embs, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_bucketed_topk(embs, qvec, k=10).collect()]
    assert exact[0] == 0  # the query vector itself
    assert 0 in approx
    # multiprobe LSH over 8 planes: expect decent overlap with exact top-10
    assert len(set(exact) & set(approx)) >= 3


def test_ann_ivf_recall_vs_exact(embs):
    from fastdb_spark.pipeline.ann import ivf_topk

    qvec = list(embs.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(embs, qvec, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(embs, qvec, k=10, n_clusters=8, nprobe=2).collect()
    ]
    assert 0 in approx  # the query vector's own cluster is always probed
    assert len(set(exact) & set(approx)) >= 3


def test_ann_ivf_kmeans_strategy(embs):
    from fastdb_spark.pipeline.ann import ivf_topk

    qvec = list(embs.filter(F.col("vec_id") == 0).head()["embedding"])
    approx = [
        r["vec_id"]
        for r in ivf_topk(
            embs, qvec, k=10, n_clusters=4, nprobe=2, strategy="kmeans"
        ).collect()
    ]
    assert len(approx) == 10
    assert 0 in approx


def test_ivf_persisted_index_matches_inplace_and_prunes(embs, tmp_path):
    """The train-once persisted IVF layout must return exactly what the
    in-place (retrain-per-query) path returns for the same quantizer, and
    its probe scan must prune cluster partitions BEFORE file IO."""
    from fastdb_spark.pipeline.ann import build_ivf_index, ivf_search_index, ivf_topk

    path = str(tmp_path / "ivf")
    build_ivf_index(embs, path, n_clusters=8, strategy="seed")
    spark = embs.sparkSession
    qvec = list(embs.filter(F.col("vec_id") == 0).head()["embedding"])

    indexed = ivf_search_index(spark, path, qvec, k=10, nprobe=2)
    inplace = ivf_topk(embs, qvec, k=10, n_clusters=8, nprobe=2, strategy="seed")
    assert [(r["vec_id"], r["cos"]) for r in indexed.collect()] == [
        (r["vec_id"], r["cos"]) for r in inplace.collect()
    ]

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in line and "cluster" in line
        for line in plan.splitlines()
    ), plan
    # the layout holds the whole corpus across its cluster directories
    assert spark.read.parquet(f"{path}/vectors").count() == embs.count()


def test_ivf_cluster_assignment_partitions_corpus(embs):
    from fastdb_spark.pipeline.ann import ivf_centroids, with_ivf_cluster

    cents = ivf_centroids(embs, n_clusters=4)
    assert len(cents) == 4
    assigned = with_ivf_cluster(embs, cents)
    # every vector lands in exactly one cluster, all clusters in range
    dist = assigned.groupBy("cluster").count().toPandas()
    assert dist["count"].sum() == embs.count()
    assert set(dist["cluster"]) <= set(range(4))


def test_rolling_fingerprint_order_sensitive(spark):
    from fastdb_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "fox brown quick the"), (3, "the quick brown fox")],
        ["doc_id", "text"],
    ).select("doc_id", rolling_fingerprint(F.col("text")).alias("fp"))
    rows = {r["doc_id"]: r["fp"] for r in df.collect()}
    assert rows[1] == rows[3]  # deterministic
    assert rows[1] != rows[2]  # order-sensitive (unlike a bag-of-words hash)
    assert 0 <= rows[1] < 2147483647


def test_lsh_buckets_partition_corpus(embs):
    b = with_lsh_bucket(embs)
    counts = b.groupBy("bucket").count().toPandas()
    assert counts["count"].sum() == embs.count()
    assert len(counts) > 10  # corpus actually spreads over buckets


def test_neardup_embs_cosine(embs, spark):
    from fastdb_spark.pipeline.dedup import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(neardup_embs(embs)).toPandas()
    planted = embs.filter(F.col("vec_id") % 5 == 0).count()
    assert len(pairs) == planted
    assert (pairs.cos >= 0.95).all()
    assert (pairs.id_b - pairs.id_a == 1000000).all()


def test_neardup_block_matches_expr_and_lsh_is_subset(embs):
    from fastdb_spark.pipeline.dedup import embedding_neardup_pairs

    corp = neardup_embs(embs)

    def key_set(pdf):
        return set(zip(pdf.id_a.tolist(), pdf.id_b.tolist()))

    block = embedding_neardup_pairs(corp, strategy="block", n_blocks=5).toPandas()
    expr = embedding_neardup_pairs(corp, strategy="expr").toPandas()
    a = block.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = expr.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert a.equals(b)  # blocked GEMM is exact, any block count

    lsh = embedding_neardup_pairs(corp, strategy="lsh").toPandas()
    assert key_set(lsh) <= key_set(expr)  # bucketed path never invents pairs
    assert len(lsh) >= 0.5 * len(expr)  # and keeps reasonable recall here


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", bytes([10, 20, 30, 40]), "image/png", 2, 2, None),
        (2, "image", bytes([50] * 100), "image/png", 10, 10, None),
        (3, "video", b"\x00" * 64, "video/mp4", 8, 8, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = extract_features(media, n_features=8).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 3}
    for r in feats:
        assert len(r["feat"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feat"])
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 4
    assert by_id[2]["n_bytes"] == 100

    # determinism: same payload -> same features
    feats2 = extract_features(media, n_features=8).collect()
    assert {r["media_id"]: r["feat"] for r in feats2} == {
        r["media_id"]: r["feat"] for r in feats
    }

    frames = sample_frames(media, every_ms=1000).collect()
    assert {r["frame_ts_ms"] for r in frames} == {0, 1000, 2000, 3000}

    from fastdb_spark.pipeline.multimodal import fake_resize, resize_images

    resized = resize_images(media, width=32, height=16).collect()
    # only image rows cross the Arrow boundary; video filtered Spark-side
    assert {r["media_id"] for r in resized} == {1, 2}
    by = {r["media_id"]: r for r in resized}
    assert by[1]["width"] == 32 and by[1]["height"] == 16
    assert bytes(by[1]["payload"]) == fake_resize(bytes([10, 20, 30, 40]), 32, 16)


def test_decode_image_is_gated_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")


def test_hash_stratified_sample_deterministic_and_calibrated(spark):
    """Same salt -> identical sample across runs; rates match fractions
    within binomial noise; the keep decision is a scan-stage filter (no
    exchange in the plan)."""
    from fastdb_spark.pipeline.sample import hash_stratified_sample

    df = spark.range(0, 20_000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 4 = 0 THEN 'en' ELSE 'de' END AS lang"
    )
    frac = {"en": 0.2, "de": 0.8}
    s1 = hash_stratified_sample(df, "lang", frac, "doc_id", salt="s")
    s2 = hash_stratified_sample(df, "lang", frac, "doc_id", salt="s")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())

    counts = {r["lang"]: r["count"] for r in s1.groupBy("lang").count().collect()}
    assert abs(counts["en"] / 5000 - 0.2) < 0.03
    assert abs(counts["de"] / 15000 - 0.8) < 0.03

    # different salt -> a different (but equally sized-ish) draw
    s3 = hash_stratified_sample(df, "lang", frac, "doc_id", salt="t")
    assert sorted(r["doc_id"] for r in s3.collect()) != ids1

    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_scrubs_and_preserves(spark):
    from fastdb_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "server at 192.168.0.1 port 80"),
            (3, "acct 12345678 but keep 1234 and v2.0"),
            (4, "nothing sensitive here"),
        ],
        ["id", "text"],
    ).select("id", redact_pii(F.col("text")).alias("clean"))
    got = {r["id"]: r["clean"] for r in df.collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port 80"
    assert got[3] == "acct <NUMBER> but keep 1234 and v2.0"
    assert got[4] == "nothing sensitive here"


def test_ann_recall_on_clustered_corpus(spark, tmp_path):
    """recall@10 >= 0.8 for every approximate ANN variant on a corpus with
    neighborhood structure (clustered embeddings — the real-world shape;
    the driver's uniform-random vectors have no neighborhoods to recall).
    Exact cosine_topk is the ground truth."""
    import numpy as np

    from fastdb_spark.pipeline.ann import (
        build_ivf_index,
        cosine_topk,
        ivf_search_index,
        ivf_topk,
        lsh_bucketed_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(25, 64)
    rows = [
        (i, [float(x) for x in centers[i % 25] + 0.05 * rng.randn(64)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    idx_path = str(tmp_path / "ivf_idx")
    build_ivf_index(df, idx_path, n_clusters=16, strategy="seed")
    qids = list(range(0, 500, 53))
    vecs = {r["vec_id"]: list(r["embedding"]) for r in df.filter(F.col("vec_id").isin(qids)).collect()}

    from fastdb_spark.pipeline.ann import ivfpq_residual_topk

    methods = {
        "lsh": lambda v: lsh_bucketed_topk(df, v, k=10, multiprobe_bits=1),
        "ivf": lambda v: ivf_topk(df, v, k=10, n_clusters=16, nprobe=2),
        "ivf_index": lambda v: ivf_search_index(spark, idx_path, v, k=10, nprobe=2),
        "ivfpq_residual": lambda v: ivfpq_residual_topk(
            df, v, k=10, n_clusters=16, nprobe=2, rerank=50
        ),
    }
    for name, fn in methods.items():
        recalls = []
        for v in vecs.values():
            exact = {r["vec_id"] for r in cosine_topk(df, v, k=10).collect()}
            appr = {r["vec_id"] for r in fn(v).collect()}
            recalls.append(len(exact & appr) / 10)
        mean = sum(recalls) / len(recalls)
        assert mean >= 0.8, f"{name}: mean recall@10 {mean} {recalls}"
    df.unpersist()


def test_pq_adc_topk_and_rerank(spark):
    """Product quantization: the ADC expression scan must rank the
    clustered corpus well enough that PQ->exact-rerank recovers the exact
    top-10 (the standard PQ-then-refine pipeline), and the codes must be
    compact (M small ints per vector)."""
    import numpy as np

    from fastdb_spark.pipeline.ann import (
        cosine_topk,
        encode_pq,
        pq_topk,
        train_pq,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(20, 64)
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.05 * rng.randn(64)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()

    books = train_pq(df, m=8, k=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = encode_pq(df, books).cache()
    first = enc.head()
    assert len(first["pq_code"]) == 8
    assert all(0 <= c < 16 for c in first["pq_code"])

    recalls = []
    for qid in range(0, 400, 57):
        qvec = rows[qid][1]
        exact = {r["vec_id"] for r in cosine_topk(df, qvec, k=10).collect()}
        got = {
            r["vec_id"]
            for r in pq_topk(
                enc, books, qvec, k=10, rerank=50, embeddings=df
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    # pure ADC (no rerank) still returns a full ranked page, JVM-side
    adc = pq_topk(enc, books, rows[0][1], k=10)
    plan = adc._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan, plan
    assert adc.count() == 10
    df.unpersist()
    enc.unpersist()


def test_ivfpq_topk_recall(spark):
    """IVF-PQ composition: coarse-quantizer pruning + ADC code scan +
    exact rerank recovers the exact top-10 on a clustered corpus."""
    import numpy as np

    from fastdb_spark.pipeline.ann import cosine_topk, ivfpq_topk

    rng = np.random.RandomState(3)
    centers = rng.randn(16, 64)
    rows = [
        (i, [float(x) for x in centers[i % 16] + 0.05 * rng.randn(64)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    recalls = []
    for qid in (0, 111, 222, 333):
        exact = {r["vec_id"] for r in cosine_topk(df, rows[qid][1], k=10).collect()}
        got = {
            r["vec_id"]
            for r in ivfpq_topk(
                df, rows[qid][1], k=10, n_clusters=8, nprobe=3, rerank=40
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    df.unpersist()


def test_cosine_topk_many_matches_single(embs):
    """Batched multi-query top-k must return exactly what the one-query
    operator returns for each query, in one corpus pass."""
    from fastdb_spark.pipeline.ann import cosine_topk, cosine_topk_many

    qids = [0, 100, 250]
    queries = embs.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    many = cosine_topk_many(embs, queries, k=5)
    got = {
        qid: [(r["vec_id"], r["cos"]) for r in many.filter(F.col("query_id") == qid)
              .orderBy(F.desc("cos"), "vec_id").collect()]
        for qid in qids
    }
    for qid in qids:
        qvec = list(embs.filter(F.col("vec_id") == qid).head()["embedding"])
        single = [(r["vec_id"], r["cos"]) for r in cosine_topk(embs, qvec, k=5).collect()]
        assert got[qid] == single, qid
    # one broadcast join, no shuffle of the corpus before scoring
    plan = many._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# decontamination + BM25 retrieval


def test_contamination_planted(spark):
    """A training doc embedding a verbatim eval passage is flagged with the
    right distinct-gram count; clean docs are not."""
    from fastdb_spark.pipeline.decontam import contamination, decontaminate

    passage = " ".join(f"w{i}" for i in range(10))  # 10 tokens -> 3 distinct 8-grams
    ev = spark.createDataFrame([(1, passage)], "doc_id long, text string")
    tr = spark.createDataFrame(
        [
            (10, "prefix " + passage + " suffix"),  # contains all 3 grams
            (11, "totally unrelated words " + " ".join(f"x{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_hits"] for r in contamination(tr, ev, n=8).collect()}
    assert hits == {10: 3}
    clean = decontaminate(tr, ev, n=8)
    assert [r["doc_id"] for r in clean.collect()] == [11]


def test_contamination_short_doc_safe(spark):
    """Docs shorter than n grams contribute nothing (no negative sequence)."""
    from fastdb_spark.pipeline.decontam import contamination

    ev = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    tr = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    assert contamination(tr, ev, n=8).count() == 0


def test_bm25_ranks_relevant_first(spark):
    """The doc stuffed with query terms outranks one brushing past them,
    and a doc with zero query terms is absent."""
    from fastdb_spark.pipeline.retrieval import bm25_topk

    filler = " ".join(f"f{i}" for i in range(30))
    tr = spark.createDataFrame(
        [
            (1, "vector merge filter vector merge filter " + filler),
            (2, "vector " + filler),
            (3, filler),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(tr, ["vector", "merge", "filter"], k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["n_terms"] == 3 and out[1]["n_terms"] == 1
    assert out[0]["score_q"] > out[1]["score_q"] > 0


def test_bm25_plan_no_python(spark):
    """The scoring pipeline stays JVM-side: no BatchEvalPython/ArrowEval
    stages in the physical plan."""
    from fastdb_spark.pipeline.retrieval import bm25_topk

    docs = Catalog(spark, SF).table("documents")
    plan = (
        bm25_topk(docs, ["vector", "merge"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# sequence packing


def test_pack_sequences_ledger(spark):
    """Hand-checkable packing: 3 docs of 5/3/6 tokens at seq_len=4.
    Stream offsets 0,5,8 -> seq ids 0,1,2; doc 1 spans seqs 0-1."""
    from fastdb_spark.pipeline.packing import pack_sequences

    tr = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j k l m n")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs_spanned"])
        for r in pack_sequences(tr, seq_len=4).collect()
    }
    assert out == {1: (0, 0, 2), 2: (1, 1, 1), 3: (2, 0, 2)}


def test_pack_sequences_matches_single_partition(spark):
    """The distributed (range-partitioned) ledger equals the trivial
    single-range one — broadcast base offsets stitch partitions exactly."""
    from fastdb_spark.pipeline.packing import pack_sequences

    docs = Catalog(spark, SF).table("documents")
    a = pack_sequences(docs, seq_len=512, num_ranges=8).toPandas()
    b = pack_sequences(docs, seq_len=512, num_ranges=1).toPandas()
    a = a.sort_values("doc_id", ignore_index=True)
    b = b.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    # total sequences = ceil(total tokens / 512)
    tot = int(a.n_tokens.sum())
    last = a.iloc[-1]
    assert int(last.seq_id) + int(last.n_seqs_spanned) - 1 == (tot - 1) // 512


def test_leakage_safe_split_groups_duplicates(spark):
    """Byte-identical documents always land in the same split; shares
    roughly match the weights; naive id-hash would leak."""
    from fastdb_spark.pipeline.corpus import exactdup_docs
    from fastdb_spark.pipeline.sample import leakage_safe_split

    docs = exactdup_docs(Catalog(spark, SF).table("documents"))
    out = leakage_safe_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}
    ).toPandas()
    planted = out[out.doc_id >= 2000000].copy()
    planted["orig"] = planted.doc_id - 2000000
    merged = planted.merge(
        out, left_on="orig", right_on="doc_id", suffixes=("_copy", "_orig")
    )
    assert len(merged) > 0
    assert (merged.split_copy == merged.split_orig).all()
    share = (out.split == "train").mean()
    assert 0.8 < share < 0.97


def test_leakage_safe_split_by_cluster_label(spark):
    """group_col plugs in near-dup cluster labels: all members of a
    cluster share a split."""
    from fastdb_spark.pipeline.sample import leakage_safe_split

    df = spark.createDataFrame(
        [(1, "x", 100), (2, "y", 100), (3, "z", 200)],
        "doc_id long, text string, cluster long",
    )
    out = {r["doc_id"]: r["split"] for r in
           leakage_safe_split(df, {"train": 0.5, "test": 0.5},
                              group_col="cluster").collect()}
    assert out[1] == out[2]


def test_bm25_many_matches_single(spark):
    """Batched BM25 gives each query exactly the single-query answer."""
    from fastdb_spark.pipeline.retrieval import bm25_topk, bm25_topk_many

    docs = Catalog(spark, SF).table("documents")
    qs = {"q1": ["vector", "merge", "filter"], "q2": ["join", "hash"]}
    many = bm25_topk_many(docs, qs, k=5).toPandas()
    for qid, terms in qs.items():
        single = bm25_topk(docs, terms, k=5).toPandas()
        got = (
            many[many.query_id == qid]
            .drop(columns="query_id")
            .reset_index(drop=True)
        )
        assert got.equals(single)


def test_curate_optional_gates(spark):
    """Decontamination and repetition gates compose into curation without
    changing the default-path result."""
    from fastdb_spark.pipeline.curate import curate_corpus

    docs = Catalog(spark, SF).table("documents")
    base_ids = {r["doc_id"] for r in curate_corpus(docs).select("doc_id").collect()}

    ev = docs.filter(F.col("doc_id") % 7 == 0)
    tr = docs.filter(F.col("doc_id") % 7 != 0)
    dec_ids = {
        r["doc_id"]
        for r in curate_corpus(tr, eval_docs=ev).select("doc_id").collect()
    }
    assert dec_ids <= base_ids and all(i % 7 != 0 for i in dec_ids)

    # NB: survivors are NOT a subset of the default path's — dropping a
    # pair's lower member early re-admits its partner; assert the gate's
    # actual guarantee: no noisy doc survives, and the cut is non-trivial
    from fastdb_spark.pipeline.textstats import repetition_stats

    noisy = {
        r["doc_id"]
        for r in repetition_stats(docs)
        .filter(F.col("top_word_ppm") > 120000)
        .select("doc_id")
        .collect()
    }
    rep_ids = {
        r["doc_id"]
        for r in curate_corpus(docs, max_top_word_ppm=120000)
        .select("doc_id")
        .collect()
    }
    assert noisy and not (rep_ids & noisy)


def test_fuzzy_contamination_catches_paraphrase(spark):
    """A lightly-edited copy of an eval doc evades exact 8-gram matching
    only when every 8-gram is broken, but MinHash still flags it; an
    unrelated doc is not flagged."""
    from fastdb_spark.pipeline.decontam import (
        decontaminate_fuzzy,
        fuzzy_contamination,
    )

    words = [f"w{i}" for i in range(40)]
    # edit every 6th word -> no 8-gram survives, Jaccard(3-shingles) still high
    edited = [w if i % 6 else f"x{i}" for i, w in enumerate(words)]
    ev = spark.createDataFrame([(900001, " ".join(words))], "doc_id long, text string")
    tr = spark.createDataFrame(
        [
            (1, " ".join(edited)),
            (2, " ".join(f"z{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    # low-threshold fuzzy matching needs banding tuned to the threshold:
    # rows-per-band=1 makes candidate recall ~1-(1-J)^12 (the exact
    # jaccard refine keeps precision)
    mh = dict(n_hashes=12, bands=12)
    flags = fuzzy_contamination(tr, ev, threshold=0.3, **mh).collect()
    assert {(r["doc_id"], r["eval_id"]) for r in flags} == {(1, 900001)}
    clean = decontaminate_fuzzy(tr, ev, threshold=0.3, **mh)
    assert [r["doc_id"] for r in clean.collect()] == [2]

    # sanity: exact 8-gram contamination indeed misses the paraphrase
    from fastdb_spark.pipeline.decontam import contamination

    assert contamination(tr, ev, n=8).count() == 0


def test_bm25_many_join_strategy_matches(spark):
    """Past the 32-term threshold the explode+broadcast-join path must
    return exactly what the in-array path returns."""
    from fastdb_spark.pipeline.retrieval import bm25_topk_many

    docs = Catalog(spark, SF).table("documents")
    # 33 distinct terms across two queries forces the join path
    pad = [f"nosuchterm{i}" for i in range(30)]
    qs = {"q1": ["vector", "merge", "filter"] + pad[:15],
          "q2": ["join", "hash"] + pad[15:]}
    big = bm25_topk_many(docs, qs, k=5).toPandas()
    small = {"q1": ["vector", "merge", "filter"], "q2": ["join", "hash"]}
    ref = bm25_topk_many(docs, small, k=5).toPandas()
    # the padding terms never occur, so results must be identical
    assert big.sort_values(["query_id", "doc_id"], ignore_index=True).equals(
        ref.sort_values(["query_id", "doc_id"], ignore_index=True)
    )


def test_ivfpq_residual_recall(embs):
    """Residual IVF-PQ returns k results including the query vector and
    overlaps the exact top-10 at least as the coarse IVF-PQ does."""
    from fastdb_spark.pipeline.ann import ivfpq_residual_topk, ivfpq_topk

    qvec = list(embs.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(embs, qvec, k=10).collect()]
    res = [r["vec_id"] for r in
           ivfpq_residual_topk(embs, qvec, k=10, rerank=50).collect()]
    assert len(res) == 10 and 0 in res
    base = [r["vec_id"] for r in
            ivfpq_topk(embs, qvec, k=10, rerank=50).collect()]
    assert len(set(exact) & set(res)) >= len(set(exact) & set(base)) - 1


def test_pack_manifest_tiles_sequences(spark):
    """Every sequence's slices tile it exactly (sum of lengths = seq_len,
    contiguous, except a shorter final sequence), and each doc's slices
    cover the doc contiguously."""
    from fastdb_spark.pipeline.packing import pack_manifest

    docs = Catalog(spark, SF).table("documents")
    man = pack_manifest(docs, seq_len=512).toPandas()
    per_seq = man.groupby("seq_id")["length"].sum()
    assert (per_seq.iloc[:-1] == 512).all() and per_seq.iloc[-1] <= 512
    # contiguity inside each sequence
    for sid, g in man.groupby("seq_id"):
        g = g.sort_values("seq_offset")
        assert g.seq_offset.iloc[0] == 0
        assert ((g.seq_offset + g.length).iloc[:-1].values
                == g.seq_offset.iloc[1:].values).all()
    # each doc covered exactly once
    per_doc = man.groupby("doc_id")["length"].sum()
    import pandas as pd
    ntok = (
        docs.selectExpr("doc_id", "size(split(text, ' ')) AS n").toPandas()
        .set_index("doc_id")["n"]
    )
    assert per_doc.eq(ntok.loc[per_doc.index]).all()
