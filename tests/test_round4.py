"""Round-4 regression tests: LSH bucket cap, anchored WARC framing,
overflow-safe packing buckets, split-weight validation, quantile-probe
quantizer sampling, and the persisted IVF-PQ index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- LSH candidate-pair bucket cap -----------------------------------------


def test_bucket_cap_defuses_duplicate_bomb(spark):
    """A corpus of byte-identical documents puts every id in every band
    bucket; uncapped that is O(n²) pairs from each bucket.  With the cap
    the pair generation completes and the bomb's buckets emit nothing,
    while oversized_buckets() accounts for what was dropped."""
    from fastdb_spark.pipeline.dedup import minhash_lsh_pairs

    n = 3000
    rows = [(i, "exactly the same document text repeated verbatim")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, max_bucket_size=100)
    # every bucket holds all n ids > cap -> dropped wholesale
    assert pairs.count() == 0

    from fastdb_spark.cachereg import release_staged

    release_staged()


def test_bucket_cap_default_transparent_on_normal_corpus(spark):
    """On a normal near-dup corpus the default cap never triggers: capped
    and uncapped outputs are identical."""
    from fastdb_spark.catalog import Catalog
    from fastdb_spark.pipeline.corpus import neardup_docs
    from fastdb_spark.pipeline.dedup import minhash_lsh_pairs

    docs = neardup_docs(
        Catalog(spark, "/root/testdata/sf0.001").table("documents")
    )
    capped = minhash_lsh_pairs(docs).toPandas()
    uncapped = minhash_lsh_pairs(docs, max_bucket_size=None).toPandas()
    key = ["id_a", "id_b"]
    assert capped.sort_values(key, ignore_index=True).equals(
        uncapped.sort_values(key, ignore_index=True)
    )

    from fastdb_spark.cachereg import release_staged

    release_staged()


def test_oversized_buckets_accounting(spark):
    from fastdb_spark.pipeline.dedup import oversized_buckets

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, bkt int"
    )
    big = oversized_buckets(df, "doc_id", "bkt", max_bucket_size=5).collect()
    assert len(big) == 3 and all(r["size"] == 10 for r in big)
    none = oversized_buckets(df, "doc_id", "bkt", max_bucket_size=10).collect()
    assert none == []


# --- anchored WARC record framing ------------------------------------------


def test_wet_body_containing_version_string_not_split(spark, tmp_path):
    """A page ABOUT web archiving legitimately contains the literal
    'WARC/1.0' in its body; the anchored separator must not split there
    and the record must survive intact with its full text."""
    from fastdb_spark.sources.webtext import read_wet

    body = "the WARC/1.0 format line\r\nappears inside this page text"
    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/about-warc\r\n"
        "WARC-Date: 2026-01-02T00:00:00Z\r\n"
        f"Content-Length: {len(body.encode())}\r\n"
        "\r\n"
        f"{body}\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/next\r\n"
        "WARC-Date: 2026-01-02T00:00:01Z\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "next page\r\n"
        "\r\n"
    )
    p = tmp_path / "about.warc.wet"
    p.write_text(wet)
    out = {r["url"]: r["text"] for r in read_wet(spark, str(p)).collect()}
    assert out["http://example.com/about-warc"] == (
        "the WARC/1.0 format line\r\nappears inside this page text"
    )
    assert out["http://example.com/next"] == "next page"


def test_wet_content_length_mismatch_rejected(spark, tmp_path):
    """A record whose body length contradicts its Content-Length header
    (the signature of separator corruption) is rejected, not passed
    through silently."""
    from fastdb_spark.sources.webtext import read_wet

    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/corrupt\r\n"
        "WARC-Date: 2026-01-02T00:00:00Z\r\n"
        "Content-Length: 500\r\n"
        "\r\n"
        "way too short\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/good\r\n"
        "WARC-Date: 2026-01-02T00:00:01Z\r\n"
        "Content-Length: 7\r\n"
        "\r\n"
        "good ok\r\n"
        "\r\n"
    )
    p = tmp_path / "corrupt.warc.wet"
    p.write_text(wet)
    out = [r["url"] for r in read_wet(spark, str(p)).collect()]
    assert out == ["http://example.com/good"]


# --- overflow-safe packing buckets -----------------------------------------


def test_pack_sequences_full_range_ids(spark):
    """Doc ids spanning more than 2^63 (full-range signed xxhash64 ids)
    must not wrap the bucket arithmetic: the ledger must equal the plain
    id-ordered cumsum computed in Python."""
    from fastdb_spark.pipeline.packing import pack_sequences

    ids = [-(2**63) + 3, -(2**62), -5, 7, 2**61, 2**63 - 10]
    toks = [5, 17, 3, 40, 11, 29]
    rows = [(i, " ".join(["w"] * t)) for i, t in zip(ids, toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs_spanned"])
        for r in pack_sequences(df, seq_len=16, num_ranges=4).collect()
    }
    start = 0
    for i, t in sorted(zip(ids, toks)):
        exp = (
            start // 16,
            start % 16,
            0 if t == 0 else (start + t - 1) // 16 - start // 16 + 1,
        )
        assert got[i] == exp, (i, got[i], exp)
        start += t


def test_pack_sequences_sparse_skewed_ids(spark):
    """Sparse, heavily skewed id spaces (all mass in one corner of the
    range) stay CORRECT — bucket skew affects balance only."""
    from fastdb_spark.pipeline.packing import pack_sequences

    ids = [0, 1, 2, 3, 2**62]
    toks = [4, 4, 4, 4, 4]
    rows = [(i, " ".join(["w"] * t)) for i, t in zip(ids, toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, seq_len=6, num_ranges=8).collect()
    }
    start = 0
    for i, t in sorted(zip(ids, toks)):
        assert got[i] == (start // 6, start % 6)
        start += t


# --- split-weight validation ------------------------------------------------


def test_leakage_safe_split_rejects_bad_weights(spark):
    from fastdb_spark.pipeline.sample import leakage_safe_split

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, {"train": 0.8, "val": 0.3})
    with pytest.raises(ValueError, match="at least one"):
        leakage_safe_split(df, {})
    # a valid sum still works
    assert "split" in leakage_safe_split(df, {"train": 0.9, "val": 0.1}).columns


# --- quantile-probe quantizer sampling --------------------------------------


def test_seed_training_vectors_sparse_hashed_ids(spark):
    """xxhash64-style sparse ids: the modulo filter would select ~nothing;
    the quantile-probe sampler must return exactly k spread vectors."""
    from fastdb_spark.pipeline.ann import _seed_training_vectors

    import hashlib

    def hid(i):
        h = int.from_bytes(
            hashlib.md5(f"id{i}".encode()).digest()[:8], "big", signed=True
        )
        return h

    rows = [(hid(i), [float(i)] * 4) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vecs = _seed_training_vectors(df, 8, "vec_id", "embedding")
    assert len(vecs) == 8
    assert len({tuple(v) for v in vecs}) == 8  # distinct vectors


def test_seed_training_vectors_raises_on_tiny_corpus(spark):
    from fastdb_spark.pipeline.ann import _seed_training_vectors

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="need 5"):
        _seed_training_vectors(df, 5, "vec_id", "embedding")


# --- persisted IVF-PQ index --------------------------------------------------


@pytest.fixture(scope="module")
def clustered(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    centers = rng.randn(12, 32)
    rows = [
        (i, [float(x) for x in centers[i % 12] + 0.05 * rng.randn(32)])
        for i in range(360)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_ivfpq_search_index_recall(spark, clustered, tmp_path):
    """build once (pq_m set) -> query many: the persisted-layout search
    must reach >=0.8 mean recall@10 on a clustered corpus for both the
    raw and residual codebook variants."""
    from fastdb_spark.pipeline.ann import (
        build_ivf_index,
        cosine_topk,
        ivfpq_search_index,
    )

    for residual in (False, True):
        path = str(tmp_path / f"idx_res{residual}")
        build_ivf_index(
            clustered, path, n_clusters=8, strategy="seed",
            pq_m=8, pq_k=16, pq_residual=residual,
        )
        recalls = []
        for qid in (0, 77, 154, 231):
            qvec = list(
                clustered.filter(F.col("vec_id") == qid).head()["embedding"]
            )
            exact = {
                r["vec_id"] for r in cosine_topk(clustered, qvec, k=10).collect()
            }
            got = {
                r["vec_id"]
                for r in ivfpq_search_index(
                    spark, path, qvec, k=10, nprobe=3, rerank=60
                ).collect()
            }
            recalls.append(len(exact & got) / 10)
        assert sum(recalls) / len(recalls) >= 0.8, (residual, recalls)


def test_ivfpq_index_layout_partitioned_and_code_stored(spark, clustered, tmp_path):
    """The persisted layout is the train-once/query-many shape: vectors
    parquet is partitioned by cluster (directory pruning), every row
    stores its pq_code, and the codebooks table is M*K rows."""
    import os

    from fastdb_spark.pipeline.ann import build_ivf_index

    path = str(tmp_path / "layout")
    build_ivf_index(
        clustered, path, n_clusters=4, strategy="seed",
        pq_m=4, pq_k=8, pq_residual=True,
    )
    subdirs = [
        d for d in os.listdir(os.path.join(path, "vectors"))
        if d.startswith("cluster=")
    ]
    assert len(subdirs) >= 2
    vecs = spark.read.parquet(os.path.join(path, "vectors"))
    assert {"vec_id", "pq_code", "embedding", "cluster"} <= set(vecs.columns)
    assert vecs.count() == 360
    books = spark.read.parquet(os.path.join(path, "codebooks"))
    assert books.count() == 4 * 8
    assert books.filter(~F.col("residual")).count() == 0


def test_encode_pq_residual_carries_given_cluster(spark, clustered):
    """With cluster_col passed, the encode pass must reuse the given
    assignment verbatim (never recompute-and-disagree)."""
    from fastdb_spark.pipeline.ann import (
        encode_pq_residual,
        ivf_centroids,
        train_pq_residual,
        with_ivf_cluster,
    )

    cents = ivf_centroids(clustered, n_clusters=6)
    books = train_pq_residual(clustered, cents, m=4, k=8)
    tagged = with_ivf_cluster(clustered, cents)
    enc = encode_pq_residual(
        tagged, cents, books, cluster_col="cluster"
    ).collect()
    want = {r["vec_id"]: r["cluster"] for r in tagged.collect()}
    assert all(r["cluster"] == want[r["vec_id"]] for r in enc)


# --- Delta MERGE branch (env-gated) ------------------------------------------


def test_merge_upsert_engine_dispatch(spark, tmp_path):
    """engine='parquet' always works; engine='delta' raises cleanly when
    the package is absent and runs a real MERGE INTO when present."""
    from fastdb_spark.storage import HAVE_DELTA, DeltaTableStore, merge_upsert

    p = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    merge_upsert(spark, p, df1, ["id"], "nothing", engine="parquet")
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    merge_upsert(spark, p, df2, ["id"], "update", engine="parquet")
    got = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    with pytest.raises(ValueError, match="unknown engine"):
        merge_upsert(spark, p, df2, ["id"], "update", engine="duckdb")

    if not HAVE_DELTA:
        with pytest.raises(ImportError, match="delta-spark"):
            DeltaTableStore(spark, str(tmp_path / "d"))
        return

    # env-gated: only runs where the delta jars + package exist
    dp = str(tmp_path / "delta_tbl")
    merge_upsert(spark, dp, df1, ["id"], "nothing", engine="delta")
    merge_upsert(spark, dp, df2, ["id"], "update", engine="delta")
    got = {
        r["id"]: r["v"]
        for r in spark.read.format("delta").load(dp).collect()
    }
    assert got == {1: "a", 2: "B", 3: "c"}


# --- kafka transport gate ----------------------------------------------------


def test_kafka_transport_gate_pins_jar(spark):
    """Without the spark-sql-kafka jar the transport builders raise an
    actionable error naming the exact maven coordinate; with the jar they
    construct the streaming plan (env-gated)."""
    from fastdb_spark.sources.kafka import (
        have_kafka_source,
        kafka_jar_coordinate,
        read_alert_stream,
    )

    coord = kafka_jar_coordinate(spark)
    assert coord.startswith("org.apache.spark:spark-sql-kafka-0-10_")
    assert spark.version in coord
    if have_kafka_source(spark):
        df = read_alert_stream(spark, "localhost:9092", "alerts", '"long"')
        assert df.isStreaming
    else:
        with pytest.raises(ImportError, match="spark-sql-kafka"):
            read_alert_stream(spark, "localhost:9092", "alerts", '"long"')


# --- per-table write lock (concurrent writers) -------------------------------


def test_table_write_lock_stale_break_and_timeout(tmp_path):
    import os

    from fastdb_spark.locks import table_write_lock

    p = str(tmp_path / "tbl")
    # stale lock from a "crashed" writer is broken
    stale = p + ".write.lock"
    with open(stale, "w") as f:
        f.write("dead")
    os.utime(stale, (0, 0))  # epoch mtime -> definitely stale
    with table_write_lock(p, stale=1.0):
        assert os.path.exists(stale)  # we now hold it
    assert not os.path.exists(stale)

    # a live lock makes a second acquirer time out
    with table_write_lock(p):
        with pytest.raises(TimeoutError):
            with table_write_lock(p, timeout=0.3, stale=3600):
                pass


def test_parquet_upsert_concurrent_writers_no_lost_update(spark, tmp_path):
    """Four threads race disjoint-key UPDATE upserts (read-merge-rewrite);
    without the per-table lock the last overwrite would discard earlier
    batches.  With it, every batch survives."""
    import threading

    from fastdb_spark.storage import ParquetTable

    p = str(tmp_path / "ctbl")
    t = ParquetTable(spark, p)
    t.overwrite(spark.createDataFrame([(0, "seed")], "id long, v string"))
    errs = []

    def writer(base):
        try:
            df = spark.createDataFrame(
                [(base + i, f"w{base + i}") for i in range(5)],
                "id long, v string",
            )
            t.upsert(df, ["id"], "update")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=(100 * k,)) for k in range(1, 5)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    assert not errs, errs
    got = {r["id"] for r in t.read().collect()}
    want = {0} | {100 * k + i for k in range(1, 5) for i in range(5)}
    assert got == want


# --- unigram-LM perplexity ---------------------------------------------------


def test_perplexity_scores_fluent_vs_gibberish(spark):
    """Corpus-typical documents score LOWER perplexity than a document of
    singleton gibberish tokens; the filter keeps the fluent ones."""
    from fastdb_spark.pipeline.lm import doc_perplexity, perplexity_filter

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zxqv jkwp mmtr qqld uuyx oprw"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r["doc_id"]: r["ppl"] for r in doc_perplexity(df).collect()}
    assert scores[100] > scores[0] * 2
    kept = {r["doc_id"] for r in perplexity_filter(df, scores[0] + 1).collect()}
    assert 100 not in kept and 0 in kept


def test_perplexity_against_reference_lm(spark):
    """Scoring against an EXTERNAL reference LM: a doc made of reference
    vocabulary scores far lower than one the reference never saw."""
    from fastdb_spark.pipeline.lm import doc_perplexity, train_unigram_lm

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    lm = train_unigram_lm(ref)
    target = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "unknown words only here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["ppl"] for r in doc_perplexity(target, lm=lm).collect()}
    assert out[2] > out[1] * 3


def test_perplexity_plan_broadcasts_lm(spark):
    """The LM join must be a broadcast (map-side in the corpus scan
    stage), never a sort-merge shuffle of the token stream."""
    from fastdb_spark.catalog import Catalog
    from fastdb_spark.pipeline.lm import doc_perplexity

    docs = Catalog(spark, "/root/testdata/sf0.001").table("documents")
    plan = (
        doc_perplexity(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_perplexity_orders_fluency(spark):
    """Documents reusing the corpus' bigram transitions score lower
    perplexity than documents of the same tokens in scrambled order —
    exactly what the bigram model adds over the unigram."""
    from fastdb_spark.pipeline.lm import doc_perplexity_bigram

    base = "the cat sat on the mat and the dog sat on the rug"
    scrambled = "mat the on dog sat the rug and cat the on sat the"
    rows = [(i, base) for i in range(10)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"] for r in doc_perplexity_bigram(df).collect()}
    assert out[99] > out[0] * 2


def test_ivfpq_search_index_many_matches_single(spark, clustered, tmp_path):
    """The batched persisted-index probe must return exactly what the
    single-query probe returns for each query, in one corpus pass."""
    from fastdb_spark.pipeline.ann import (
        build_ivf_index,
        ivfpq_search_index,
        ivfpq_search_index_many,
    )

    path = str(tmp_path / "many_idx")
    build_ivf_index(
        clustered, path, n_clusters=8, strategy="seed",
        pq_m=8, pq_k=16, pq_residual=True,
    )
    qids = [0, 120, 241]
    vecs = {
        str(q): list(clustered.filter(F.col("vec_id") == q).head()["embedding"])
        for q in qids
    }
    many = ivfpq_search_index_many(
        spark, path, vecs, k=10, nprobe=3, rerank=50
    ).toPandas()
    for q in qids:
        single = [
            r["vec_id"]
            for r in ivfpq_search_index(
                spark, path, vecs[str(q)], k=10, nprobe=3, rerank=50
            ).collect()
        ]
        got = many[many.query_id == str(q)]["vec_id"].tolist()
        assert set(got) == set(single), (q, got, single)
    assert len(many) == 30


# --- duplicate-span detection ------------------------------------------------


def test_duplicate_spans_finds_planted_boilerplate(spark):
    """A shared 8-token license header across otherwise-distinct docs is
    found; unique text is not flagged."""
    from fastdb_spark.pipeline.spans import duplicate_spans, flag_span_duplicates

    header = "licensed under the apache license version two zero"
    rows = [
        (1, header + " alpha beta gamma delta epsilon"),
        (2, header + " completely different tail content here"),
        (3, "no shared prefix at all in this document text body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, n=8, min_docs=2).collect()
    assert spans and all(r["doc_ids"] == "1,2" for r in spans)

    flags = {r["doc_id"]: r for r in flag_span_duplicates(df, n=8).collect()}
    assert flags[1]["n_dup_windows"] >= 1
    assert flags[3]["n_dup_windows"] == 0 and flags[3]["dup_frac_ppm"] == 0


def test_embedding_lsh_bucket_cap(spark):
    """The LSH-strategy GEMM must skip buckets above the cap (per-task
    memory guard) while small buckets still pair normally."""
    from fastdb_spark.pipeline.dedup import embedding_neardup_pairs

    # 300 identical vectors -> one giant bucket; 2 near-dup outliers in
    # (likely) another bucket
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]
    rows += [(1000, [-1.0, -1.0, 0.0, 0.0]), (1001, [-1.0, -1.001, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs(
        df, strategy="lsh", dim=4, max_bucket_size=50
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (1000, 1001) in got            # small bucket still works
    assert not any(a < 300 and b < 300 for a, b in got)  # bomb dropped


def test_ivf_index_upsert_incremental(spark, clustered, tmp_path):
    """Appending a batch reuses the frozen quantizers, lands rows in
    their cluster directories WITHOUT rewriting untouched partitions,
    and the persisted search sees the new vectors immediately."""
    import glob
    import os

    from fastdb_spark.pipeline.ann import (
        build_ivf_index,
        ivf_index_upsert,
        ivfpq_search_index,
    )

    path = str(tmp_path / "upsert_idx")
    build_ivf_index(
        clustered, path, n_clusters=8, strategy="seed",
        pq_m=8, pq_k=16, pq_residual=True,
    )
    before = {
        d: sorted(glob.glob(os.path.join(d, "*.parquet")))
        for d in glob.glob(os.path.join(path, "vectors", "cluster=*"))
    }
    # a batch of near-clones of vector 0 (same cluster as id 0)
    v0 = list(clustered.filter(F.col("vec_id") == 0).head()["embedding"])
    newbie = spark.createDataFrame(
        [(10_000 + i, [x + 0.001 * i for x in v0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    n = ivf_index_upsert(newbie, path)
    assert n == 3
    after = {
        d: sorted(glob.glob(os.path.join(d, "*.parquet")))
        for d in glob.glob(os.path.join(path, "vectors", "cluster=*"))
    }
    changed = [d for d in before if before[d] != after.get(d, [])]
    assert 1 <= len(changed) <= 2  # only the batch's cluster dirs grew
    for d in changed:
        assert set(before[d]) <= set(after[d])  # append, not rewrite
    got = {
        r["vec_id"]
        for r in ivfpq_search_index(spark, path, v0, k=10, nprobe=3).collect()
    }
    assert {10_000, 10_001, 10_002} <= got


def test_materialize_packed_tiles_exactly(spark):
    """Every materialized sequence has exactly seq_len tokens (shorter
    final), and concatenating all sequences reproduces the id-ordered
    corpus token stream."""
    from fastdb_spark.catalog import Catalog
    from fastdb_spark.pipeline.packing import materialize_packed

    docs = Catalog(spark, "/root/testdata/sf0.001").table("documents")
    out = materialize_packed(docs, seq_len=512).orderBy("seq_id").collect()
    assert all(r["n_tokens"] == 512 for r in out[:-1])
    assert 0 < out[-1]["n_tokens"] <= 512
    stream = " ".join(r["text"] for r in out).split(" ")
    want = []
    for r in docs.orderBy("doc_id").select("text").collect():
        want.extend(r["text"].split(" "))
    assert stream == want


def test_curate_with_perplexity_and_span_gates(spark):
    """The composed curation pipeline honors the new fluency and
    duplicate-span gates end-to-end (tested one gate at a time — the
    shared-prefix corpus that exercises the span gate is, correctly,
    also near-duplicate prey for every other stage)."""
    from fastdb_spark.cachereg import release_staged
    from fastdb_spark.pipeline.curate import curate_corpus

    # --- perplexity gate: gibberish dies, fluent survives ---------------
    fluent = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, fluent + f" variant {i}") for i in range(20)]
    rows.append((500, "zxqv jkwp mmtr qqld uuyx oprw qwerty asdfgh zxcvbn plmokn ijnuhb ygvtfc"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in curate_corpus(df, min_tokens=5, min_quality=0.0, max_ppl=40.0).collect()
    }
    release_staged()
    assert 500 not in kept  # gibberish cut by the perplexity gate
    assert 0 in kept        # canonical fluent doc survives all stages

    # --- span gate: shared boilerplate dies, distinct text survives -----
    boiler = "licensed under the apache license version two zero exactly as written"
    rows2 = [
        (600, boiler + " first tail marker alpha beta"),
        (601, boiler + " second tail marker gamma delta"),
        (700, "completely different prose with no repeated window anywhere at all today"),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    kept2 = {
        r["doc_id"]
        for r in curate_corpus(
            df2, min_tokens=5, min_quality=0.0,
            max_span_dup_ppm=300_000, span_n=8,
        ).collect()
    }
    release_staged()
    assert not {600, 601} & kept2  # BOTH boilerplate docs cut (near-dup
    # alone would have kept the lower id — the span gate kills the pair)
    assert 700 in kept2


def test_temperature_mix_shares(spark):
    """alpha=1 reproduces the natural mixture, alpha=0 is uniform, and
    alpha=0.3 lifts the rare stratum while keeping the order."""
    from fastdb_spark.pipeline.sample import (
        domain_mix_sample,
        temperature_mix_shares,
    )

    rows = [(i, "en") for i in range(900)] + [(1000 + i, "fr") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    nat = temperature_mix_shares(df, "lang", alpha=1.0)
    assert abs(nat["en"] - 0.9) < 1e-9 and abs(nat["fr"] - 0.1) < 1e-9
    uni = temperature_mix_shares(df, "lang", alpha=0.0)
    assert abs(uni["en"] - 0.5) < 1e-9
    t = temperature_mix_shares(df, "lang", alpha=0.3)
    assert 0.1 < t["fr"] < 0.5 < t["en"] < 0.9
    assert abs(sum(t.values()) - 1.0) < 1e-9
    # and the shares drive the existing sampler end-to-end
    mixed = domain_mix_sample(df, "lang", t, 0.5, "doc_id")
    got = {r["lang"]: r["n"] for r in
           mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["fr"] > 50  # rare stratum lifted well above natural 0.5*100*0.1


def test_quality_classifier_separates_planted(spark, tmp_path):
    """Weak-label bootstrap -> LR -> held-out separation: fluent docs
    score higher p_good than gibberish, and the model round-trips
    through save/load (train-once/score-many)."""
    import random

    from fastdb_spark.pipeline.classify import (
        classifier_filter,
        quality_features,
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    rng = random.Random(5)
    words = ("the of and to in for on with as at by from this that it is "
             "was are be have not they you we all one new more").split()
    junk = ["zxq", "@#$%", "qqqq", "////", "kjh!", "0x1f", "~~~~", "%%a"]
    rows = []
    for i in range(60):  # fluent: common words, low punct
        rows.append((i, " ".join(rng.choice(words) for _ in range(40))))
    for i in range(60):  # junk: rare tokens, heavy punctuation
        rows.append((1000 + i, " ".join(rng.choice(junk) for _ in range(40))))
    mid = ("apple banana cherry dragonfruit elderberry figs grapes honeydew "
           "kiwano lemons mangoes nectarine").split()
    for i in range(20):  # ambiguous: clean text, zero stopwords
        rows.append((2000 + i, " ".join(rng.choice(mid) for _ in range(40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    feats = quality_features(df).cache()
    labels = weak_quality_labels(feats)
    # weak labels must cover both classes but not everything
    lab = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert {0.0, 1.0} <= set(lab.values())
    assert not any(2000 <= d < 3000 for d in lab)  # ambiguous mid excluded

    model = train_quality_classifier(feats, labels)
    scores = {r["doc_id"]: r["p_good"] for r in score_quality(feats, model).collect()}
    good = sum(scores[i] for i in range(60)) / 60
    bad = sum(scores[1000 + i] for i in range(60)) / 60
    assert good > 0.8 > 0.2 > bad, (good, bad)

    kept = {r["doc_id"] for r in classifier_filter(df, model=model).collect()}
    assert all(i in kept for i in range(60))
    assert not any(1000 + i in kept for i in range(60))

    # persistence round-trip
    p = str(tmp_path / "qmodel")
    model.write().overwrite().save(p)
    from pyspark.ml import PipelineModel

    again = PipelineModel.load(p)
    s2 = {r["doc_id"]: r["p_good"] for r in score_quality(feats, again).collect()}
    assert s2 == scores
    feats.unpersist()
