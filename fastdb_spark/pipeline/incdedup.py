"""Incremental corpus dedup against a PERSISTED dedup index — the
document-side twin of ``ann.ivf_index_upsert``.

A production corpus grows by crawl increments; re-running global dedup
over 100 TB for every daily batch is the naive O(N) answer.  The right
shape is train-once/probe-many, like the ANN index: persist the dedup
artifacts (content fingerprints for exact dedup; MinHash band buckets +
shingle sets for near-dup), check each NEW batch against them, and
append only the survivors' entries.

Index layout (``path/``):

- ``fingerprints/`` — (fingerprint, doc_id) parquet: one row per
  surviving document, the exact-dedup anti-join side.
- ``bands/``       — (band, doc_id) parquet: LSH band buckets of the
  survivors; the near-dup candidate join side.  At 100 TB this table
  should be written bucketed/partitioned by band hash range so the
  increment join prunes (documented; the emulation appends plain files).
- ``shingles/``    — (doc_id, sh) parquet: shingle arrays for the exact
  Jaccard refine of candidate pairs.
- ``_meta.json``   — sketch parameters; upserts enforce consistency (a
  batch banded with different parameters would silently miss dups).

Incremental semantics (stated precisely, tested): a new document is
dropped iff (a) its fingerprint already exists in the index or collides
within the batch (keep min id), or (b) its Jaccard vs ANY indexed
document >= threshold, or (c) the in-batch greedy-MIS near-dup pass
(keep x iff no KEPT lower-id near neighbor — replay-idempotent,
``dedup.greedy_mis_drops``; ``curate_corpus`` keeps the simpler
one-shot rule, which coincides on clique-shaped duplicate families)
drops it.  Concurrent upserts serialize on the table write lock
(``locks.table_write_lock``) — same lost-update story as storage.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastdb_spark.functions.sketches import lsh_band_hashes, minhash_signature
from fastdb_spark.functions.text import doc_fingerprint, word_shingles
from fastdb_spark.locks import table_write_lock
from fastdb_spark.pipeline.dedup import (
    DEFAULT_MAX_BUCKET,
    _candidate_pairs,
    jaccard,
)

_META = "_meta.json"

#: sketch-scheme marker per hash implementation.  The marker names the
#: STORED band-key/signature format (ADVICE r6: recording 'md5x' for
#: xxhash64-permuted fast indexes would misdescribe them to any consumer
#: keying off sketch_scheme alone): 'md5x' = one md5 per shingle +
#: integer permutations; 'xx-fast' = one xxhash64 per shingle + xxhash64
#: permutations.  Upserts require the index marker to be the one its
#: recorded hash_impl produces TODAY — an index persisted under any
#: older in-place format change is refused with a rebuild message.
SKETCH_SCHEMES = {"md5": "md5x", "fast": "xx-fast"}

#: default id-hash partition count for the three index tables.  Removal
#: rewrites only the partitions holding removed ids, so the takedown bill
#: is ~(buckets touched / id_buckets) of the index instead of all of it;
#: a takedown batch of k ids touches at most min(k, id_buckets)
#: partitions.  32 keeps gate-scale indexes at a few files per table;
#: a 100-TB index would raise it (recorded per-index in _meta.json, so
#: the choice is frozen at build time and consistent across upserts).
DEFAULT_ID_BUCKETS = 32


def _params_path(path: str) -> str:
    return os.path.join(path, _META)


def _sketch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    n_hashes: int,
    bands: int,
    hash_impl: str = "md5",
) -> DataFrame:
    """(id, fingerprint, sh, sig) for a batch — computed once, reused by
    every phase (cachereg-staged by callers).

    ``hash_impl`` mirrors :func:`~fastdb_spark.pipeline.dedup.
    minhash_lsh_pairs`: ``"md5"`` (cross-engine oracle parity) or
    ``"fast"`` (one xxhash64 per shingle + integer permutations, ~3x
    cheaper signatures — the sketch dominates index build/upsert cost,
    so this is the production path at scale).  The Jaccard refine is
    over raw shingles either way, so final dedup decisions are
    identical in expectation; exact duplicates collide in every band
    under both."""
    from fastdb_spark.functions.sketches import (
        lsh_band_hashes_fast,
        minhash_signature_fast,
    )

    if hash_impl not in ("md5", "fast"):
        raise ValueError(f"unknown hash_impl {hash_impl!r}")
    mk_sig = minhash_signature if hash_impl == "md5" else minhash_signature_fast
    mk_bands = lsh_band_hashes if hash_impl == "md5" else lsh_band_hashes_fast
    rows = n_hashes // bands
    return df.select(
        F.col(id_col),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn(
        "sig", mk_sig(F.col("sh"), n_hashes)
    ).withColumn(
        "bands", mk_bands(F.col("sig"), bands, rows)
    )


def _staged_sketch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    n_hashes: int,
    bands: int,
    hash_impl: str,
) -> DataFrame:
    """Stage (persist + eager count) the sketch frame, spreading
    pathologically under-split inputs FOR THE MATERIALIZATION ONLY.

    The md5/shingle sketch is the compute-heavy pass of every index
    build/upsert/probe; when the input arrives as fewer partitions than
    a quarter of the cores (one local parquet split; a single huge gzip
    at deployment — guide §2.5 "input skew ... repartition immediately
    after the read") the eager count runs it nearly single-task.
    Repartitioning cures that but must NOT leak downstream: the staged
    frame feeds a ~100-job maintenance choreography of tiny
    broadcast/AQE stages, and the r12 session-1 experiment measured the
    un-collapsed spread at 2.4x the gate (every 50 ms 1-task job became
    a 0.3-0.5 s 32-task job).  So the spread frame is staged wide — the
    count materializes the cache in parallel — and the RETURNED view is
    ``coalesce`` back to the input's own partition count: downstream
    cache scans read the same blocks in the same narrow stages as
    before.  Well-split inputs (every deployment-scale corpus) take the
    unchanged path: no extra shuffle, no coalesce throttle."""
    from fastdb_spark.cachereg import stage

    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n * 4 <= par:
        sk = stage(
            _sketch(
                df.repartition(par), id_col, text_col,
                shingle_k, n_hashes, bands, hash_impl,
            )
        )
        return sk.coalesce(max(n, 1))
    return stage(
        _sketch(df, id_col, text_col, shingle_k, n_hashes, bands, hash_impl)
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    hash_impl: str = "md5",
    id_buckets: int | None = DEFAULT_ID_BUCKETS,
) -> int:
    """Curate ``docs`` (exact + in-batch near-dup, the ``curate_corpus``
    dedup semantics) and persist the survivors' dedup artifacts.
    Returns the number of indexed documents.

    ``max_bucket_size=None`` (the default) matches ``curate_corpus``
    exactly: the exact-dedup pre-pass has already collapsed identical
    boilerplate, so the LSH bucket cap is dead weight here; pass a cap
    explicitly for corpora with huge *near*-identical families.

    ``hash_impl`` is RECORDED IN THE INDEX METADATA: every later
    ``dedup_index_upsert`` sketches its batch with the same
    implementation automatically (mixing implementations would put new
    docs in different band buckets than the stored ones and silently
    miss near-dups).  ``"fast"`` is ~3x cheaper on the sketch — the
    dominant cost — and is the production choice; ``"md5"`` (default)
    keeps cross-engine oracle parity.

    ``id_buckets`` (also recorded in metadata) lays all three tables out
    hive-partitioned by ``id_bucket = pmod(doc_id, id_buckets)`` so that
    :func:`dedup_index_remove` rewrites ONLY the partitions containing
    removed ids — the takedown twin of ``ivf_index_remove``'s
    per-cluster pruning (VERDICT r7 #5: the unpruned form rewrote the
    full index per removal batch, a non-starter at 100-TB index sizes).
    ``None`` keeps the flat layout (removal falls back to the full
    three-table rewrite)."""
    from fastdb_spark.cachereg import release_staged

    sk = _staged_sketch(
        docs, id_col, text_col, shingle_k, n_hashes, bands, hash_impl
    )
    try:
        canon = sk.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
        kept = sk.join(canon, on=[id_col, "fingerprint"], how="left_semi")
        surv = kept.join(
            _inbatch_drops(kept, id_col, threshold, max_bucket_size),
            on=id_col,
            how="left_anti",
        )
        n = _append_survivors(
            surv, path, id_col, overwrite=True, id_buckets=id_buckets
        )[1]
    finally:
        release_staged()
    with open(_params_path(path), "w") as f:
        json.dump(
            {
                "shingle_k": shingle_k,
                "n_hashes": n_hashes,
                "bands": bands,
                "threshold": threshold,
                "hash_impl": hash_impl,
                "id_buckets": id_buckets,
                # scheme marker: the md5x rewrite changed band-key and
                # signature formats IN PLACE, so an index persisted by
                # pre-md5x code would band-join zero rows against new
                # sketches (silently disabling near-dup detection).
                # Upserts refuse indexes whose marker is not the one
                # their hash_impl produces today (rebuild_dedup_index
                # migrates in one call).
                "sketch_scheme": SKETCH_SCHEMES[hash_impl],
            },
            f,
        )
    return n


def _inbatch_drops(
    frame: DataFrame,
    id_col: str,
    threshold: float,
    max_bucket_size: int | None,
) -> DataFrame:
    """Ids dropped by the in-batch greedy-MIS near-dup pass: keep x iff
    no KEPT lower-id neighbor (``dedup.greedy_mis_drops``).  Round-9
    second-extension fix: the old one-shot rule (drop the higher id of
    every refined pair) over-dropped chain tails, and a torn-checkpoint
    REPLAY then admitted them (their only near neighbor was never
    indexed) — reproduced with a jaccard chain A~B~C, jac(A,C) below
    threshold: upsert admitted {A}, the replay phantom-admitted {C}.
    On clique-shaped duplicate families (every gate corpus) the two
    rules coincide.  ``frame`` carries (id, sh, bands) from
    :func:`_sketch`."""
    pairs = _candidate_pairs(
        frame.select(id_col, F.explode("bands").alias("band")),
        frame.select(id_col, "sh"),
        id_col,
        "band",
        max_bucket_size=max_bucket_size,
    )
    pairs = pairs.withColumn(
        "jac", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    ).filter(F.col("jac") >= threshold)
    from fastdb_spark.pipeline.dedup import greedy_mis_drops

    return greedy_mis_drops(pairs, id_col)


def _has_part_files(tdir: str) -> bool:
    return any(
        name.startswith("part-")
        for _r, _d, files in os.walk(tdir)
        for name in files
    )


def _seed_if_empty(spark: SparkSession, tdir: str, schema, bucket: int = 0) -> None:
    """Keep an id-bucketed table READABLE when a write leaves it with no
    part files at all: a ``partitionBy`` write of a zero-row frame emits
    nothing, and the next ``spark.read.parquet`` over the table raises
    UNABLE_TO_INFER_SCHEMA (ADVICE r8: an overwrite BUILD whose survivor
    set is empty — empty or fully-duplicate corpus — regressed exactly
    the edge the flat layout handles for free, since an empty
    non-partitioned write emits a schema-bearing file).  Re-seed one
    ``id_bucket`` partition with a zero-row schema-bearing slice — the
    same discipline :func:`_remove_ids` applies to emptied tables.
    ``schema`` carries the data columns only (the partition column comes
    from the directory name)."""
    if not _has_part_files(tdir):
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            os.path.join(tdir, f"id_bucket={bucket}")
        )


# Above this many survivors the upsert stops materializing ids on the
# driver: the batch is staged to a scratch parquet (cluster-side
# materialization — same read-after-write protection as persist) and the
# caller gets ``None`` instead of the id list.
DEFAULT_ID_CEILING = 1_000_000


def _append_survivors(
    surv: DataFrame,
    path: str,
    id_col: str,
    overwrite: bool,
    id_ceiling: int = DEFAULT_ID_CEILING,
    id_buckets: int | None = None,
) -> tuple[list | None, int]:
    """Write the survivors' index entries; returns ``(ids, count)``.

    The survivor plan reads the index tables this function is about to
    modify, so it must be materialized with its LINEAGE SEVERED before
    the append (read-after-write).  ``persist()`` is NOT enough: each
    parquet append calls ``refreshByPath`` on its output dir, which
    invalidates any cached plan reading that dir — so after the
    fingerprints append, the bands/shingles writes would silently
    RECOMPUTE the survivor plan against the already-updated index, the
    exact-dedup anti-join would drop every just-appended doc, and the
    bands/shingles tables would receive EMPTY batches: later near-dups
    of upserted documents were never caught (a real shipped bug, caught
    by the write-timing profile and regression-tested in
    test_round6.py).  ``localCheckpoint`` stores the materialized
    partitions and cuts the plan back to an RDD scan, so no write can
    trigger recomputation.  Small batches then collect their ids;
    batches above ``id_ceiling`` are staged to a scratch parquet
    instead — the append reads the scratch copy, no unbounded driver
    collect — and ``ids`` comes back ``None``."""
    mode = "overwrite" if overwrite else "append"
    # NOTE: localCheckpoint blocks are freed by the ContextCleaner when
    # the checkpointed RDD is garbage-collected on the driver — an
    # explicit unpersist() on the DataFrame is a no-op (ADVICE r6), so
    # none is attempted; per-batch blocks are bounded by the batch size
    # and die with the local `surv` reference.
    #
    # Bucket alignment happens HERE, before the one checkpoint all three
    # writes share: repartitioning on id_bucket routes each bucket to
    # exactly one task (one file per bucket per append — a raw
    # partitionBy write emits tasks x buckets tiny files, which made the
    # first-cut layout 2-3.5x slower than flat at 1M docs), and doing it
    # pre-checkpoint means the three table writes pay ZERO shuffles
    # (per-write repartition cost the sf0.1 index gates +4.6 s each).
    # The bands explode below preserves partitioning, so exploded rows
    # stay bucket-aligned.
    if id_buckets:
        surv = surv.withColumn(
            "id_bucket",
            F.pmod(F.col(id_col), F.lit(id_buckets)).cast("int"),
        ).repartition("id_bucket")
    surv = surv.localCheckpoint(eager=True)
    scratch = None
    try:
        # ONE bounded action decides small-vs-backfill AND collects the
        # small-batch ids (r12: the count()+collect() pair was two jobs
        # on the checkpointed frame; limit(ceiling+1) keeps the driver
        # transfer bounded either way)
        head = surv.select(id_col).limit(id_ceiling + 1).collect()
        if len(head) > id_ceiling:
            scratch = os.path.join(path, "_scratch_batch")
            surv.write.mode("overwrite").parquet(scratch)
            surv = surv.sparkSession.read.parquet(scratch)
            n = surv.count()  # parquet footer metadata only
            ids = None
        else:
            n = len(head)
            ids = sorted(r[id_col] for r in head)

        def _write(df: DataFrame, table: str) -> None:
            # hive-partition by id hash so dedup_index_remove prunes its
            # rewrites to the partitions holding removed ids; the frame
            # is already bucket-aligned (repartition above), so this is
            # shuffle-free.  maxRecordsPerFile re-splits pathological
            # buckets at backfill scale.
            tdir = os.path.join(path, table)
            if id_buckets:
                w = df.write.option("maxRecordsPerFile", 10_000_000)
                if overwrite:
                    # a REBUILD under partitionOverwriteMode=dynamic
                    # replaces only the partitions present in the new
                    # build — bucket partitions from a previous larger
                    # index at the same path would survive, resurrecting
                    # stale (possibly taken-down) entries (ADVICE r8);
                    # force static per-write so the whole table is
                    # replaced regardless of session conf
                    w = w.option("partitionOverwriteMode", "static")
                w.partitionBy("id_bucket").mode(mode).parquet(tdir)
                _seed_if_empty(
                    surv.sparkSession, tdir, df.drop("id_bucket").schema
                )
            else:
                df.write.mode(mode).parquet(tdir)

        bkt = ["id_bucket"] if id_buckets else []
        # the three table writes read the SAME checkpointed partitions
        # and land in disjoint directories — overlap them (guide §2.6)
        # instead of paying three serial write-job latencies (r12:
        # measured 1.2-1.5 s serial vs ~0.6 s overlapped per append)
        from fastdb_spark.parallel import run_independent_jobs

        run_independent_jobs(
            lambda spec: _write(*spec),
            [
                (surv.select("fingerprint", id_col, *bkt), "fingerprints"),
                (
                    surv.select(
                        F.explode("bands").alias("band"), F.col(id_col), *bkt
                    ),
                    "bands",
                ),
                (surv.select(id_col, "sh", *bkt), "shingles"),
            ],
            max_workers=3,
        )
    finally:
        if scratch is not None:
            import shutil

            shutil.rmtree(scratch, ignore_errors=True)
    return ids, n


def _load_params(path: str) -> dict:
    with open(_params_path(path)) as f:
        return json.load(f)


def _check_scheme(p: dict, path: str) -> None:
    """Refuse indexes whose stored sketch format is not what their
    recorded ``hash_impl`` produces today — banding a new batch against
    them would match zero buckets and silently disable near-dup
    detection."""
    expect = SKETCH_SCHEMES[p.get("hash_impl", "md5")]
    if p.get("sketch_scheme") != expect:
        raise ValueError(
            f"dedup index at {path!r} was persisted under sketch scheme "
            f"{p.get('sketch_scheme')!r} but the current "
            f"{p.get('hash_impl', 'md5')!r} implementation writes "
            f"{expect!r}; its stored band keys cannot match new sketches "
            "(near-dup detection would be silently disabled) — run "
            "rebuild_dedup_index(spark, path) to migrate it in place"
        )


def rebuild_dedup_index(
    spark: SparkSession,
    path: str,
    hash_impl: str | None = None,
    n_hashes: int | None = None,
    bands: int | None = None,
) -> int:
    """One-call scheme migration for a persisted index (VERDICT r6 #8):
    re-sketch the STORED survivors under the current scheme and rewrite
    the signature-derived tables, without the original corpus.

    The index already holds everything a re-sketch needs — the raw
    shingle sets (``shingles/``) and fingerprints — so only ``bands/``
    is recomputed; survivor membership is unchanged (dedup decisions
    were made at build/upsert time).  ``hash_impl``/``n_hashes``/
    ``bands`` default to the stored parameters; override them to switch
    an old md5 index to the fast production scheme in the same call.
    ``shingle_k`` CANNOT change (shingles are stored pre-cut).  Returns
    the number of indexed documents.  Serializes on the table write
    lock like every upsert."""
    with table_write_lock(os.path.normpath(path)):
        p = _load_params(path)
        hash_impl = hash_impl or p.get("hash_impl", "md5")
        n_hashes = n_hashes or p["n_hashes"]
        bands = bands or p["bands"]
        if hash_impl not in SKETCH_SCHEMES:
            raise ValueError(f"unknown hash_impl {hash_impl!r}")
        from fastdb_spark.functions.sketches import (
            lsh_band_hashes_fast,
            minhash_signature_fast,
        )

        mk_sig = (
            minhash_signature if hash_impl == "md5" else minhash_signature_fast
        )
        mk_bands = (
            lsh_band_hashes if hash_impl == "md5" else lsh_band_hashes_fast
        )
        sh = spark.read.parquet(os.path.join(path, "shingles"))
        id_col = next(
            c for c in sh.columns if c not in ("sh", "id_bucket")
        )
        banded = (
            sh.withColumn("sig", mk_sig(F.col("sh"), n_hashes))
            .withColumn("bands", mk_bands(F.col("sig"), bands, n_hashes // bands))
            .select(F.explode("bands").alias("band"), F.col(id_col))
        )
        # bands/ derives from shingles/ only, so the overwrite has no
        # read-after-write hazard — lineage is severed anyway so a
        # refreshByPath during the write can never trigger recomputation
        banded = banded.localCheckpoint(eager=True)
        nb = p.get("id_buckets")
        if nb:
            banded.withColumn(
                "id_bucket", F.pmod(F.col(id_col), F.lit(nb)).cast("int")
            ).repartition("id_bucket").write.option(
                "maxRecordsPerFile", 10_000_000
            ).option(
                # full-table rebuild: never leave stale partitions behind
                # under a dynamic session conf (ADVICE r8)
                "partitionOverwriteMode", "static"
            ).partitionBy("id_bucket").mode("overwrite").parquet(
                os.path.join(path, "bands")
            )
        else:
            banded.write.mode("overwrite").parquet(
                os.path.join(path, "bands")
            )
        n = sh.select(id_col).distinct().count()
        p.update(
            {
                "hash_impl": hash_impl,
                "n_hashes": n_hashes,
                "bands": bands,
                "sketch_scheme": SKETCH_SCHEMES[hash_impl],
            }
        )
        with open(_params_path(path), "w") as f:
            json.dump(p, f)
    return n


def stream_dedup_index(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    compact_min_files: int = 8,
):
    """Structured-Streaming corpus ingest into the persisted dedup index:
    ``readStream`` over a parquet file source, ``foreachBatch`` applying
    :func:`dedup_index_upsert` per micro-batch under the table write
    lock.  The checkpoint gives exactly-once over the transport, and the
    upsert itself absorbs re-delivery — a replayed document matches its
    own fingerprint already in the index and is dropped — so even
    at-least-once delivery (a torn checkpoint, a second pipeline fed the
    same files) leaves the index contents unchanged.  Returns the
    started ``StreamingQuery``.

    The index must already exist (``build_dedup_index`` on the seed
    corpus); sketch parameters come from the index metadata, never this
    caller, so every micro-batch is banded identically.

    ``compact_every=N`` runs :func:`compact_dedup_index` after every Nth
    processed micro-batch: each upsert appends one part file per touched
    bucket per table, so a long-running stream otherwise fragments the
    index without bound (the 1M-doc A/B in BENCH_SCALE prices the
    fragmentation tax at ~26% of probe latency after 40 batches).
    Compaction runs inside ``foreachBatch`` between triggers — the same
    single-writer discipline as the upserts, no separate maintenance
    job to schedule."""
    _check_scheme(_load_params(index_path), index_path)

    # micro-batches are batch-sized, not table-sized (same rationale as
    # streaming/ingest.py; 'auto'-safe shared helper, ADVICE r8)
    from fastdb_spark.session import tune_micro_batch_shuffle

    tune_micro_batch_shuffle(spark)

    n_batches = {"n": 0}

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_index_upsert(
            spark,
            batch_df,
            index_path,
            id_col=id_col,
            text_col=text_col,
            max_bucket_size=max_bucket_size,
        )
        n_batches["n"] += 1
        if compact_every and n_batches["n"] % compact_every == 0:
            compact_dedup_index(spark, index_path, min_files=compact_min_files)

    reader = spark.readStream.schema(f"{id_col} long, {text_col} string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(docs_path)
        .writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def dedup_index_remove(
    spark: SparkSession,
    ids,
    path: str,
    id_col: str = "doc_id",
) -> int:
    """Remove documents from a persisted dedup index — the takedown path
    (DMCA/GDPR/licensing removals are routine against a long-lived
    production corpus index).  ``ids`` is a Python sequence (an ``isin``
    literal up to 1024 ids; larger lists auto-switch to the DataFrame
    form — a 10^4-element isin literal measured 3-16x slower than the
    broadcast anti-join at a 10M-doc index, BENCH_SCALE r9) or a
    single-column DataFrame (broadcast anti-join; the backfill-scale
    form).  Returns the number of index documents actually removed.

    On an id-bucketed index (``id_buckets`` in _meta.json — the default
    layout since round 8) only the hive partitions that CONTAIN removed
    ids are rewritten: a k-id takedown touches at most
    ``min(k, id_buckets)`` partitions per table, never the whole index —
    the same pruning discipline as ``ivf_index_remove``'s per-cluster
    rewrites (VERDICT r7 #5).  Flat (pre-bucketed) indexes fall back to
    the full three-table rewrite.  Either way each rewrite is a tmp-dir
    + atomic-swap (the same tmp+swap discipline as storage.py: writing
    over a directory a live plan reads is the refreshByPath
    recomputation hazard the round-6 bug hunt established; the tmp write
    reads the OLD directory and the swap is a rename; tmp/old live
    OUTSIDE the partitioned tree so partition discovery never sees
    them).  Serializes on the table write lock.

    Semantics stated precisely (tested): removal is NOT retroactive —
    documents that were dropped in earlier batches because they
    duplicated a now-removed doc stay dropped (their content was a dup
    at ingest time; the index holds no record of them to resurrect).
    Future batches simply stop matching the removed doc's fingerprint /
    bands / shingles, so its re-ingest (or a near-dup of it) would be
    accepted again."""
    p = _load_params(path)
    return _remove_ids(
        spark,
        ids,
        path,
        (
            ("fingerprints", ["fingerprint", id_col]),
            ("bands", ["band", id_col]),
            ("shingles", [id_col, "sh"]),
        ),
        id_col,
        p.get("id_buckets"),
    )


def _remove_ids(
    spark: SparkSession,
    ids,
    path: str,
    tables: tuple,
    id_col: str,
    nb: int | None,
) -> int:
    """Shared takedown engine (used by the text dedup index and the
    perceptual media index): drop ``ids`` from every ``(table, cols)``
    in ``tables`` under ``path``, partition-pruned when the index is
    id-bucketed (``nb``), full tmp+swap rewrite otherwise.  Returns the
    number of rows removed from the FIRST table (the one-row-per-doc
    one).  Serializes on the table write lock."""
    import shutil

    with table_write_lock(os.path.normpath(path)):
        buckets: list[int] = []
        if not isinstance(ids, DataFrame):
            idlist = [int(i) for i in ids]
            if len(idlist) > 1024:
                # a 10^4-element isin literal is a codegen/eval bomb:
                # measured at a 10M-doc index (BENCH_SCALE r9), the
                # 10k-id list form cost 96.6 s (bucketed) / 37.5 s
                # (flat) vs ~6 s for the equivalent 1k batch — the
                # filter, not the rewrite.  Above this threshold a list
                # silently takes the documented backfill form
                # (single-column frame -> broadcast anti-join).
                from fastdb_spark.localrel import tiny_local_df

                ids = tiny_local_df(
                    spark, [(i,) for i in idlist], f"{id_col} long"
                )
            else:
                ids = idlist
        if isinstance(ids, DataFrame):
            # sever lineage BEFORE the rewrites: a caller naturally derives
            # the removal set from the index's own tables (filter on
            # fingerprints), and the broadcast below is re-evaluated once
            # per rewritten table — after the fingerprints swap the old
            # part-files are gone and a lazy plan over them throws
            # FILE_NOT_EXIST (the round-6 refreshByPath hazard, caught
            # here by test_no_cartesian_product[dedup_index_takedown])
            rm = ids.select(
                F.col(ids.columns[0]).alias(id_col)
            ).localCheckpoint(eager=True)
            if nb:
                # bounded collect: distinct pmod values, at most nb rows
                buckets = sorted(
                    r["b"]
                    for r in rm.select(
                        F.pmod(F.col(id_col), F.lit(nb))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                )

            def drop(df: DataFrame) -> DataFrame:
                return df.join(F.broadcast(rm), on=id_col, how="left_anti")

        else:
            idlist = list(ids)
            if nb:
                # Python % matches Spark pmod for positive moduli
                buckets = sorted({int(i) % nb for i in idlist})

            def drop(df: DataFrame) -> DataFrame:
                return df.filter(~F.col(id_col).isin(idlist))

        first_table = tables[0][0]
        if nb:
            # pruned path: rewrite ONLY the hive partitions holding
            # removed ids; every other partition dir is untouched
            # (mtime-asserted in tests).  ONE read+write job per table
            # over all affected partitions together (a per-bucket loop
            # would pay Spark job-launch overhead × buckets × 3 —
            # measured 3x slower on the takedown gate), then a cheap
            # per-bucket directory swap.
            def _rewrite_table(tc) -> int | None:
                table, cols = tc
                tdir = os.path.join(path, table)
                hit = [
                    b
                    for b in buckets
                    if os.path.isdir(os.path.join(tdir, f"id_bucket={b}"))
                ]
                if not hit:
                    return None
                src = spark.read.option("basePath", tdir).parquet(
                    *[os.path.join(tdir, f"id_bucket={b}") for b in hit]
                )
                # schema captured BEFORE the swaps: src's lineage reads
                # the original partition dirs, which the swap deletes
                tschema = src.select(*cols).schema
                n_before = src.count() if table == first_table else None
                tmp = os.path.join(path, f"_tmp_{table}")
                # repartition on the bucket column before the dynamic-
                # partition write: the multi-dir read bin-packs files
                # from different buckets into one task, and partitionBy
                # then SORTS every task by id_bucket — 30+ s on a 4M-doc
                # shingles table.  After the shuffle each task holds one
                # bucket, the sort is single-valued, and output files
                # stay bucket-aligned.
                drop(src.select(*cols, "id_bucket")).repartition(
                    "id_bucket"
                ).write.partitionBy("id_bucket").mode("overwrite").parquet(
                    tmp
                )
                removed = None
                if table == first_table:
                    # a removal that empties every affected bucket leaves
                    # tmp with NO part files (an empty partitionBy write),
                    # and reading it back raises UNABLE_TO_INFER_SCHEMA —
                    # check for data files before counting
                    n_tmp = (
                        spark.read.parquet(tmp).count()
                        if _has_part_files(tmp)
                        else 0
                    )
                    removed = n_before - n_tmp
                for b in hit:
                    pdir = os.path.join(tdir, f"id_bucket={b}")
                    old = os.path.join(path, f"_old_{table}_{b}")
                    new_part = os.path.join(tmp, f"id_bucket={b}")
                    os.rename(pdir, old)
                    # a bucket whose rows were ALL removed has no dir in
                    # tmp — the swap then simply deletes the partition
                    if os.path.isdir(new_part):
                        os.rename(new_part, pdir)
                    shutil.rmtree(old, ignore_errors=True)
                shutil.rmtree(tmp, ignore_errors=True)
                # a removal that emptied EVERY partition leaves the
                # table with no part files — unreadable
                # (UNABLE_TO_INFER_SCHEMA) for the next upsert's read;
                # keep the schema alive with a zero-row slice in one
                # partition dir
                _seed_if_empty(spark, tdir, tschema, hit[0])
                return removed

            # each table rewrites its own directory tree (separate tmp,
            # separate swaps) — independent jobs, overlapped from a
            # bounded driver pool (guide §2.6) instead of the r11
            # serial three-table loop
            from fastdb_spark.parallel import run_independent_jobs

            results = run_independent_jobs(_rewrite_table, list(tables))
            removed = next((r for r in results if r is not None), 0)
            spark.catalog.refreshByPath(path)
            return removed
        first = spark.read.parquet(os.path.join(path, first_table))
        n_before = first.count()

        def _rewrite_flat(tc) -> None:
            table, cols = tc
            tdir = os.path.join(path, table)
            tmp = tdir + "_tmp"
            drop(spark.read.parquet(tdir).select(*cols)).write.mode(
                "overwrite"
            ).parquet(tmp)
            old = tdir + "_old"
            os.rename(tdir, old)
            os.rename(tmp, tdir)
            shutil.rmtree(old, ignore_errors=True)

        # independent per-table rewrites, overlapped (guide §2.6)
        from fastdb_spark.parallel import run_independent_jobs

        run_independent_jobs(_rewrite_flat, list(tables))
        spark.catalog.refreshByPath(path)
        n_after = spark.read.parquet(os.path.join(path, first_table)).count()
    return n_before - n_after


def compact_dedup_index(
    spark: SparkSession,
    path: str,
    min_files: int = 8,
) -> dict:
    """Compact the small files a long-lived index accretes: every upsert
    appends one part file per touched id_bucket per table, so a daily
    ingest puts ~365 files/bucket/year in front of every probe's scan
    (footer opens + scheduler overhead dominate long before data size
    does — the classic small-files failure at 100 TB).  Rewrites ONLY
    the partitions holding more than ``min_files`` part files, one
    read+write job per table over the affected partitions together
    (the ``_remove_ids`` pruning/swap discipline: tmp+swap outside the
    partitioned tree, bucket-aligned repartition before the dynamic-
    partition write).  Content is untouched — pure file-count hygiene.
    Serializes on the table write lock.  Returns per-table
    ``{buckets_compacted, files_before, files_after}``."""
    p = _load_params(path)
    return _compact_tables(
        spark,
        path,
        (
            ("fingerprints", ["fingerprint", _id_col_of(p)]),
            ("bands", ["band", _id_col_of(p)]),
            ("shingles", [_id_col_of(p), "sh"]),
        ),
        p.get("id_buckets"),
        min_files,
    )


def _id_col_of(p: dict) -> str:
    return p.get("id_col", "doc_id")


def _compact_tables(
    spark: SparkSession,
    path: str,
    tables: tuple,
    nb: int | None,
    min_files: int,
    part_col: str = "id_bucket",
) -> dict:
    """Shared compaction engine (text dedup index, perceptual media
    index, IVF vector index).  Partitioned layout: rewrite only
    over-threshold ``part_col`` partitions; flat layout: rewrite the
    whole table when it exceeds the threshold.  ``cols=None`` in a
    tables entry means every data column (derived from the scan —
    the IVF vectors table's schema varies with the PQ options)."""
    import shutil

    out: dict = {}
    with table_write_lock(os.path.normpath(path)):

        def _compact_one(tc) -> tuple[str, dict | None]:
            table, cols = tc
            tdir = os.path.join(path, table)
            if not os.path.isdir(tdir):
                return table, None
            if nb:
                hit = []
                before = 0
                for d in os.listdir(tdir):
                    pdir = os.path.join(tdir, d)
                    if not (
                        d.startswith(f"{part_col}=") and os.path.isdir(pdir)
                    ):
                        continue
                    nfiles = sum(
                        1 for f in os.listdir(pdir) if f.startswith("part-")
                    )
                    if nfiles > min_files:
                        hit.append(d)
                        before += nfiles
                if not hit:
                    return table, {
                        "buckets_compacted": 0,
                        "files_before": 0,
                        "files_after": 0,
                    }
                src = spark.read.option("basePath", tdir).parquet(
                    *[os.path.join(tdir, d) for d in hit]
                )
                if cols is None:
                    cols = [c for c in src.columns if c != part_col]
                tmp = os.path.join(path, f"_tmp_compact_{table}")
                # partition-aligned repartition: one task per partition
                # value -> one output file each (the round-8 write-path
                # lesson), and the dynamic-partition sort is
                # single-valued per task
                src.select(*cols, part_col).repartition(
                    part_col
                ).write.option("maxRecordsPerFile", 10_000_000).partitionBy(
                    part_col
                ).mode("overwrite").parquet(tmp)
                after = 0
                for d in hit:
                    pdir = os.path.join(tdir, d)
                    old = os.path.join(path, f"_old_compact_{table}_{d}")
                    new_part = os.path.join(tmp, d)
                    os.rename(pdir, old)
                    os.rename(new_part, pdir)
                    shutil.rmtree(old, ignore_errors=True)
                    after += sum(
                        1 for f in os.listdir(pdir) if f.startswith("part-")
                    )
                shutil.rmtree(tmp, ignore_errors=True)
                return table, {
                    "buckets_compacted": len(hit),
                    "files_before": before,
                    "files_after": after,
                }
            else:
                nfiles = sum(
                    1
                    for _r, _d, files in os.walk(tdir)
                    for f in files
                    if f.startswith("part-")
                )
                if nfiles <= min_files:
                    return table, {
                        "buckets_compacted": 0,
                        "files_before": 0,
                        "files_after": 0,
                    }
                tmp = tdir + "_tmp_compact"
                src = spark.read.parquet(tdir)
                if cols is None:
                    cols = src.columns
                src.select(*cols).coalesce(1).write.option(
                    "maxRecordsPerFile", 10_000_000
                ).mode("overwrite").parquet(tmp)
                old = tdir + "_old_compact"
                os.rename(tdir, old)
                os.rename(tmp, tdir)
                shutil.rmtree(old, ignore_errors=True)
                return table, {
                    "buckets_compacted": 1,
                    "files_before": nfiles,
                    "files_after": sum(
                        1
                        for _r, _d, files in os.walk(tdir)
                        for f in files
                        if f.startswith("part-")
                    ),
                }

        # per-table compactions rewrite disjoint directory trees —
        # independent jobs, overlapped from a bounded driver pool
        # (guide §2.6) instead of the r11 serial three-table loop
        from fastdb_spark.parallel import run_independent_jobs

        for table, stats in run_independent_jobs(_compact_one, list(tables)):
            if stats is not None:
                out[table] = stats
        spark.catalog.refreshByPath(path)
    return out


#: audit of the most recent upsert's candidate-cap truncation: docs whose
#: vs-index candidate set was cut at ``max_bucket_size`` MIGHT have had
#: their one true near-dup dropped.  ``truncated_docs`` is a FLOOR capped
#: at 101 (one bounded limit-collect, not a full count — the exact tally
#: would add a second driver-blocking job inside the write lock);
#: ``sample`` holds at most 100 ids.  Reset at the top of every
#: :func:`dedup_index_upsert` call, so an uncapped run reports zeros
#: rather than a previous call's values (ADVICE r5).
LAST_UPSERT_AUDIT: dict = {"truncated_docs": 0, "sample": []}


def _near_dups_vs_index(
    spark: SparkSession,
    fresh: DataFrame,
    path: str,
    p: dict,
    id_col: str,
    max_bucket_size: int | None,
    audit: dict | None = None,
) -> DataFrame:
    """Ids of ``fresh`` docs whose Jaccard vs ANY indexed document meets
    the stored threshold — the vs-index near-dup leg shared by
    :func:`dedup_index_upsert` and :func:`dedup_index_probe`.  ``fresh``
    carries (id, sh, bands) from :func:`_sketch`.  ``max_bucket_size``
    caps candidates PER NEW doc (the refine only needs one hit; never
    the index side); truncated docs are recorded in ``audit`` when one
    is passed (one bounded limit-collect on a cachereg-staged frame —
    the caller's ``release_staged()`` frees it)."""
    from fastdb_spark.cachereg import stage

    old_bands = spark.read.parquet(os.path.join(path, "bands"))
    old_sh = spark.read.parquet(os.path.join(path, "shingles"))
    new_banded = fresh.select(id_col, F.explode("bands").alias("band"))
    cand = (
        new_banded.join(
            old_bands.select(F.col("band"), F.col(id_col).alias("_old_id")),
            on="band",
        )
        .select(id_col, "_old_id")
        .dropDuplicates([id_col, "_old_id"])
    )
    if max_bucket_size is not None:
        # guard mirrors _candidate_pairs: a pathological band (e.g. the
        # batch re-ingests a boilerplate bomb) would blow the join; cap
        # candidates per new doc instead of per bucket here — the
        # refine only needs ONE hit.  _cnt rides the same window
        # partition (no extra shuffle) so truncated docs can be flagged.
        w = Window.partitionBy(id_col).orderBy("_old_id")
        wc = Window.partitionBy(id_col)
        cand = stage(
            cand.withColumn("_rn", F.row_number().over(w))
            .withColumn("_cnt", F.count("*").over(wc))
            .filter(F.col("_rn") <= max_bucket_size)
        )
        if audit is not None:
            trunc = (
                cand.filter(F.col("_cnt") > max_bucket_size)
                .select(id_col)
                .distinct()
                .limit(101)
                .collect()
            )
            audit["truncated_docs"] = len(trunc)
            audit["sample"] = sorted(r[id_col] for r in trunc[:100])
        cand = cand.drop("_rn", "_cnt")
    scored = (
        cand.join(fresh.select(id_col, "sh"), on=id_col)
        .join(
            old_sh.select(
                F.col(id_col).alias("_old_id"),
                F.col("sh").alias("_old_sh"),
            ),
            on="_old_id",
        )
        .withColumn(
            "jac", F.round(jaccard(F.col("sh"), F.col("_old_sh")), 6)
        )
    )
    return (
        scored.filter(F.col("jac") >= p["threshold"])
        .select(id_col)
        .distinct()
    )


def dedup_index_probe(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Classify ``new_docs`` against the index WITHOUT mutating it — the
    dry-run dedup REPORT (what a curation review wants before committing
    a crawl increment, and what a dedup-rate dashboard samples).
    Returns ``(id_col, verdict)`` with verdict one of:

    - ``exact``          — fingerprint already in the index
    - ``in_batch_exact`` — fingerprint collides in the batch, not min id
    - ``near``           — Jaccard vs an indexed doc >= threshold
    - ``in_batch_near``  — dropped by the in-batch greedy pass
    - ``fresh``          — would be appended by an upsert

    Precedence is exactly the upsert's; the ``fresh`` set EQUALS the id
    set :func:`dedup_index_upsert` would return for the same batch
    (property-tested).  The result is materialized (lineage severed)
    under the table write lock, so a concurrent takedown's partition
    swap cannot invalidate the returned frame; the index is untouched
    (mtime-asserted in tests)."""
    p = _load_params(path)
    _check_scheme(p, path)
    from fastdb_spark.cachereg import release_staged

    with table_write_lock(os.path.normpath(path)):
        sk = _staged_sketch(
            new_docs, id_col, text_col,
            p["shingle_k"], p["n_hashes"], p["bands"],
            p.get("hash_impl", "md5"),
        )
        try:
            fps = spark.read.parquet(os.path.join(path, "fingerprints"))
            exact = sk.join(
                fps.select("fingerprint"), on="fingerprint", how="left_semi"
            ).select(id_col)
            rest = sk.join(exact, on=id_col, how="left_anti")
            canon = rest.groupBy("fingerprint").agg(
                F.min(id_col).alias(id_col)
            )
            keepmin = rest.join(
                canon, on=[id_col, "fingerprint"], how="left_semi"
            )
            in_batch_exact = rest.join(
                keepmin.select(id_col), on=id_col, how="left_anti"
            ).select(id_col)
            # lazy checkpoint: the vs-index band-join/refine chain is
            # otherwise evaluated TWICE — once inside the greedy-MIS
            # fixpoint actions (via rest2 -> pairs -> edges) and again
            # when the verdict union materializes (exchange reuse does
            # not cross actions).  Computed on first use, reused after;
            # the tiny id frame is all that is stored (r13).
            near = _near_dups_vs_index(
                spark, keepmin, path, p, id_col, max_bucket_size
            ).localCheckpoint(eager=False)
            rest2 = keepmin.join(near, on=id_col, how="left_anti")
            in_batch_near = _inbatch_drops(
                rest2, id_col, p["threshold"], max_bucket_size
            )
            fresh = rest2.join(
                in_batch_near, on=id_col, how="left_anti"
            ).select(id_col)
            out = (
                exact.select(id_col, F.lit("exact").alias("verdict"))
                .unionByName(
                    in_batch_exact.select(
                        id_col, F.lit("in_batch_exact").alias("verdict")
                    )
                )
                .unionByName(
                    near.select(id_col, F.lit("near").alias("verdict"))
                )
                .unionByName(
                    in_batch_near.select(
                        id_col, F.lit("in_batch_near").alias("verdict")
                    )
                )
                .unionByName(
                    fresh.select(id_col, F.lit("fresh").alias("verdict"))
                )
            ).localCheckpoint(eager=True)
        finally:
            release_staged()
    return out


def dedup_index_upsert(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    id_ceiling: int = DEFAULT_ID_CEILING,
) -> list | None:
    """Dedup ``new_docs`` against the index AND append the survivors.

    Returns the sorted surviving ids (materialized inside the write
    lock — the check-then-append must be atomic vs other writers), or
    ``None`` when the batch survives with more than ``id_ceiling``
    documents (a backfill-scale batch is staged to a scratch parquet
    instead of the driver; read the index to enumerate).  Sketch
    parameters come from the index metadata, never the caller, so every
    increment is banded identically.  Documents whose candidate set hit
    the ``max_bucket_size`` cap are flagged in ``LAST_UPSERT_AUDIT``
    (floor capped at 101 — see the audit docstring)."""
    p = _load_params(path)
    _check_scheme(p, path)
    from fastdb_spark.cachereg import release_staged

    # reset BEFORE the cap branch: an uncapped (max_bucket_size=None) run
    # must not leave a previous call's truncation counts standing
    LAST_UPSERT_AUDIT["truncated_docs"] = 0
    LAST_UPSERT_AUDIT["sample"] = []
    with table_write_lock(os.path.normpath(path)):
        # pre-hash_impl indexes carry no key: they were md5
        sk = _staged_sketch(
            new_docs, id_col, text_col,
            p["shingle_k"], p["n_hashes"], p["bands"],
            p.get("hash_impl", "md5"),
        )
        try:
            # (a) exact vs index + in-batch keep-min-id
            fps = spark.read.parquet(os.path.join(path, "fingerprints"))
            fresh = sk.join(
                fps.select("fingerprint"), on="fingerprint", how="left_anti"
            )
            canon = fresh.groupBy("fingerprint").agg(
                F.min(id_col).alias(id_col)
            )
            fresh = fresh.join(
                canon, on=[id_col, "fingerprint"], how="left_semi"
            )
            # (b) near-dup vs index: band-bucket join against the stored
            # buckets, shingle refine against the stored shingle sets
            # lazy checkpoint: evaluated in the in-batch MIS fixpoint
            # (c) AND in the append's survivor materialization — compute
            # the band-join/refine chain once (r13, see probe)
            dup_vs_index = _near_dups_vs_index(
                spark, fresh, path, p, id_col, max_bucket_size,
                audit=LAST_UPSERT_AUDIT,
            ).localCheckpoint(eager=False)
            fresh = fresh.join(dup_vs_index, on=id_col, how="left_anti")
            # (c) in-batch greedy-MIS near-dup (replay-idempotent rule)
            surv = fresh.join(
                _inbatch_drops(fresh, id_col, p["threshold"], max_bucket_size),
                on=id_col,
                how="left_anti",
            )
            ids, _n = _append_survivors(
                surv, path, id_col, overwrite=False, id_ceiling=id_ceiling,
                id_buckets=p.get("id_buckets"),
            )
        finally:
            release_staged()
    return ids


def stream_dedup_upserts(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    fmt: str = "json",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list:
    """Structured-Streaming front end for the dedup index: consume
    document files from ``source_dir`` as a stream and run every
    micro-batch through :func:`dedup_index_upsert`.

    ``availableNow`` trigger (drain what exists, then stop) — the batch
    replay of a continuous ingest.  At-least-once delivery is safe: a
    replayed batch is entirely deduped against the index it already
    updated (the exact anti-join makes the upsert idempotent), which is
    the same at-least-once + idempotent-merge contract the alert ingest
    uses (``streaming/ingest.py``).  Returns the surviving ids across
    all batches, in arrival order of the batches.
    """
    survivors: list = []

    def handle(batch, _bid):
        if batch.isEmpty():
            return
        ids = dedup_index_upsert(
            spark, batch, index_path, id_col=id_col, text_col=text_col
        )
        survivors.extend(ids or [])

    reader = spark.readStream.schema(schema)
    stream = getattr(reader, fmt)(source_dir)
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return survivors
