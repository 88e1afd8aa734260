"""Perceptual image deduplication: pHash / dHash over binary payloads.

Exact byte hashing misses the image near-dups a multimodal training
corpus is full of — brightness/contrast tweaks, re-encodes, format
conversions of the same picture.  Perceptual hashes collapse those to
identical (or near-identical) 64-bit fingerprints:

- **pHash**: decode -> grayscale -> 32x32 -> 2-D DCT -> the low-frequency
  8x8 block (DC excluded) thresholded at its median -> 64 bits.  A
  uniform brightness shift changes ONLY the DC coefficient (the DCT is
  linear and the shift is a multiple of the constant basis), so the 64
  AC sign bits — and therefore the hash — are EXACTLY invariant, which
  is what the exact-correctness gate adjudicates.
- **dHash**: grayscale -> 9x8 -> horizontal gradient signs -> 64 bits.
  Cheaper, catches the same re-encode class, used as the second opinion.

Hashing runs Arrow-batched ``mapInPandas`` (the codec is per-item Python
by nature); everything after — exact-hash grouping, pair expansion,
hamming-threshold refinement — is JVM-side DataFrame algebra.  At scale
the pair step is a self-equi-join on the 64-bit hash (or its bands for
hamming > 0), never an all-pairs product.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.sources import imagecodec as ic

_DCT32 = None


def _dct32() -> np.ndarray:
    """32-point type-II DCT basis (same normalization as jpegcodec's
    8-point matrix, generalized), built once per process."""
    global _DCT32
    if _DCT32 is None:
        n = 32
        _DCT32 = np.array(
            [
                [
                    (np.sqrt(1.0 / n) if u == 0 else np.sqrt(2.0 / n))
                    * np.cos((2 * x + 1) * u * np.pi / (2 * n))
                    for x in range(n)
                ]
                for u in range(n)
            ]
        )
    return _DCT32


def _to_gray(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:
        return arr.astype(np.float64)
    return arr.astype(np.float64).mean(axis=2)


def _phash_array(gray: np.ndarray, hash_size: int = 8) -> int:
    """Grayscale float plane -> pHash int (63 sign bits; DC dropped, so
    the value is int64-stable with no sign games)."""
    small = ic.resize_nearest(gray, 32, 32)
    c = _dct32()
    coefs = c @ small @ c.T
    block = coefs[:hash_size, :hash_size].flatten()[1:]  # DC excluded
    med = np.median(block)
    h = 0
    for b in block > med:
        h = (h << 1) | int(b)
    return h


def phash_bytes(payload: bytes, hash_size: int = 8) -> int:
    """payload -> 64-bit perceptual hash (as a signed int64-safe int)."""
    return _phash_array(_to_gray(ic.decode_any(payload)), hash_size)


def dhash_bytes(payload: bytes, hash_size: int = 8) -> int:
    """payload -> 64-bit difference hash (horizontal gradient signs),
    folded to signed int64 (any image whose FIRST gradient bit is 1
    yields an unsigned value >= 2**63, which Arrow rejects against the
    mapInPandas ``long`` schema — same ``signed`` discipline as the
    audio/video fingerprint folds)."""
    gray = _to_gray(ic.decode_any(payload))
    small = ic.resize_nearest(gray, hash_size + 1, hash_size)
    bits = small[:, 1:] > small[:, :-1]
    h = 0
    for b in bits.flatten():
        h = (h << 1) | int(b)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    method: str = "phash",
) -> DataFrame:
    """(id, payload) -> (id, phash bigint) via Arrow mapInPandas.

    Undecodable payloads are SKIPPED (emitted to neither side) — the
    caller's reject cascade sees them via the count difference; a dedup
    pass must not die on one torn image in a billion."""
    fn = {"phash": phash_bytes, "dhash": dhash_bytes}.get(method)
    if fn is None:
        raise ValueError(f"unknown perceptual hash method {method!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = fn(bytes(payload))
                except ValueError:
                    continue
                ids.append(int(mid))
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        op, schema=f"{id_col} long, phash long"
    )


def video_fingerprint_bytes(
    payload: bytes, every_ms: int = 1000, hash_size: int = 8
) -> int:
    """AVI payload -> folded 64-bit perceptual clip fingerprint: the
    pHash of each SAMPLED frame (``every_ms`` cadence, unsampled frames
    seeked past — ``avicodec.iter_avi_frames``), md5-folded in order.
    Per-frame pHash brightness invariance lifts to the clip: a uniformly
    re-graded copy fingerprints identically."""
    import hashlib

    from fastdb_spark.sources import avicodec as av

    info = av.avi_info(payload)
    n, fps = info["n_frames"], info["fps"]
    duration_ms = int(n * 1000 / fps)
    comp = b"MJPG" if info["codec"] == "mjpg" else b"\x00\x00\x00\x00"
    want: list[int] = []
    seen: set[int] = set()
    for ts in range(0, max(duration_ms, 1), every_ms):
        idx = min(int(ts * fps / 1000), n - 1)
        if idx not in seen:
            seen.add(idx)
            want.append(idx)
    want_set = set(want)
    hashes: dict[int, int] = {}
    for i, chunk in enumerate(av.iter_avi_frames(payload)):
        if i in want_set:
            frame = av._decode_frame_chunk(
                chunk, comp, info["width"], info["height"]
            )
            hashes[i] = _phash_array(_to_gray(frame), hash_size)
    folded = hashlib.md5(
        b"".join(hashes[i].to_bytes(8, "big") for i in want)
    ).digest()
    return int.from_bytes(folded[:8], "big", signed=True)


def video_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
) -> DataFrame:
    """(id, payload) -> (id, vfp bigint): the folded sampled-frame clip
    fingerprint via Arrow mapInPandas.  Undecodable payloads are skipped
    (same contract as ``perceptual_hashes``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = video_fingerprint_bytes(bytes(payload), every_ms)
                except ValueError:
                    continue
                ids.append(int(mid))
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "vfp": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        op, schema=f"{id_col} long, vfp long"
    )


def video_dup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual video duplicate pairs ``(id_a < id_b)`` — sampled-frame
    pHash fingerprints folded per clip, then ONE self-equi-join.
    Undecodable payloads are skipped (same contract as
    ``perceptual_hashes``).  ``max_bucket_size`` caps the fingerprint
    bucket size (black-clip corpora collapse to one fingerprint — see
    ``image_dup_pairs``); ``None`` = exact pair semantics.  The
    fingerprint frame is staged before the self-join (see
    ``image_dup_pairs``); ``cachereg.release_staged()`` frees it."""

    from fastdb_spark.cachereg import stage
    from fastdb_spark.pipeline.dedup import cap_bucket_sizes

    hashes = stage(
        video_fingerprints(media, id_col, payload_col, every_ms)
    )
    capped = cap_bucket_sizes(hashes, ["vfp"], max_bucket_size)
    a = capped.select(F.col(id_col).alias("id_a"), F.col("vfp").alias("h_a"))
    b = capped.select(F.col(id_col).alias("id_b"), F.col("vfp").alias("h_b"))
    return (
        a.join(b, F.col("h_a") == F.col("h_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def _banded(
    hashes: DataFrame, id_col: str, hash_col: str, bands: int
) -> DataFrame:
    """(id, hash) -> (id, hash, band, key): one row per band substring.
    Band keys are pure functions of the 64-bit hash (shift + mask), so
    banded probes never need a stored band table."""
    width = 64 // bands
    return hashes.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, hash_col, "bk.band", "bk.key")


def hash_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 0,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs ``(id_a < id_b)`` over a fingerprint frame —
    the join stage of ``image_dup_pairs``, reusable by anything that
    already holds 64-bit hashes (the persisted media index, the video
    and audio paths).

    ``max_hamming = 0`` is ONE self-equi-join on the hash; ``> 0`` is
    the banded scheme (complete for ``max_hamming < bands`` by
    pigeonhole) with an exact popcount refine.  ``max_bucket_size`` is
    the degenerate-fingerprint quadratic guard
    (``dedup.cap_bucket_sizes``); ``None`` = exact semantics."""
    from fastdb_spark.pipeline.dedup import cap_bucket_sizes

    if max_hamming == 0:
        capped = cap_bucket_sizes(hashes, [hash_col], max_bucket_size)
        a = capped.select(
            F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a")
        )
        b = capped.select(
            F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b")
        )
        pairs = a.join(b, F.col("h_a") == F.col("h_b")).filter(
            F.col("id_a") < F.col("id_b")
        )
        return pairs.select("id_a", "id_b")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming {max_hamming} needs more than {bands} bands for "
            "a complete banded search (pigeonhole: one band must be clean)"
        )
    banded = _banded(hashes, id_col, hash_col, bands)
    banded = cap_bucket_sizes(banded, ["band", "key"], max_bucket_size)
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col(f"x.{hash_col}").alias("ph_a"),
            F.col(f"y.{hash_col}").alias("ph_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.filter(
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))) <= max_hamming
    ).select("id_a", "id_b")


def hash_matches(
    new: DataFrame,
    old: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 0,
    bands: int = 8,
    max_bucket_size: int | None = None,
    audit: dict | None = None,
) -> DataFrame:
    """Cross-frame probe: ``(new_id, old_id)`` for every new fingerprint
    within ``max_hamming`` of an old one — the vs-index leg of the
    persisted media dedup index.  Same banded/refine machinery as
    :func:`hash_pairs`, but a two-frame equi-join (never all-pairs).

    Hot-key guards (ADVICE r8: the first cut capped the OLD side's
    buckets with ``cap_bucket_sizes``, which DROPS oversized buckets —
    so a new exact duplicate of a hot indexed fingerprint family was
    silently ADMITTED, disabling dedup exactly where dups are densest):

    - ``max_hamming == 0``: the old side is ``dropDuplicates(hash_col)``
      — LOSSLESS for detection (one representative per stored
      fingerprint decides admission; ``old_id`` is the min-id
      representative for determinism) and the hot-key hazard is gone
      structurally, so ``max_bucket_size`` is ignored on this leg.
    - banded (``max_hamming > 0``): candidates are capped PER NEW id
      (``row_number`` by ``old_id`` — the refine only needs ONE hit to
      reject a new item), mirroring ``dedup_index_upsert``; pass an
      ``audit`` dict (``{"truncated_items": 0, "sample": []}``) to have
      truncated new ids recorded EAGERLY (one bounded limit-collect on a
      cachereg-staged frame — the caller's ``release_staged()`` frees
      it), so capped probes are never silent."""
    if max_hamming == 0:
        o = (
            old.groupBy(hash_col)
            .agg(F.min(id_col).alias("old_id"))
            .select("old_id", F.col(hash_col).alias("h_o"))
        )
        n = new.select(
            F.col(id_col).alias("new_id"), F.col(hash_col).alias("h_n")
        )
        return (
            n.join(o, F.col("h_n") == F.col("h_o"))
            .select("new_id", "old_id")
            .dropDuplicates(["new_id", "old_id"])
        )
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming {max_hamming} needs more than {bands} bands for "
            "a complete banded search (pigeonhole: one band must be clean)"
        )
    nb = _banded(new, id_col, hash_col, bands).select(
        F.col(id_col).alias("new_id"),
        F.col(hash_col).alias("h_n"),
        "band",
        "key",
    )
    ob = _banded(old, id_col, hash_col, bands).select(
        F.col(id_col).alias("old_id"),
        F.col(hash_col).alias("h_o"),
        "band",
        "key",
    )
    cand = (
        nb.join(ob, on=["band", "key"])
        .select("new_id", "old_id", "h_n", "h_o")
        .dropDuplicates(["new_id", "old_id"])
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("new_id").orderBy("old_id")
        capped = cand.withColumn("_rn", F.row_number().over(w))
        if audit is not None:
            from fastdb_spark.cachereg import stage

            wc = Window.partitionBy("new_id")
            capped = stage(
                capped.withColumn("_cnt", F.count(F.lit(1)).over(wc)).filter(
                    F.col("_rn") <= max_bucket_size
                )
            )
            trunc = (
                capped.filter(F.col("_cnt") > max_bucket_size)
                .select("new_id")
                .distinct()
                .limit(101)
                .collect()
            )
            audit["truncated_items"] = len(trunc)
            audit["sample"] = sorted(r["new_id"] for r in trunc[:100])
        else:
            capped = capped.filter(F.col("_rn") <= max_bucket_size)
        cand = capped.select("new_id", "old_id", "h_n", "h_o")
    return cand.filter(
        F.bit_count(F.col("h_n").bitwiseXOR(F.col("h_o"))) <= max_hamming
    ).select("new_id", "old_id")


def image_dup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    method: str = "phash",
    max_hamming: int = 0,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate pairs ``(id_a < id_b)``.

    ``max_hamming = 0`` (the exact-fingerprint regime the gate
    adjudicates) is ONE self-equi-join on the hash — never all-pairs.
    ``max_hamming > 0`` reuses the banded scheme the simhash text path
    established: split the 64 bits into ``bands`` substrings, candidates
    collide on at least one band (guaranteed complete for
    ``max_hamming < bands``), then an exact popcount refine keeps pairs
    within the threshold.

    ``max_bucket_size`` is the quadratic-blowup guard the text path
    established (``dedup.cap_bucket_sizes``): a real corpus has millions
    of solid-color thumbnails that collapse to ONE fingerprint, and an
    m-member bucket emits m²/2 pairs.  Defaults to ``None`` (exact pair
    semantics — the gate regime); pass ``dedup.DEFAULT_MAX_BUCKET`` for
    corpus runs and audit drops with
    ``dedup.oversized_buckets(perceptual_hashes(media), id_col, "phash")``.

    The hash frame is STAGED (cachereg persist) before the self-join:
    both join sides reference it, and without the stage each side would
    re-run the decode+DCT mapInPandas — a 2x decode bill at corpus
    scale.  Call ``cachereg.release_staged()`` after consuming."""
    from fastdb_spark.cachereg import stage

    hashes = stage(perceptual_hashes(media, id_col, payload_col, method))
    return hash_pairs(
        hashes, id_col, "phash", max_hamming, bands, max_bucket_size
    )
