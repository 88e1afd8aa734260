"""Perceptual audio deduplication: spectral fingerprints over WAV payloads.

The audio twin of ``pipeline.imagededup``: exact byte hashing misses
the re-encodes and gain changes a multimodal corpus is full of.  The
fingerprint is the classic Haitsma-Kalker construction (the published
"robust audio hash"): frame the mono signal, per-frame FFT magnitude
energies in ``bands`` linear bands, then one bit per (band, frame) cell
from the sign of the band-difference's time-difference:

    bit(b, t) = [ (E(b,t) - E(b+1,t)) - (E(b,t-1) - E(b+1,t-1)) ] > 0

Gain invariance is EXACT for power-of-two amplitude scaling (IEEE
multiplication by 2^k is exact and rounding is scale-invariant, so
every energy scales by exactly 2^2k and every sign survives) and
near-exact otherwise — the property the exact-correctness gate plants.

The per-item decode/FFT runs Arrow mapInPandas; the pair step is a
JVM-side self-equi-join on the folded 64-bit fingerprint — never
all-pairs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.sources.imagecodec import decode_wav


def audio_fingerprint_bits(
    payload: bytes,
    frame: int = 256,
    hop: int = 128,
    bands: int = 16,
) -> np.ndarray:
    """WAV payload -> bit matrix (n_frames-1, bands-1) of H-K sign bits."""
    samples, _rate = decode_wav(payload)
    mono = samples.astype(np.float64).mean(axis=1)
    if len(mono) < 2 * frame:
        raise ValueError(
            f"audio too short to fingerprint ({len(mono)} samples, "
            f"need >= {2 * frame})"
        )
    n_frames = 1 + (len(mono) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx]
    mags = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, frame//2+1)
    # linear band energies over the positive spectrum (DC bin excluded —
    # it carries the offset, not content)
    spec = mags[:, 1:]
    width = spec.shape[1] // bands
    e = spec[:, : width * bands].reshape(n_frames, bands, width).sum(axis=2)
    d = e[:, :-1] - e[:, 1:]  # band differences
    return (d[1:] - d[:-1]) > 0  # time difference of band differences


def afp_bytes(payload: bytes, **kw) -> int:
    """WAV payload -> folded 64-bit fingerprint (md5 of the packed H-K
    bit matrix; equality == same perceptual content under the exact
    invariances)."""
    bits = audio_fingerprint_bits(payload, **kw)
    digest = hashlib.md5(np.packbits(bits).tobytes()).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def audio_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    **kw,
) -> DataFrame:
    """(id, payload) -> (id, afp bigint) via Arrow mapInPandas.
    Undecodable or too-short payloads are skipped (same contract as
    ``imagededup.perceptual_hashes``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = afp_bytes(bytes(payload), **kw)
                except (ValueError, struct_error):
                    continue
                ids.append(int(mid))
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "afp": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        op, schema=f"{id_col} long, afp long"
    )


def audio_dup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket_size: int | None = None,
    **kw,
) -> DataFrame:
    """Exact-fingerprint duplicate pairs ``(id_a < id_b)`` — one
    self-equi-join on the folded hash.  ``max_bucket_size`` caps the
    fingerprint bucket size (silence-padded corpora collapse to one
    fingerprint and an m-member bucket emits m²/2 pairs — the same
    quadratic hazard the text path guards with
    ``dedup.cap_bucket_sizes``); ``None`` = exact pair semantics.  The
    hash frame is staged before the self-join (both sides reference it;
    unstaged, each would re-run the decode+FFT mapInPandas);
    ``cachereg.release_staged()`` frees it."""
    from fastdb_spark.cachereg import stage
    from fastdb_spark.pipeline.dedup import cap_bucket_sizes

    hashes = stage(audio_hashes(media, id_col, payload_col, **kw))
    capped = cap_bucket_sizes(hashes, ["afp"], max_bucket_size)
    a = capped.select(F.col(id_col).alias("id_a"), F.col("afp").alias("h_a"))
    b = capped.select(F.col(id_col).alias("id_b"), F.col("afp").alias("h_b"))
    return (
        a.join(b, F.col("h_a") == F.col("h_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
