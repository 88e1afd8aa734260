"""Multimodal (image / audio / video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
all per-item compute (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched ``mapInPandas`` over partition iterators.  The codec
step is REAL for PNG, FITS, and baseline JPEG images (spec-derived,
dependency-free — ``sources.imagecodec`` / ``sources.jpegcodec``; pass
``decoder=imagecodec.real_decode_features`` /
``resizer=imagecodec.real_resize``), for PCM WAV audio, and for
MJPEG/raw-DIB AVI video frames (``sources.avicodec`` +
``sample_frames_decoded``); other formats (GIF/TIFF/WebP images, H.26x
video) remain PIL/codec-gated with a deterministic fake for plumbing
tests.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media item schema: payload + typed metadata (no schema-on-read guessing)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, sha int, "
    "feat array<double>"
)


def decode_image(payload: bytes) -> "object":
    """Real decode path.

    PNG, FITS image HDUs, and baseline JPEG decode WITHOUT any imaging
    library via the spec-derived codecs in ``sources.imagecodec`` /
    ``sources.jpegcodec``; other formats (GIF, TIFF, WebP, ...) fall
    back to PIL when present, else raise with the format named.
    """
    from fastdb_spark.sources import imagecodec as ic

    if ic.sniff(payload) != "unknown":
        return ic.decode_any(payload)
    try:
        import io

        from PIL import Image  # noqa: F401  (gated import)

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - no PIL in test image
        raise NotImplementedError(
            "payload is none of PNG / FITS / baseline JPEG (decoded "
            "natively); other formats need an imaging library (e.g. "
            "Pillow), which this container ships without"
        ) from e


def fake_decode_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: md5-derived
    pseudo-features.  Keeps the batch plumbing real and testable."""
    h = hashlib.md5(payload).digest()
    return [(h[i % 16] / 255.0) for i in range(n_features)]


def extract_features(
    media: DataFrame,
    n_features: int = 8,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` — each task pulls Arrow record batches, runs the codec
    per item, yields a feature frame.  This is the exact shape a real
    image/audio featurizer plugs into (swap ``decoder``)."""
    dec = decoder or (lambda b: fake_decode_features(b, n_features))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha": pdf["payload"].map(lambda b: b[0] if len(b) else 0),
                    "feat": pdf["payload"].map(dec),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, payload binary, width int, height int"


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode+resize+re-encode: md5 of the
    source payload + the target dims.  Content is fake; the binary-out
    batch plumbing is real."""
    return (
        hashlib.md5(payload).digest()
        + int(width).to_bytes(2, "big")
        + int(height).to_bytes(2, "big")
    )


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads (``mapInPandas``).

    The modality filter stays Spark-side (pushes to the scan / prunes
    partitions when modality is a partition column); only image rows cross
    the Arrow boundary.  Swap ``resizer`` for a real codec (e.g.
    PIL-based) on a full cluster image."""
    rs = resizer or fake_resize

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [rs(bytes(b), width, height) for b in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(op, schema=RESIZE_SCHEMA)
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (metadata-driven; no payload decode).  Pure column ops:
    sequence + explode — demonstrates the fan-out shape."""
    frames = media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


PROBE_SCHEMA = (
    "media_id long, kind string, actual_width int, actual_height int, "
    "channels int, n_frames int, metadata_ok boolean"
)


def probe_media(media: DataFrame) -> DataFrame:
    """Metadata validation: HEADER-ONLY probes of every payload (PNG
    IHDR, JPEG SOF, FITS cards, WAV fmt, AVI avih — no pixel/sample
    decode anywhere), compared against the row's DECLARED width/height.
    Declared metadata lies constantly in a real corpus; this is the op
    that finds them without paying for a decode.  ``kind='unknown'``
    and NULL dims for unrecognized/torn payloads (reject cascade
    material); ``metadata_ok`` is NULL when nothing was declared."""
    from fastdb_spark.sources import avicodec as av
    from fastdb_spark.sources import imagecodec as ic
    from fastdb_spark.sources.jpegcodec import jpeg_info

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            n = len(pdf)
            dws = pdf["width"] if "width" in pdf.columns else [None] * n
            dhs = pdf["height"] if "height" in pdf.columns else [None] * n
            for media_id, payload, dw, dh in zip(
                pdf["media_id"], pdf["payload"], dws, dhs
            ):
                payload = bytes(payload)
                kind = ic.sniff(payload)
                if kind == "unknown" and av.sniff_avi(payload):
                    kind = "avi"
                elif kind == "unknown" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    kind = "wav"
                w = h = ch = nf = None
                try:
                    if kind == "png":
                        i = ic.png_info(payload)
                        w, h, ch, nf = i["width"], i["height"], i["channels"], 1
                    elif kind == "jpeg":
                        i = jpeg_info(payload)
                        w, h, ch, nf = i["width"], i["height"], i["channels"], 1
                    elif kind == "fits":
                        i = ic.fits_info(payload)
                        w, h, ch, nf = i["width"], i["height"], 1, 1
                    elif kind == "wav":
                        i = ic.wav_info(payload)
                        ch, nf = i["channels"], i["n_frames"]
                    elif kind == "avi":
                        i = av.avi_info(payload)
                        w, h, nf = i["width"], i["height"], i["n_frames"]
                except (ValueError, IndexError, KeyError, struct.error):
                    # parser internals on torn headers count as malformed —
                    # a PROBE must never kill the job
                    kind = "malformed_" + kind
                ok = None
                if w is not None and (pd.notna(dw) or pd.notna(dh)):
                    ok = (pd.isna(dw) or int(dw) == w) and (
                        pd.isna(dh) or int(dh) == h
                    )
                rows.append((int(media_id), kind, w, h, ch, nf, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "actual_width", "actual_height",
                    "channels", "n_frames", "metadata_ok",
                ],
            )

    cols = ["media_id", "payload"] + [
        c for c in ("width", "height") if c in media.columns
    ]
    return media.select(*cols).mapInPandas(op, schema=PROBE_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "media_id long, frame_ts_ms int, frame_index int, height int, "
    "width int, channels int, pix_mean double, pix_std double"
)


def sample_frames_decoded(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """REAL frame sampling over video payloads: one output row per
    sampled timestamp with the decoded frame's statistics.

    Payloads are AVI containers (MJPEG or raw-DIB frames —
    ``sources.avicodec``); the container header gives fps/frame count,
    sampled timestamps map to frame indices, and ONLY those frames are
    decoded (``decode_avi_frame`` seeks past unsampled chunks) — the
    shape that matters when a corpus row holds minutes of video but the
    pipeline wants one frame a second.  Runs Arrow-batched
    ``mapInPandas``; the modality filter stays Spark-side so only video
    rows cross the Arrow boundary."""
    from fastdb_spark.sources import avicodec as av

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                # torn-payload contract (same as probe_media and the
                # perceptual-hash paths): one malformed container in a
                # billion-row corpus SKIPS that row — it must never kill
                # the sampling job.  Rows already emitted for a clip that
                # tears mid-stream are dropped with it (all-or-nothing
                # per clip keeps the output deterministic).
                clip_rows: list[tuple] = []
                try:
                    info = av.avi_info(payload)
                    n, fps = info["n_frames"], info["fps"]
                    duration_ms = int(n * 1000 / fps)
                    seen: set[int] = set()
                    for ts in range(0, max(duration_ms, 1), every_ms):
                        idx = min(int(ts * fps / 1000), n - 1)
                        if idx in seen:
                            continue
                        seen.add(idx)
                        frame = av.decode_avi_frame(payload, idx)
                        a = frame.astype("float64")
                        clip_rows.append(
                            (
                                int(media_id),
                                ts,
                                idx,
                                frame.shape[0],
                                frame.shape[1],
                                1 if frame.ndim == 2 else frame.shape[2],
                                float(a.mean()),
                                float(a.std()),
                            )
                        )
                except (ValueError, IndexError, KeyError, struct.error):
                    continue
                rows.extend(clip_rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_ts_ms", "frame_index", "height",
                    "width", "channels", "pix_mean", "pix_std",
                ],
            )

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(op, schema=FRAME_FEATURE_SCHEMA)
    )
