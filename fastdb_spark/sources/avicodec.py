"""Dependency-free AVI video container codec (RIFF 'AVI '), numpy-only.

The video modality's real decode leg.  An AVI file is the same RIFF
chunk grammar the WAV codec already parses, carrying a header list
(``avih`` + per-stream ``strh``/``strf``) and a ``movi`` list of frame
chunks.  Two frame codecs cover the dependency-free envelope:

- **MJPG** — each frame is a baseline JPEG (``sources.jpegcodec``), the
  classic motion-JPEG interchange format;
- **BI_RGB (raw DIB)** — uncompressed bottom-up BGR rows padded to
  4-byte boundaries: bit-exact, the lossless leg the exact-correctness
  gate can adjudicate.

Anything else (H.26x, VP9, audio streams, ODML extensions) raises
``ValueError`` naming the feature — the reject-row cascade upstream
catches it.  ``iter_avi_frames`` exposes the frame chunks WITHOUT
decoding them, so ``pipeline.multimodal.sample_frames_decoded`` can
decode only the sampled timestamps — the shape that matters when a
corpus row holds minutes of video but the pipeline wants one frame a
second.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from fastdb_spark.sources.jpegcodec import decode_jpeg, encode_jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _dib_encode(frame: np.ndarray) -> bytes:
    """(h, w) grey or (h, w, 3) RGB uint8 -> bottom-up padded BGR DIB rows."""
    if frame.ndim == 2:
        frame = np.stack([frame] * 3, axis=-1)
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    h, w, _ = bgr.shape
    stride = w * 3
    pad = (-stride) % 4
    rows = np.ascontiguousarray(bgr).reshape(h, stride)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    return rows.tobytes()


def _dib_decode(body: bytes, w: int, h: int) -> np.ndarray:
    stride = w * 3
    padded = stride + ((-stride) % 4)
    if len(body) < padded * h:
        raise ValueError("truncated BI_RGB frame")
    rows = np.frombuffer(body[: padded * h], dtype=np.uint8).reshape(h, padded)
    bgr = rows[:, :stride].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_avi(
    frames: np.ndarray,
    fps: int = 10,
    codec: str = "mjpg",
    quality: int = 85,
) -> bytes:
    """uint8 frames (n, h, w) or (n, h, w, 3) -> AVI bytes.

    ``codec='mjpg'`` wraps each frame as a baseline JPEG (lossy;
    ``quality`` as for ``encode_jpeg``); ``codec='rgb'`` stores raw
    BI_RGB DIBs (lossless)."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        raise ValueError(f"AVI encode expects uint8 frames, got {frames.dtype}")
    if frames.ndim not in (3, 4) or (frames.ndim == 4 and frames.shape[3] != 3):
        raise ValueError(
            f"AVI encode expects (n,h,w) or (n,h,w,3), got {frames.shape}"
        )
    n, h, w = frames.shape[:3]
    if n == 0 or h == 0 or w == 0:
        raise ValueError("cannot AVI-encode zero frames or empty frames")
    if fps < 1:
        raise ValueError(f"invalid fps {fps}")
    if codec == "mjpg":
        fourcc = b"MJPG"
        compression = b"MJPG"
        payloads = [encode_jpeg(f, quality=quality) for f in frames]
    elif codec == "rgb":
        fourcc = b"\x00\x00\x00\x00"
        compression = b"\x00\x00\x00\x00"  # BI_RGB
        payloads = [_dib_encode(f) for f in frames]
    else:
        raise ValueError(f"unsupported AVI codec {codec!r} (mjpg|rgb)")

    maxbuf = max(len(p) for p in payloads)
    # avih: MainAVIHeader (56 bytes of fields)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec (advisory)
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX? not written -> use 0x0; keep 0x10 off
        n, 0, 1, maxbuf,
        w, h, 0, 0, 0, 0,
    )
    # fix flags: no index chunk is written, so flags must be 0
    avih = avih[:12] + struct.pack("<I", 0) + avih[16:]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", fourcc,
        0, 0, 0, 0,
        1, fps,            # dwScale / dwRate -> rate/scale = fps
        0, n, maxbuf,
        0xFFFFFFFF,        # dwQuality (default)
        0,                 # dwSampleSize (0 for video)
        0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, compression,
        len(payloads[0]) if codec == "rgb" else 0,
        0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_header(payload: bytes) -> tuple[int, int, int, int, bytes, int, int]:
    """-> (n_frames, width, height, fps, compression, movi_start, movi_end)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    n_frames = width = height = 0
    fps = 1
    compression = None
    movi = None
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])

    def walk(pos: int, end: int) -> None:
        nonlocal n_frames, width, height, fps, compression, movi
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                if ltype == b"movi":
                    movi = (body_start + 4, body_start + length)
                else:
                    walk(body_start + 4, body_start + length)
            elif cid == b"avih":
                vals = struct.unpack(
                    "<IIIIIIIIII", payload[body_start : body_start + 40]
                )
                n_frames = vals[4]
                width, height = vals[8], vals[9]
                if vals[0]:
                    fps = max(1, round(1_000_000 / vals[0]))
            elif cid == b"strh":
                fcc_type = payload[body_start : body_start + 4]
                if fcc_type == b"vids":
                    scale, rate = struct.unpack(
                        "<II", payload[body_start + 20 : body_start + 28]
                    )
                    if scale:
                        fps = max(1, round(rate / scale))
                elif fcc_type == b"auds":
                    raise ValueError("AVI audio streams unsupported")
            elif cid == b"strf":
                if length >= 40 and compression is None:
                    comp = payload[body_start + 16 : body_start + 20]
                    compression = comp
            pos = body_start + length + (length & 1)

    walk(pos, end)
    if movi is None:
        raise ValueError("AVI missing movi list")
    if compression is None:
        raise ValueError("AVI missing stream format (strf)")
    if compression not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
        raise ValueError(
            f"unsupported AVI codec {compression!r} (MJPG or BI_RGB only)"
        )
    return n_frames, width, height, fps, compression, movi[0], movi[1]


def iter_avi_frames(payload: bytes) -> Iterator[bytes]:
    """Yield each video frame's raw chunk bytes WITHOUT decoding —
    sampling paths seek past unsampled frames for free."""
    *_, movi_start, movi_end = _parse_header(payload)
    pos = movi_start
    while pos + 8 <= movi_end:
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid in (b"00dc", b"00db"):
            yield payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)


def avi_info(payload: bytes) -> dict:
    """Header-only probe: frame count, dims, fps, codec — no frame decode."""
    n, w, h, fps, comp, _s, _e = _parse_header(payload)
    return {
        "n_frames": n,
        "width": w,
        "height": h,
        "fps": fps,
        "codec": "mjpg" if comp in (b"MJPG", b"mjpg") else "rgb",
    }


def _decode_frame_chunk(chunk: bytes, comp: bytes, w: int, h: int) -> np.ndarray:
    """Decode one frame chunk; parser internals (struct/IndexError from a
    torn MJPEG frame) surface as the documented ValueError contract so
    the reject-row cascade upstream catches them."""
    try:
        if comp in (b"MJPG", b"mjpg"):
            return decode_jpeg(chunk)
        return _dib_decode(chunk, w, h)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed AVI frame payload: {e}") from e


def decode_avi_frame(payload: bytes, index: int) -> np.ndarray:
    """Decode ONE frame by index (0-based) — the sampled-decode path."""
    n, w, h, _fps, comp, _s, _e = _parse_header(payload)
    for i, chunk in enumerate(iter_avi_frames(payload)):
        if i == index:
            return _decode_frame_chunk(chunk, comp, w, h)
    raise ValueError(f"AVI frame index {index} out of range")


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> (frames array (n, h, w, 3) or (n, h, w), fps)."""
    n, w, h, fps, comp, _s, _e = _parse_header(payload)
    frames = [
        _decode_frame_chunk(chunk, comp, w, h)
        for chunk in iter_avi_frames(payload)
    ]
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames), fps


def sniff_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
