"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns travelling next to
typed metadata structs.  The Spark-side plumbing — schema, partition-safe
batch iteration, Arrow batch shapes, pandas-UDF signatures — is real and
tested.  Decoders:

* REAL (stdlib + numpy, no external codec libraries needed): uncompressed
  24-bit BMP and binary PPM (P6) images — header parse + numpy pixel view +
  nearest-neighbour resize; PCM WAV audio — ``wave`` module + numpy,
  RMS/zero-crossings/band energies.
* STUBBED: compressed formats (JPEG/PNG/MP4/...) need PIL/pyav, absent from
  this container — ``decode_media`` raises ``NotImplementedError`` for them
  unless ``fake=True`` selects the deterministic sha1 stand-in decoder
  (same data flow and shapes; used to test the plumbing for those kinds).

Usage shape (mapInPandas keeps one media batch in memory at a time, so
executor memory is bounded by maxRecordsPerBatch x payload size):

    feats = extract_media_features(media_df)          # real where possible
    feats = extract_media_features(media_df, fake=True)  # plumbing tests
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, codec:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, "
    "feature array<float>, decoder string"
)

FEATURE_DIM = 8


def decode_image(payload: bytes) -> np.ndarray:
    """Uncompressed image bytes -> (h, w, 3) uint8 RGB array.

    Supports 24-bit uncompressed BMP (BITMAPINFOHEADER) and binary PPM (P6)
    — both decodable with struct + numpy alone.  Compressed formats raise
    NotImplementedError (codec libraries absent from this container)."""
    if payload[:2] == b"BM":
        off, = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp, = struct.unpack_from("<H", payload, 28)
        comp, = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
        px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
        return px[::-1] if flip else px
    if payload[:2] == b"P6":
        parts: list[bytes] = []
        i = 2
        while len(parts) < 3:  # width, height, maxval (skip comments/ws)
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                i = payload.index(b"\n", i) + 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            parts.append(payload[i:j])
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
        if maxval != 255:
            raise NotImplementedError(f"PPM maxval={maxval} unsupported")
        return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
            h, w, 3
        )
    raise NotImplementedError(
        "compressed image formats need codec libraries not in this container"
    )


def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize via numpy index maps (no PIL needed)."""
    h, w = px.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ri][:, ci]


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (mono float32 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload)) as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def _image_features(px: np.ndarray) -> np.ndarray:
    h, w = px.shape[:2]
    small = resize_image(px, 8, 8).astype(np.float32) / 255.0
    mean_rgb = small.reshape(-1, 3).mean(axis=0)
    luma = small @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return np.array(
        [h / 4096.0, w / 4096.0, mean_rgb[0], mean_rgb[1], mean_rgb[2],
         float(luma.std()), h / max(w, 1), 1.0],
        dtype=np.float32,
    )


def _audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    rate = max(rate, 1)  # malformed WAV headers can claim framerate 0
    n = max(len(x), 1)
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x[: min(len(x), 1 << 14)])) if len(x) else np.zeros(1)
    bands = np.array_split(spec, 3)
    e = np.array([float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bands])
    e = e / (e.sum() + 1e-9)
    return np.array(
        [n / rate, rate / 48000.0, rms, zcr, e[0], e[1], e[2], 1.0], dtype=np.float32
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload into a fixed-dim feature vector.

    Real path: BMP/PPM images and PCM WAV audio decode with stdlib + numpy
    (magic-sniffed, so a mislabelled kind still decodes).  Compressed
    formats and video frame-sampling need PIL/pyav — NotImplementedError —
    unless ``fake=True`` selects the deterministic sha1 stand-in decoder
    (same data flow and shapes) used to test the plumbing for those kinds.
    """
    if not fake:
        if payload[:2] in (b"BM", b"P6"):
            return _image_features(decode_image(payload))
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, rate = decode_audio(payload)
            return _audio_features(x, rate)
        raise NotImplementedError(
            "compressed/video formats require codec libraries not present "
            "in this container; pass fake=True for the deterministic "
            "plumbing-test decoder"
        )
    digest = hashlib.sha1(kind.encode() + payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Binary payloads -> fixed-dim feature vectors via mapInPandas.

    Batch shape contract: each Arrow batch holds <= maxRecordsPerBatch rows;
    payloads are decoded one batch at a time and never concatenated, so peak
    executor memory is one batch of payloads + one batch of features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            decoders: list = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                if fake:
                    feats.append(decode_media(p, k, fake=True).tolist())
                    decoders.append("fake")
                    continue
                try:
                    feats.append(decode_media(p, k).tolist())
                    decoders.append("real")
                except NotImplementedError:
                    # degrade per ROW, never per job: an unsupported payload
                    # yields a null feature instead of failing the task
                    feats.append(None)
                    decoders.append("unsupported")
                except Exception:  # noqa: BLE001 — malformed payloads
                    # truncated/corrupt bytes (struct.error, wave.Error,
                    # ValueError...) degrade the same way: null feature,
                    # decoder tag distinguishes them for monitoring
                    feats.append(None)
                    decoders.append("error")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                    "decoder": decoders,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the corpus documents (html bytes act
    as opaque payloads) — exercises the binary-column plumbing end to end."""
    return docs.select(
        F.xxhash64("url").alias("media_id"),
        F.when(F.length("url") % 3 == 0, "image")
        .when(F.length("url") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _fixture_bytes(tag: str, n: int, seed: int) -> bytes:
    """Deterministic byte stream from chained sha256 — platform-independent
    (no RNG library semantics to pin)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{tag}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def _bmp_bytes(w: int, h: int, pix_bgr: bytes) -> bytes:
    """24-bit uncompressed bottom-up BMP from raw BGR pixel bytes."""
    stride = (w * 3 + 3) & ~3
    body = b"".join(
        pix_bgr[r * w * 3 : (r + 1) * w * 3] + b"\x00" * (stride - w * 3)
        for r in range(h)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def _wav_bytes(samples_i16: bytes, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples_i16)
    return buf.getvalue()


def build_media_fixture(seed: int = 13) -> list:
    """Deterministic (media_id, kind, payload) fixture covering every
    decoder path: real BMP (bottom-up row order), real PPM (with a header
    comment), real PCM WAV (mono + stereo, several rates), truncated
    payloads (per-row 'error' degradation) and compressed-format magics
    (per-row 'unsupported' degradation — the honest JPEG/PNG/MP4 stub).

    Pure function of ``seed`` built on chained sha256, so the same rows can
    be regenerated independently by an oracle process and decoded
    row-at-a-time — the contract behind the ``multimodal_features`` driver
    query (features are fixed-pointed before comparison; the decode math
    itself is identical library code on both sides, what the oracle checks
    is the DISTRIBUTED plumbing: Arrow batching, schema, per-row
    degradation, hash integrity)."""
    rows = []
    mid = 0
    for i in range(12):
        w, h = 3 + (i * 5) % 12, 3 + (i * 7) % 12
        rows.append((mid, "image", _bmp_bytes(w, h, _fixture_bytes(f"bmp{i}", w * h * 3, seed))))
        mid += 1
    for i in range(12):
        w, h = 4 + (i * 3) % 10, 2 + (i * 5) % 11
        head = f"P6\n# fixture {i}\n{w} {h}\n255\n".encode()
        rows.append((mid, "image", head + _fixture_bytes(f"ppm{i}", w * h * 3, seed)))
        mid += 1
    for i in range(12):
        rate = (8000, 16000, 44100)[i % 3]
        channels = 1 + (i % 2)
        n = (64 + 37 * i) * channels
        rows.append((mid, "audio", _wav_bytes(_fixture_bytes(f"wav{i}", n * 2, seed), rate, channels)))
        mid += 1
    # truncated real formats -> decoder='error'
    rows.append((mid, "image", rows[0][2][:20])); mid += 1
    rows.append((mid, "image", b"P6\n5 5\n255\n" + b"\x01" * 7)); mid += 1
    rows.append((mid, "audio", rows[24][2][:30])); mid += 1
    # compressed magics -> decoder='unsupported'
    rows.append((mid, "image", b"\x89PNG\r\n\x1a\n" + _fixture_bytes("png", 64, seed))); mid += 1
    rows.append((mid, "image", b"\xff\xd8\xff\xe0" + _fixture_bytes("jpg", 64, seed))); mid += 1
    rows.append((mid, "video", b"\x00\x00\x00\x18ftypmp42" + _fixture_bytes("mp4", 64, seed))); mid += 1
    return rows
