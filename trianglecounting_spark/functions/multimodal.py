"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A 100 TB multimodal corpus stores media as binary columns with typed metadata
and runs decode/feature-extract/resize/frame-sample as Arrow-batched kernels.
Decoder tiers:

  * ``decoder="fake"`` — a deterministic library-free codec used by tests for
    the Spark-side plumbing (schema, partition sizing, UDF signatures, Arrow
    batch shapes).
  * ``decoder="real"`` — REAL decode for the uncompressed interchange
    formats, pure numpy, no external library: BMP (24-bit BI_RGB and 8-bit
    palette, top-down or bottom-up, row padding handled) for images and
    RIFF/WAVE 16-bit PCM for audio. Only COMPRESSED codecs (JPEG/PNG,
    MP3/AAC, video containers) still raise NotImplementedError — those
    genuinely need PIL/ffmpeg, which are not in this container; the raise
    marks exactly where the library call belongs.

Fake codec format (deterministic, library-free):
    image: 8-byte header b"FAKEIMG0" + u16 width + u16 height + w*h u8 gray
    audio: 8-byte header b"FAKEAUD0" + u32 sample_rate + i16 samples
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

IMG_MAGIC = b"FAKEIMG0"
AUD_MAGIC = b"FAKEAUD0"

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width long, height long, mean_px double, std_px double"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate long, n_samples long, rms double, peak double"
)


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image bytes (tests + fixture generation)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return IMG_MAGIC + struct.pack("<HH", width, height) + px.tobytes()


def encode_fake_audio(sample_rate: int, n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(1 << 12), 1 << 12, size=n, dtype=np.int16)
    return AUD_MAGIC + struct.pack("<I", sample_rate) + samples.tobytes()


def encode_bmp_gray(width: int, height: int, seed: int) -> bytes:
    """Deterministic 24-bit bottom-up BMP with r=g=b (fixture generation;
    the integer luma of an r=g=b pixel is exactly the pixel value, so
    decode round-trips bit-exactly)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    row_bytes = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_bytes), dtype=np.uint8)
    rgb = np.repeat(px[:, :, None], 3, axis=2)
    rows[:, : width * 3] = rgb.reshape(height, width * 3)
    body = rows[::-1].tobytes()  # bottom-up row order
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    )
    return header + body


def decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy BMP decode → (width, height, flat top-down grayscale u8).
    Uncompressed (BI_RGB) 24-bit and 8-bit-palette images; grayscale via the
    integer ITU-R luma (r·299 + g·587 + b·114) // 1000 — deterministic, no
    float rounding."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    w = struct.unpack_from("<i", blob, 18)[0]
    h_raw = struct.unpack_from("<i", blob, 22)[0]
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if comp != 0:
        raise NotImplementedError(
            "compressed BMP (BI_RLE/BI_BITFIELDS) needs a codec library"
        )
    h = abs(h_raw)
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(
        blob, dtype=np.uint8, offset=data_off, count=row_bytes * h
    ).reshape(h, row_bytes)
    if h_raw > 0:  # bottom-up storage → top-down
        rows = rows[::-1]
    if bpp == 24:
        rgb = rows[:, : w * 3].reshape(h, w, 3).astype(np.int64)
        b, g, r = rgb[..., 0], rgb[..., 1], rgb[..., 2]  # BMP stores BGR
        gray = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(
            blob, dtype=np.uint8, offset=14 + hdr_size, count=n_colors * 4
        ).reshape(-1, 4).astype(np.int64)  # BGRA entries
        pal_gray = (
            (pal[:, 2] * 299 + pal[:, 1] * 587 + pal[:, 0] * 114) // 1000
        ).astype(np.uint8)
        gray = pal_gray[rows[:, :w]]
    else:
        raise NotImplementedError(f"{bpp}-bpp BMP needs a codec library")
    return w, h, gray.reshape(-1)


def encode_wav_pcm16(sample_rate: int, n: int, seed: int,
                     channels: int = 1) -> bytes:
    """Deterministic RIFF/WAVE 16-bit PCM bytes (fixture generation)."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(1 << 12), 1 << 12, size=n * channels, dtype="<i2")
    body = samples.tobytes()
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Pure-numpy RIFF/WAVE decode → (sample_rate, int16 samples of channel
    0). 16-bit PCM only; compressed audio raises toward ffmpeg/librosa."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    off, sr, n_ch, data = 12, None, 1, None
    while off + 8 <= len(blob):
        cid = blob[off:off + 4]
        size = struct.unpack_from("<I", blob, off + 4)[0]
        body = blob[off + 8:off + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_ch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    "only 16-bit PCM WAV decodes natively; compressed audio "
                    "needs ffmpeg/librosa"
                )
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)[:, 0]
    return int(sr), samples


def _decode_image(blob: bytes, decoder: str) -> tuple[int, int, np.ndarray]:
    if decoder == "fake":
        if blob[:8] != IMG_MAGIC:
            raise ValueError("not a fake image blob")
        w, h = struct.unpack("<HH", blob[8:12])
        px = np.frombuffer(blob, dtype=np.uint8, offset=12)
        return w, h, px
    if decoder == "real":
        if blob[:2] == b"BM":
            return decode_bmp(blob)
        raise NotImplementedError(
            "compressed image codecs (JPEG/PNG/...) need PIL/opencv — not in "
            "this container; uncompressed BMP decodes natively (decode_bmp)"
        )
    raise ValueError(f"unknown decoder {decoder!r}")


def _decode_audio(blob: bytes, decoder: str) -> tuple[int, np.ndarray]:
    if decoder == "fake":
        if blob[:8] != AUD_MAGIC:
            raise ValueError("not a fake audio blob")
        (sr,) = struct.unpack("<I", blob[8:12])
        return sr, np.frombuffer(blob, dtype=np.int16, offset=12)
    if decoder == "real":
        if blob[:4] == b"RIFF":
            return decode_wav(blob)
        raise NotImplementedError(
            "compressed audio codecs need ffmpeg/librosa — not in this "
            "container; RIFF/WAVE 16-bit PCM decodes natively (decode_wav)"
        )
    raise ValueError(f"unknown decoder {decoder!r}")


def image_features(media: DataFrame, decoder: str = "fake",
                   id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Decode + per-image stats via mapInPandas (Arrow batches, zero per-row
    Python dispatch overhead beyond the necessary per-blob decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_px": [], "std_px": []}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, px = _decode_image(bytes(blob), decoder)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_px"].append(round(float(px.mean()), 6))
                out["std_px"].append(round(float(px.std()), 6))
            yield pd.DataFrame(out)

    return media.select(id_col, blob_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def image_resize(media: DataFrame, out_w: int, out_h: int, decoder: str = "fake",
                 id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the fake format. Output
    (media_id, blob). Deterministic; schema/batch plumbing identical to a real
    resize kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, px = _decode_image(bytes(blob), decoder)
                img = px.reshape(h, w)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = img[np.ix_(yi, xi)].astype(np.uint8)
                ids.append(mid)
                blobs.append(IMG_MAGIC + struct.pack("<HH", out_w, out_h) + small.tobytes())
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    return media.select(id_col, blob_col).mapInPandas(run, schema="media_id long, blob binary")


def audio_features(media: DataFrame, decoder: str = "fake",
                   id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "rms": [], "peak": []}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                sr, raw = _decode_audio(bytes(blob), decoder)
                samples = raw.astype(np.float64)
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(samples))
                out["rms"].append(round(float(np.sqrt((samples ** 2).mean())), 6))
                out["peak"].append(round(float(np.abs(samples).max()), 6))
            yield pd.DataFrame(out)

    return media.select(id_col, blob_col).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int, decoder: str = "fake",
                 id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Video frame sampling stub: treats the fake image sequence layout
    (concatenated fake-image records) as a 'video'; emits every n-th frame.
    Output (media_id, frame_idx, blob)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "blob": []}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                if decoder != "fake":
                    raise NotImplementedError(
                        "video containers (MP4/WebM/...) need ffmpeg — not in "
                        "this container; the fake concatenated-frame stream "
                        "exercises the sampling plumbing"
                    )
                off, idx = 0, 0
                while off < len(blob):
                    if blob[off:off + 8] != IMG_MAGIC:
                        raise ValueError("corrupt fake video stream")
                    w, h = struct.unpack("<HH", blob[off + 8:off + 12])
                    end = off + 12 + w * h
                    if idx % every_n == 0:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["blob"].append(blob[off:end])
                    off, idx = end, idx + 1
            yield pd.DataFrame(out)

    return media.select(id_col, blob_col).mapInPandas(
        run, schema="media_id long, frame_idx long, blob binary"
    )
