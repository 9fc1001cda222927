"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A 100 TB multimodal corpus stores media as binary columns with typed metadata
and runs decode/feature-extract/resize/frame-sample as Arrow-batched kernels.
The decode libraries (PIL/ffmpeg/librosa) are not in this container, so the
decode step is STUBBED: `decoder="fake"` is a deterministic pure-python codec
used by tests; `decoder="real"` raises NotImplementedError where the real
library call belongs. Everything Spark-side — schema, partition sizing, UDF
signatures, Arrow batch shapes — is real and tested.

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


def _decode_image(blob: bytes, decoder: str) -> tuple[int, int, np.ndarray]:
    if decoder == "fake":
        if blob[:8] != IMG_MAGIC:
            raise ValueError("not a fake image blob")
        w, h = struct.unpack("<HH", blob[8:12])
        px = np.frombuffer(blob, dtype=np.uint8, offset=12)
        return w, h, px
    raise NotImplementedError(
        "real image decode needs PIL/opencv — not available in this container; "
        "swap this branch for PIL.Image.open(io.BytesIO(blob)) in production"
    )


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
                blob = bytes(blob)
                if decoder != "fake":
                    raise NotImplementedError("real audio decode needs ffmpeg/librosa")
                if blob[:8] != AUD_MAGIC:
                    raise ValueError("not a fake audio blob")
                (sr,) = struct.unpack("<I", blob[8:12])
                samples = np.frombuffer(blob, dtype=np.int16, offset=12).astype(np.float64)
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
                    raise NotImplementedError("real video decode needs ffmpeg")
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
