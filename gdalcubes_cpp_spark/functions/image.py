"""Multimodal (image/audio/video) column operators: binary payloads with
typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

Image decode/resize/stats are REAL (numpy PNG/lossy codec). Audio decode and
video frame-sampling are STUBS (no libsndfile/ffmpeg in this container):
the Spark-side plumbing — schema, batch iteration, UDF signature — is real
and tested; the inner decode raises NotImplementedError unless the payload
uses the deterministic fake container produced by fake_audio()/fake_video().
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs

IMG_STATS_SCHEMA = (
    "image_id string, w int, h int, channels int, "
    "mean_b1 double, mean_b2 double, std_b1 double, std_b2 double, phash long"
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode + per-channel stats, batched via mapInPandas (Arrow transfer)."""
    from ..synth import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in
                    ("image_id", "w", "h", "channels", "mean_b1", "mean_b2",
                     "std_b1", "std_b2", "phash")}
            for _, r in b.iterrows():
                img = codecs.decode(r["bytes"], r["fmt"]).astype(np.float64)
                rows["image_id"].append(r["image_id"])
                rows["h"].append(img.shape[0])
                rows["w"].append(img.shape[1])
                rows["channels"].append(img.shape[2])
                rows["mean_b1"].append(float(img[:, :, 0].mean()))
                rows["mean_b2"].append(float(img[:, :, 1].mean()) if img.shape[2] > 1 else None)
                rows["std_b1"].append(float(img[:, :, 0].std()))
                rows["std_b2"].append(float(img[:, :, 1].std()) if img.shape[2] > 1 else None)
                rows["phash"].append(phash64(img.astype(np.uint8)))
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, IMG_STATS_SCHEMA)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the thumbnail kernel)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def thumbnails(images: DataFrame, size: int = 16) -> DataFrame:
    """Decode → resize → re-encode PNG; returns (image_id, thumb binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, thumbs = [], []
            for _, r in b.iterrows():
                img = codecs.decode(r["bytes"], r["fmt"])
                ids.append(r["image_id"])
                thumbs.append(codecs.encode_png(resize_nearest(img, size, size)))
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, "image_id string, thumb binary"
    )


def create_overviews(images: DataFrame, levels=(2, 4, 8)) -> DataFrame:
    """image_collection_ops::create_overviews analog (src/image_collection_ops.h:
    30-34): batch maintenance job producing a resolution pyramid per image —
    (image_id, level, bytes). mapInPandas over image rows; the reference's
    warp.cpp:104-157 overview-selection pushdown reads these instead of the
    full-res image when the target grid is coarse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, lvls, data = [], [], []
            for _, r in b.iterrows():
                img = codecs.decode(r["bytes"], r["fmt"])
                for lv in levels:
                    oh = max(1, img.shape[0] // lv)
                    ow = max(1, img.shape[1] // lv)
                    ids.append(r["image_id"])
                    lvls.append(lv)
                    data.append(codecs.encode_png(resize_nearest(img, oh, ow)))
            yield pd.DataFrame({"image_id": ids, "level": lvls, "bytes": data})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, "image_id string, level int, bytes binary"
    )


# ---------------------------------------------------------------------------
# audio / video stubs (deterministic fake containers)
# ---------------------------------------------------------------------------

_FAKE_AUDIO_MAGIC = b"FAUD"
_FAKE_VIDEO_MAGIC = b"FVID"


def fake_audio(seed: int, n_samples: int = 1024, rate: int = 16000) -> bytes:
    """Deterministic fake 'audio' payload: header + int16 sine-ish samples."""
    t = np.arange(n_samples)
    sig = (np.sin(t * (1 + seed % 17) * 0.01) * 10000).astype(np.int16)
    return _FAKE_AUDIO_MAGIC + struct.pack("<ii", n_samples, rate) + sig.tobytes()


def decode_audio(data: bytes) -> tuple:
    """STUB for a real audio decoder (libsndfile unavailable): only the fake
    container is supported; anything else raises NotImplementedError."""
    if data[:4] != _FAKE_AUDIO_MAGIC:
        raise NotImplementedError("real audio codecs unavailable in this container")
    n, rate = struct.unpack("<ii", data[4:12])
    return np.frombuffer(data[12:12 + 2 * n], dtype=np.int16), rate


def fake_video(seed: int, n_frames: int = 8, w: int = 16, h: int = 16) -> bytes:
    """Deterministic fake 'video': header + concatenated gray frames."""
    frames = np.stack([
        ((np.arange(h * w).reshape(h, w) + seed + 31 * f) % 256).astype(np.uint8)
        for f in range(n_frames)
    ])
    return _FAKE_VIDEO_MAGIC + struct.pack("<iii", n_frames, h, w) + frames.tobytes()


def sample_frames(data: bytes, every: int = 2) -> np.ndarray:
    """STUB frame sampler: decodes the fake container, returns every-nth
    frame; swap for ffmpeg bindings in production."""
    if data[:4] != _FAKE_VIDEO_MAGIC:
        raise NotImplementedError("real video codecs unavailable in this container")
    n, h, w = struct.unpack("<iii", data[4:16])
    frames = np.frombuffer(data[16:16 + n * h * w], dtype=np.uint8).reshape(n, h, w)
    return frames[::every]


def audio_stats(df: DataFrame, bytes_col: str = "payload") -> DataFrame:
    """(id, n_samples, rate, rms) over fake-audio payloads via mapInPandas —
    the real-world plumbing for a libsndfile-backed kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ns, rates, rms = [], [], [], []
            for _, r in b.iterrows():
                sig, rate = decode_audio(r[bytes_col])
                ids.append(r["id"])
                ns.append(len(sig))
                rates.append(rate)
                rms.append(float(np.sqrt(np.mean(sig.astype(np.float64) ** 2))))
            yield pd.DataFrame({"id": ids, "n_samples": ns, "rate": rates, "rms": rms})

    return df.mapInPandas(run, "id long, n_samples int, rate int, rms double")
