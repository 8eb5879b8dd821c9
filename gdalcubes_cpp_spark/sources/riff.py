"""RIFF containers from spec: WAV/PCM audio and MJPEG-in-AVI video —
the real codecs behind the multimodal audio/video columns (the last two
stubs of rounds 1-4; functions/image.py decode_audio / sample_frames).

Both formats are public Microsoft/IBM specifications:

- **WAVE** (Multimedia Programming Interface and Data Specifications
  1.0, 1991): ``RIFF``/``WAVE`` with a ``fmt `` chunk (format tag 1 =
  integer PCM at 8/16/24/32 bits, 3 = IEEE float32) and a ``data`` chunk
  of interleaved frames; odd-sized chunks pad one byte.
- **AVI** (AVI RIFF File Reference): ``RIFF``/``AVI `` holding an
  ``hdrl`` LIST (``avih`` main header + per-stream ``strl`` LIST with
  ``strh``/``strf``), a ``movi`` LIST of ``00dc`` compressed-video
  chunks, and an ``idx1`` index. Frames here are baseline JPEG —
  Motion-JPEG is exactly "a JPEG per frame" — encoded/decoded by the
  from-spec T.81 codec in sources/jpegbase.py.

Untrusted-bytes policy: malformed containers raise ValueError (a chunk
declaring more bytes than remain REFUSES — truncated files never return
silently-short samples; a zero-advance walk raises), never hang.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


# ------------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000,
               bits: int | None = None) -> bytes:
    """(n,) or (n, channels) samples -> WAV bytes. Integer arrays write
    integer PCM (u8/i16/i32 by dtype or ``bits``); float arrays write
    IEEE float32 (format tag 3)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if a.dtype.kind == "f":
        tag, bits_ = 3, 32
        raw = a.astype("<f4").tobytes()
    else:
        bits_ = bits or a.dtype.itemsize * 8
        if bits_ not in _PCM_DTYPES:
            raise ValueError(f"unsupported PCM depth {bits_}")
        dt = np.dtype(_PCM_DTYPES[bits_]).newbyteorder("<")
        tag = 1
        raw = a.astype(dt).tobytes()
    block = ch * bits_ // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits_)
    chunks = _chunk(b"fmt ", fmt) + _chunk(b"data", raw)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) % 2 else b"")


def _walk_riff(buf: bytes, start: int, end: int):
    """-> [(fourcc, payload_start, payload_len)] one level deep. A chunk
    whose declared size runs past the container is a truncated/corrupt
    file and REFUSES (the module's untrusted-bytes policy — clamping
    would return silently-short sample/frame data)."""
    out = []
    pos = start
    while pos + 8 <= end:
        fourcc = bytes(buf[pos:pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"truncated RIFF: chunk {fourcc!r} declares {size} bytes "
                f"but only {end - payload} remain")
        out.append((fourcc, payload, size))
        nxt = payload + size + (size % 2)
        if nxt <= pos:
            raise ValueError("corrupt RIFF: zero-advance chunk walk")
        pos = nxt
    return out


def decode_wav(data: bytes):
    """WAV bytes -> (samples (n,) or (n, ch) ndarray, rate). 24-bit PCM
    widens to int32; float64 data is accepted read-side (tag 3, 64-bit)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    raw = None
    for fourcc, off, size in _walk_riff(data, 12, len(data)):
        if fourcc == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, off)
        elif fourcc == b"data":
            raw = bytes(data[off:off + size])
    if fmt is None or raw is None:
        raise ValueError("WAVE missing fmt/data chunk")
    tag, ch, rate, _brate, _block, bits = fmt
    if tag == 0xFFFE and bits in (8, 16, 24, 32):
        tag = 1                                       # WAVE_FORMAT_EXTENSIBLE
    if tag == 1:
        if bits == 24:
            b = np.frombuffer(raw[:len(raw) - len(raw) % 3], np.uint8)
            b = b.reshape(-1, 3)
            vals = (b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            a = vals.astype(np.int32)
        elif bits in _PCM_DTYPES:
            dt = np.dtype(_PCM_DTYPES[bits]).newbyteorder("<")
            a = np.frombuffer(raw[:len(raw) - len(raw) % dt.itemsize], dt)
        else:
            raise ValueError(f"unsupported PCM depth {bits}")
    elif tag == 3 and bits in (32, 64):
        dt = np.dtype(np.float32 if bits == 32 else np.float64).newbyteorder("<")
        a = np.frombuffer(raw[:len(raw) - len(raw) % dt.itemsize], dt)
    else:
        raise ValueError(f"unsupported WAVE format tag {tag}/{bits}")
    if ch > 1:
        a = a[:len(a) - len(a) % ch].reshape(-1, ch)
    return a, int(rate)


# ------------------------------------------------------------------- AVI

def encode_avi_mjpeg(frames, fps: int = 10, **jpeg_kw) -> bytes:
    """list of (h, w[, c]) uint8 frames -> Motion-JPEG AVI bytes (each
    frame one baseline JPEG via sources/jpegbase.encode_jpeg)."""
    from .jpegbase import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(np.asarray(f), **jpeg_kw) for f in frames]
    maxsz = max(len(p) for p in payloads)

    avih = struct.pack("<IIIIIIIIII4I",
                       1_000_000 // fps, maxsz * fps, 0, 0x10,  # AVIF_HASINDEX
                       len(frames), 0, 1, maxsz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), maxsz,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b""
    idx = b""
    for p in payloads:
        # idx1 offsets point at the chunk fourcc, measured from the
        # 'movi' fourcc (the widespread convention, offset 4 = 1st chunk)
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", movi_body)
    body = hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def decode_avi_mjpeg(data: bytes):
    """MJPEG AVI bytes -> (frames: (n, h, w, c) uint8 ndarray, fps)."""
    from .jpegbase import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    fps = None
    frames = []

    def walk(start, end):
        nonlocal fps
        for fourcc, off, size in _walk_riff(data, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size)
            elif fourcc == b"strh" and size >= 40:
                if data[off:off + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, off + 20)
                    if scale:
                        fps = rate // scale
            elif fourcc in (b"00dc", b"00db") and size:
                frames.append(decode_jpeg(bytes(data[off:off + size])))

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI stream holds no video frames")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError("AVI frames disagree on dimensions")
    return np.stack(frames), int(fps or 0)
