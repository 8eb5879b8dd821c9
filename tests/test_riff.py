"""RIFF containers (sources/riff.py): WAV/PCM depths, MJPEG-AVI
structure + roundtrip quality, and malformed-stream refusals."""

import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark.sources.riff import (
    decode_avi_mjpeg,
    decode_wav,
    encode_avi_mjpeg,
    encode_wav,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("dtype,rate", [("u1", 8000), ("<i2", 16000),
                                        ("<i4", 44100), ("<f4", 22050)])
def test_wav_roundtrip_lossless(dtype, rate):
    t = np.arange(3001)
    base = np.sin(t * 0.013)
    if dtype == "u1":
        sig = (base * 100 + 128).astype(dtype)
    elif dtype == "<f4":
        sig = base.astype(dtype)
    else:
        sig = (base * 10000).astype(dtype)
    back, r = decode_wav(encode_wav(sig, rate=rate))
    assert r == rate
    assert np.array_equal(back, sig)


def test_wav_stereo_interleave():
    t = np.arange(500)
    sig = np.stack([(np.sin(t * 0.02) * 9000).astype(np.int16),
                    (np.cos(t * 0.05) * 5000).astype(np.int16)], axis=1)
    back, _ = decode_wav(encode_wav(sig, rate=16000))
    assert back.shape == (500, 2)
    assert np.array_equal(back, sig)


def test_wav_24bit_read():
    """24-bit PCM (read-side interop: we never write it) widens to i32
    with correct sign extension."""
    vals = np.array([-(1 << 23), -1, 0, 1, (1 << 23) - 1], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) % 2 else b""))
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    a, r = decode_wav(wav)
    assert np.array_equal(a, vals)


def test_wav_golden_structure():
    """Spec conformance: canonical 44-byte PCM header field-by-field."""
    sig = np.zeros(10, dtype=np.int16)
    b = encode_wav(sig, rate=8000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    assert b[12:16] == b"fmt " and struct.unpack_from("<I", b, 16)[0] == 16
    tag, ch, rate, brate, block, bits = struct.unpack_from("<HHIIHH", b, 20)
    assert (tag, ch, rate, brate, block, bits) == (1, 1, 8000, 16000, 2, 16)
    assert b[36:40] == b"data" and struct.unpack_from("<I", b, 40)[0] == 20


def _frames(n=5, h=32, w=48, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.stack([(yy * 3 + seed + 9 * f) % 256, (xx * 2) % 256,
                      ((xx + yy) // 2) % 256], axis=-1).astype(np.uint8)
            for f in range(n)]


def test_avi_mjpeg_roundtrip():
    frames = _frames()
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=25))
    assert fps == 25 and dec.shape == (5, 32, 48, 3)
    for i, f in enumerate(frames):
        assert _psnr(f, dec[i]) >= 40.0


def test_avi_golden_structure():
    frames = _frames(n=3)
    b = encode_avi_mjpeg(frames, fps=10)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    # hdrl LIST first; avih total_frames and dims
    assert b[12:16] == b"LIST" and b[20:24] == b"hdrl"
    assert b[24:28] == b"avih"
    us_pf, _mbs, _pad, flags, total = struct.unpack_from("<IIIII", b, 32)
    assert us_pf == 100000 and flags & 0x10 and total == 3
    w, h = struct.unpack_from("<II", b, 32 + 32)
    assert (w, h) == (48, 32)
    # every frame chunk is a standalone baseline JPEG
    movi = b.find(b"movi")
    first = b.find(b"00dc", movi)
    sz = struct.unpack_from("<I", b, first + 4)[0]
    assert b[first + 8:first + 10] == b"\xff\xd8"        # SOI
    assert b[first + 8 + sz - 2:first + 8 + sz] == b"\xff\xd9"  # EOI
    # idx1 entry count == frames
    idx = b.find(b"idx1")
    isz = struct.unpack_from("<I", b, idx + 4)[0]
    assert isz == 3 * 16


def test_riff_refusals():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"RIFX" + b"\x00" * 64)
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"\x00" * 32)
    # an AVI with headers but an EMPTY movi list (well-formed, 0 frames):
    # rebuild = original hdrl LIST + empty movi, idx1 dropped
    from gdalcubes_cpp_spark.sources.riff import _list
    one = encode_avi_mjpeg(_frames(n=1), fps=10)
    hdrl_at = one.find(b"LIST", 12)
    hdrl_len = struct.unpack_from("<I", one, hdrl_at + 4)[0]
    hdrl = one[hdrl_at:hdrl_at + 8 + hdrl_len]
    body = hdrl + _list(b"movi", b"")
    empty = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    with pytest.raises(ValueError, match="no video frames"):
        decode_avi_mjpeg(empty)
    # a TRUNCATED file refuses instead of decoding fewer frames
    with pytest.raises(ValueError, match="truncated RIFF"):
        decode_avi_mjpeg(one[:len(one) - 10])
    # truncated JPEG inside a frame chunk surfaces as ValueError
    b = bytearray(encode_avi_mjpeg(_frames(n=1), fps=10))
    first = bytes(b).find(b"00dc")
    sz = struct.unpack_from("<I", b, first + 4)[0]
    struct.pack_into("<I", b, first + 4, sz - 8)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(b))
