"""JPEG 2000 codec (sources/jpeg2000.py — ISO/IEC 15444-1 reversible
path): MQ-coder fuzz, 5/3 DWT exactness, Tier-1 code-block fuzz, tag
trees, marker/box structure, lossless end-to-end roundtrips, and the
Sentinel-2 preset flowing pixels through build_cube."""

import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark import codecs
from gdalcubes_cpp_spark.sources.jpeg2000 import (
    MQDecoder,
    MQEncoder,
    TagTree,
    _BitReader,
    _BitWriter,
    _get_npasses,
    _put_npasses,
    _subband_layout,
    decode_codeblock,
    decode_jp2,
    dwt53_forward,
    dwt53_inverse,
    encode_codeblock,
    encode_j2k,
    encode_jp2,
)


def test_mq_coder_fuzz():
    for seed in range(60):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 1500))
        p = rng.rand()
        bits = (rng.rand(n) < p).astype(int).tolist()
        cxs = rng.randint(0, 19, size=n).tolist()
        enc = MQEncoder()
        for b, c in zip(bits, cxs):
            enc.encode(int(b), int(c))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in cxs] == bits, seed


def test_dwt53_lossless_and_layout():
    rng = np.random.RandomState(0)
    for shape in [(8, 8), (17, 23), (37, 53), (1, 7), (64, 64), (130, 96)]:
        for lev in (1, 2, 3):
            x = rng.randint(0, 65536, size=shape)
            ll, bands = dwt53_forward(x, lev)
            assert (dwt53_inverse(ll, bands, shape) == x).all()
            lay = _subband_layout(shape[0], shape[1], lev)
            assert ll.shape == (lay[0][0][1], lay[0][0][2])
            for r in range(1, lev + 1):
                hl, lh, hh = bands[lev - r]
                for arr, (_n, bh, bw) in zip((hl, lh, hh), lay[r]):
                    assert arr.shape == (bh, bw), (shape, lev, r)


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_codeblock_fuzz(band):
    rng = np.random.RandomState(hash(band) % 2**31)
    for kind in range(5):
        h, w = int(rng.randint(1, 66)), int(rng.randint(1, 66))
        if kind == 0:
            c = rng.randint(-2**12, 2**12, size=(h, w))
        elif kind == 1:
            c = np.zeros((h, w), dtype=np.int64)
        elif kind == 2:
            c = (rng.rand(h, w) < 0.05) * rng.randint(-2000, 2000, size=(h, w))
        elif kind == 3:
            c = rng.randint(-3, 4, size=(h, w))
        else:
            c = (rng.randn(h, w) * 500).astype(np.int64)
        data, npasses, nplanes, _trunc = encode_codeblock(c.astype(np.int64), band)
        back = decode_codeblock(data, h, w, band, nplanes, npasses)
        assert (back == c).all(), (band, kind, h, w)


def test_tagtree_roundtrip():
    rng = np.random.RandomState(3)
    for _ in range(20):
        gw, gh = int(rng.randint(1, 6)), int(rng.randint(1, 6))
        vals = rng.randint(0, 9, size=(gh, gw))
        enc = TagTree(gw, gh)
        enc.set_values(vals)
        bw = _BitWriter()
        for y in range(gh):
            for x in range(gw):
                t = 1
                while not enc.known[0][y, x]:
                    enc.encode(x, y, t, bw)
                    t += 1
        br = _BitReader(bw.flush())
        dec = TagTree(gw, gh)
        for y in range(gh):
            for x in range(gw):
                t = 1
                v = None
                while v is None:
                    v = dec.decode(x, y, t, br)
                    t += 1
                assert v == vals[y, x]


def test_npasses_table():
    for n in [1, 2, 3, 5, 6, 36, 37, 100, 164]:
        bw = _BitWriter()
        _put_npasses(bw, n)
        assert _get_npasses(_BitReader(bw.flush())) == n


def test_bit_stuffing():
    """A run of 1-bits forces 0xFF bytes; the reader's 7-bit rule and the
    writer's stuffing must agree."""
    bw = _BitWriter()
    for _ in range(64):
        bw.put(1)
    data = bw.flush()
    assert 0xFF in data
    br = _BitReader(data)
    assert all(br.get() == 1 for _ in range(64))


def test_codestream_structure():
    img = np.arange(64 * 48, dtype=np.uint16).reshape(48, 64) % 1000
    code = encode_j2k(img, levels=2)
    assert code[:2] == b"\xff\x4f" and code[-2:] == b"\xff\xd9"
    # SIZ
    assert code[2:4] == b"\xff\x51"
    (lsiz,) = struct.unpack_from(">H", code, 4)
    assert lsiz == 38 + 3 * 1
    _r, w, h = struct.unpack_from(">HII", code, 6)
    assert (w, h) == (64, 48)
    full = encode_jp2(img, levels=2)
    assert full[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    assert b"ftyp" in full[:40] and b"jp2c" in full


@pytest.mark.parametrize("shape,dtype,levels", [
    ((48, 40), np.uint16, 3),
    ((37, 53, 3), np.uint8, 2),
    ((96, 96), np.uint16, 5),
    ((130, 150), np.uint16, 5),   # multi-code-block grids + tag trees
    ((5, 5), np.uint8, 1),
])
def test_lossless_roundtrip(shape, dtype, levels):
    rng = np.random.RandomState(7)
    hi = 256 if dtype == np.uint8 else 5000
    img = rng.randint(0, hi, size=shape).astype(dtype)
    out = decode_jp2(encode_jp2(img, levels=levels))
    want = img if img.ndim == 3 else img[:, :, None]
    assert out.shape == want.shape and out.dtype == want.dtype
    assert (out == want).all()


def test_sentinel2_like_payload():
    """Smooth uint16 reflectance + noise (the S2 L2A band shape): lossless
    and smaller than raw."""
    rng = np.random.RandomState(11)
    base = (2000 + 1500 * np.sin(np.arange(96) / 9.0)[:, None]
            * np.cos(np.arange(96) / 7.0)[None, :]).astype(np.uint16)
    img = (base + rng.randint(0, 200, (96, 96))).astype(np.uint16)
    buf = encode_jp2(img, levels=5)
    assert len(buf) < img.nbytes
    assert (decode_jp2(buf)[:, :, 0] == img).all()


def test_unsupported_paths_raise():
    img = np.zeros((8, 8), dtype=np.uint16)
    code = bytearray(encode_j2k(img, levels=1))
    # flip the transform byte in COD (SPcod last byte) to 9/7
    i = bytes(code).find(b"\xff\x52")
    (ln,) = struct.unpack_from(">H", code, i + 2)
    code[i + 2 + ln - 1] = 0
    with pytest.raises(ValueError, match="irreversible"):
        decode_jp2(bytes(code))
    with pytest.raises(ValueError, match="not a JPEG 2000"):
        decode_jp2(b"\x00" * 20)


def test_codecs_dispatch():
    img = (np.arange(100, dtype=np.uint16).reshape(10, 10) * 3) % 2000
    for payload in (encode_jp2(img, levels=2), encode_j2k(img, levels=2)):
        out = codecs.decode(payload)
        assert out.shape == (10, 10, 1) and (out[:, :, 0] == img).all()


def test_cube_from_jp2_payloads(spark):
    """The cube_decode_suite 'jp2' member, pixel-exact: JP2 payloads decode
    inside the scan; near-warp at 2x coarsening picks pixel (2i+1, 2j+1)."""
    from gdalcubes_cpp_spark.benchqueries import cube_jp2_decode

    rows = cube_jp2_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 2 * 20 * 20
    r = np.arange(40)[:, None]
    c = np.arange(40)[None, :]
    planes = {
        0: ((r * 31 + c * 17 + 0) % 4999).astype(float),
        1: ((r * 31 + c * 17 + 1000) % 4999).astype(float),
    }
    for row in rows:
        want = planes[row["it"]][2 * row["iy"] + 1, 2 * row["ix"] + 1]
        assert row["B1"] == want, (row["it"], row["iy"], row["ix"])


def test_s2_preset_pixels_end_to_end(spark):
    """The Sentinel-2 scenario the MODIS hdf4 query proved for HDF4:
    Sentinel2_L2A preset regex ingest + JP2 payload decode feed
    build_cube — the preset's .jp2 band files now flow PIXELS."""
    from pyspark.sql import functions as F

    from gdalcubes_cpp_spark.operators.build import build_cube
    from gdalcubes_cpp_spark.sources.formats import ingest_listing
    from gdalcubes_cpp_spark.view import CubeView

    stem = ("/data/S2A_MSIL2A_20200510T100031_N0214_R065_T33UVP_0000000001"
            ".SAFE/GRANULE/IMG_DATA/T33UVP_20200510T100031_")
    listing = spark.createDataFrame(
        [(stem + "B02_10m.jp2",), ("/data/junk.txt",)], "path string")
    refs = ingest_listing(listing, "Sentinel2_L2A")
    meta = refs.collect()
    assert len(meta) == 1 and meta[0]["band"] == "B02"

    rng = np.random.RandomState(2)
    plane = rng.randint(0, 10000, (32, 32)).astype(np.uint16)
    images = spark.createDataFrame(
        [(
            meta[0]["image_id"], bytearray(encode_jp2(plane, levels=3)),
            32, 32, "jp2", meta[0]["ts"], 13.0, 13.32, 47.0, 47.32,
        )],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "ts timestamp, left double, right double, bottom double, top double",
    )
    v = CubeView.create(
        left=13.0, right=13.32, bottom=47.0, top=47.32, nx=32, ny=32,
        t0="2020-05-10", t1="2020-05-10", dt="P1D",
        aggregation="mean", resampling="near", chunk_size=(1, 16, 16),
    )
    df = build_cube(images, v, bands=("B02",)).df
    got = {(r["iy"], r["ix"]): r["B02"] for r in df.collect()}
    assert len(got) == 32 * 32
    for (iy, ix), val in got.items():
        assert val == float(plane[iy, ix])


# ---------------------------------------------------------------------------
# Multi-tile codestreams (§B.3 tile grid, Isot-indexed tile-parts)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,tile,levels", [
    ((64, 64), (32, 32), 3),        # exact 2x2 grid
    ((70, 50), (32, 32), 3),        # edge tiles clip
    ((48, 96, 3), (48, 32), 2),     # multi-component, 1x3 grid
    ((96, 96), (96, 96), 4),        # tile == image (degenerate grid)
])
def test_multitile_lossless_roundtrip(shape, tile, levels):
    rng = np.random.RandomState(23)
    img = rng.randint(0, 5000, size=shape).astype(np.uint16)
    out = decode_jp2(encode_jp2(img, levels=levels, tile_size=tile))
    want = img if img.ndim == 3 else img[:, :, None]
    assert out.shape == want.shape and (out == want).all()


def test_multitile_codestream_structure():
    """SIZ advertises the tile grid; one SOT per tile with sequential
    Isot; single-tile output is byte-identical to the pre-tiling encoder
    (tile_size=None == tile_size=(h, w))."""
    img = (np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) * 7) % 3000
    buf = encode_j2k(img, levels=2, tile_size=(32, 32))
    i = buf.find(b"\xff\x51")
    _r, w, h, _xo, _yo, tw, th, _xto, _yto, nc = struct.unpack_from(
        ">HIIIIIIIIH", buf, i + 4)
    assert (w, h, tw, th) == (64, 64, 32, 32)
    isots = []
    pos = 0
    while True:
        j = buf.find(b"\xff\x90", pos)
        if j < 0:
            break
        isots.append(struct.unpack_from(">H", buf, j + 4)[0])
        pos = j + 2
    assert isots == [0, 1, 2, 3]
    assert encode_j2k(img, levels=2) == encode_j2k(img, levels=2,
                                                   tile_size=(64, 64))


def test_multitile_psot_zero_last_tile_part():
    """A last tile-part with Psot=0 (legal per §A.4.2) decodes: the
    segment runs to EOC."""
    img = (np.arange(40 * 40, dtype=np.uint16).reshape(40, 40) * 13) % 2000
    buf = bytearray(encode_j2k(img, levels=2, tile_size=(40, 40)))
    j = buf.find(b"\xff\x90")
    struct.pack_into(">I", buf, j + 6, 0)   # Psot := 0
    out = decode_jp2(bytes(buf))
    assert (out[:, :, 0] == img).all()


def test_multitile_missing_tile_raises():
    """Truncated tile grids fail loudly, not with garbage pixels."""
    img = np.zeros((64, 64), dtype=np.uint8)
    buf = encode_j2k(img, levels=2, tile_size=(32, 32))
    # drop everything from the LAST SOT to EOC, keep EOC
    pos, last = 0, -1
    while True:
        j = buf.find(b"\xff\x90", pos)
        if j < 0:
            break
        last = j
        pos = j + 2
    with pytest.raises(ValueError, match="tile grid"):
        decode_jp2(buf[:last] + buf[-2:])


def test_reduced_resolution_decode():
    """reduce=k drops the k finest resolutions and reconstructs the
    exact 5/3 lowpass pyramid level: decode(reduce=k) equals the LL of
    dwt53_forward at level k (gain-1), dims ceil-halved k times; full
    decode unchanged at reduce=0."""
    from gdalcubes_cpp_spark.sources.jpeg2000 import dwt53_forward

    rng = np.random.RandomState(41)
    img = (2000 + 150 * rng.rand(96, 80)).astype(np.uint16)
    buf = encode_jp2(img, levels=4)
    full = decode_jp2(buf, reduce=0)
    assert (full[:, :, 0] == img).all()
    for k in (1, 2, 3):
        got = decode_jp2(buf, reduce=k)
        ll, _ = dwt53_forward(img.astype(np.int64) - 32768, k)
        want = np.clip(ll + 32768, 0, 65535)
        assert got.shape == (96 >> k, 80 >> k, 1)
        assert (got[:, :, 0] == want).all(), k


def test_reduced_resolution_multitile():
    """Reduction composes with the tile grid (per-tile partial decode,
    reduced offsets): each tile region equals its own lowpass."""
    from gdalcubes_cpp_spark.sources.jpeg2000 import dwt53_forward

    rng = np.random.RandomState(43)
    img = (1000 + 500 * rng.rand(64, 96)).astype(np.uint16)
    buf = encode_jp2(img, levels=3, tile_size=(32, 32))
    got = decode_jp2(buf, reduce=2)
    assert got.shape == (16, 24, 1)
    for ty in range(2):
        for tx in range(3):
            tile = img[32 * ty:32 * (ty + 1), 32 * tx:32 * (tx + 1)]
            ll, _ = dwt53_forward(tile.astype(np.int64) - 32768, 2)
            want = np.clip(ll + 32768, 0, 65535)
            assert (got[8 * ty:8 * (ty + 1), 8 * tx:8 * (tx + 1), 0]
                    == want).all(), (ty, tx)


def test_reduce_clamps_to_levels():
    img = (np.arange(256, dtype=np.uint8)).reshape(16, 16)
    buf = encode_jp2(img, levels=2)
    a = decode_jp2(buf, reduce=2)
    b = decode_jp2(buf, reduce=99)   # clamped to levels
    assert a.shape == b.shape == (4, 4, 1) and (a == b).all()


# ---------------------------------------------------------------------------
# External-encoder tolerance: progression orders, QCC/COC markers, guard bits
# ---------------------------------------------------------------------------

def _set_cod_prog(code: bytes, prog: int) -> bytes:
    b = bytearray(code)
    i = b.find(b"\xff\x52")
    b[i + 5] = prog          # SGcod progression byte (after Scod)
    return bytes(b)


def test_progression_order_tolerance():
    """All five §B.12 progression orders decode for any component count
    (single-precinct streams). With one layer + maximal precincts the
    packet order of LRCP/RLCP/RPCL coincides, so re-tagging the COD
    byte suffices; PCRL/CPRL are comp-major for multi-component, so
    those are encoded natively."""
    rng = np.random.RandomState(53)
    mono = rng.randint(0, 3000, (32, 32)).astype(np.uint16)
    multi = rng.randint(0, 3000, (32, 32, 2)).astype(np.uint16)
    code_m = encode_j2k(multi, levels=2)
    for prog in (1, 2):
        out = decode_jp2(_set_cod_prog(code_m, prog))
        assert (out == multi).all(), prog
    for prog in ("PCRL", "CPRL"):
        out = decode_jp2(encode_j2k(multi, levels=2, prog=prog))
        assert (out == multi).all(), prog
    code_1 = encode_j2k(mono, levels=2)
    for prog in (1, 2, 3, 4):
        assert (decode_jp2(_set_cod_prog(code_1, prog))[:, :, 0] == mono).all()


def test_guard_bits_honored():
    """The decoder derives Mb from the SIGNALED guard bits, not a
    constant: rewriting Sqcd to guard+1 with every exponent-1 keeps
    Mb identical, so the stream still decodes bit-exactly."""
    img = (np.arange(24 * 24, dtype=np.uint16).reshape(24, 24) * 7) % 2500
    code = bytearray(encode_j2k(img, levels=2))
    i = code.find(b"\xff\x5c")
    (ln,) = struct.unpack_from(">H", code, i + 2)
    sqcd = code[i + 4]
    code[i + 4] = ((sqcd >> 5) + 1) << 5 | (sqcd & 0x1F)
    for k in range(i + 5, i + 2 + ln):
        code[k] = ((code[k] >> 3) - 1) << 3
    assert (decode_jp2(bytes(code))[:, :, 0] == img).all()


def test_qcc_per_component_override():
    """A QCC marker overrides the QCD for its component (per-component
    guard/exponents): inject an equivalent-Mb QCC for component 1 —
    decode must honor it and stay bit-exact."""
    rng = np.random.RandomState(59)
    img = rng.randint(0, 2000, (16, 16, 2)).astype(np.uint16)
    code = bytearray(encode_j2k(img, levels=1))
    i = code.find(b"\xff\x5c")
    (ln,) = struct.unpack_from(">H", code, i + 2)
    qcd = bytes(code[i + 4:i + 2 + ln])
    sqcd, spqcd = qcd[0], qcd[1:]
    # component 1: guard+1, exponents-1 -> same Mb per subband
    qcc_body = bytes([1, ((sqcd >> 5) + 1) << 5]) + bytes(
        ((b >> 3) - 1) << 3 for b in spqcd)
    qcc = b"\xff\x5d" + struct.pack(">H", len(qcc_body) + 2) + qcc_body
    code[i + 2 + ln:i + 2 + ln] = qcc     # insert right after QCD
    assert (decode_jp2(bytes(code)) == img).all()
    # a LOSSY (quantized) QCC raises
    bad_body = bytes([1, (qcc_body[1] & 0xE0) | 1]) + qcc_body[2:]
    bad = b"\xff\x5d" + struct.pack(">H", len(bad_body) + 2) + bad_body
    code2 = bytearray(encode_j2k(img, levels=1))
    code2[i + 2 + ln:i + 2 + ln] = bad
    with pytest.raises(ValueError, match="QCC"):
        decode_jp2(bytes(code2))


def test_coc_markers():
    """COC overrides matching the COD pass through; differing levels
    raise (honest partial support, not silent wrong pixels)."""
    img = (np.arange(16 * 16, dtype=np.uint8)).reshape(16, 16)
    code = bytearray(encode_j2k(img, levels=2))
    i = code.find(b"\xff\x52")
    (ln,) = struct.unpack_from(">H", code, i + 2)
    # consistent COC for comp 0: Scoc=0, levels=2, cb=64 exps, no precincts,
    # reversible  (SPcoc mirrors the COD's SPcod)
    spcod = bytes(code[i + 9:i + 2 + ln])   # levels..transform
    coc_body = bytes([0, 0]) + spcod
    coc = b"\xff\x53" + struct.pack(">H", len(coc_body) + 2) + coc_body
    code[i + 2 + ln:i + 2 + ln] = coc
    assert (decode_jp2(bytes(code))[:, :, 0] == img).all()
    bad_body = bytes([0, 0, spcod[0] + 1]) + spcod[1:]
    bad = b"\xff\x53" + struct.pack(">H", len(bad_body) + 2) + bad_body
    code2 = bytearray(encode_j2k(img, levels=2))
    code2[i + 2 + ln:i + 2 + ln] = bad
    with pytest.raises(ValueError, match="COC"):
        decode_jp2(bytes(code2))


# ---------------------------------------------------------------------------
# Irreversible 9/7 path (lossy: float lifting + signaled scalar quantization)
# ---------------------------------------------------------------------------

def _psnr(a, b, peak):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 10 * np.log10(peak ** 2 / mse) if mse else np.inf


def test_dwt97_perfect_reconstruction_and_dc_gain():
    """The 9/7 lifting itself is numerically perfect (error ~1e-12) and
    normalized to DC gain 1 (constant c -> c at every level), matching
    the 5/3's property so reduce=k semantics are transform-agnostic."""
    from gdalcubes_cpp_spark.sources.jpeg2000 import (
        dwt97_forward, dwt97_inverse,
    )

    rng = np.random.RandomState(2)
    for shape in [(64, 64), (37, 53), (5, 5)]:
        x = rng.rand(*shape) * 4000 - 2000
        ll, bands = dwt97_forward(x, 3)
        assert np.abs(dwt97_inverse(ll, bands, shape) - x).max() < 1e-9
    ll, _ = dwt97_forward(np.full((32, 32), 1234.0), 3)
    assert np.allclose(ll, 1234.0)


def test_97_rate_distortion():
    """qstep drives a monotone rate-distortion trade: smaller files as
    qstep grows, max error bounded by a small multiple of qstep, PSNR
    above the codec-grade floor at moderate steps."""
    rng = np.random.RandomState(3)
    base = (2000 + 1500 * np.sin(np.arange(96) / 9.0)[:, None]
            * np.cos(np.arange(96) / 7.0)[None, :]).astype(np.uint16)
    img = (base + rng.randint(0, 200, (96, 96))).astype(np.uint16)
    sizes, errs = [], []
    for q in (1.0, 4.0, 16.0, 64.0):
        buf = encode_jp2(img, levels=4, transform="9/7", qstep=q)
        out = decode_jp2(buf)[:, :, 0]
        sizes.append(len(buf))
        errs.append(np.abs(out.astype(float) - img.astype(float)).max())
        assert errs[-1] <= 4.0 * q
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[-1] < img.nbytes / 5
    out1 = decode_jp2(encode_jp2(img, levels=4, transform="9/7",
                                 qstep=4.0))[:, :, 0]
    assert _psnr(img, out1, 4000) > 55.0


def test_97_codestream_signaling():
    """COD signals transform 0; QCD is style 2 (scalar expounded) with
    guard bits and 16-bit (eps<<11|mu) entries; a 9/7 stream whose QCD
    claims style 0 raises instead of decoding garbage."""
    img = (np.arange(32 * 32, dtype=np.uint16) % 3000).reshape(32, 32)
    code = encode_j2k(img, levels=2, transform="9/7", qstep=2.0)
    i = code.find(b"\xff\x52")
    (ln,) = struct.unpack_from(">H", code, i + 2)
    assert code[i + 2 + ln - 1] == 0          # SPcod transform byte
    j = code.find(b"\xff\x5c")
    (qln,) = struct.unpack_from(">H", code, j + 2)
    sqcd = code[j + 4]
    assert sqcd & 0x1F == 2 and sqcd >> 5 == 2
    assert (qln - 3) % 2 == 0 and (qln - 3) // 2 == 1 + 3 * 2
    bad = bytearray(code)
    bad[j + 4] = (sqcd >> 5) << 5             # claim style 0
    # entries are now misread as style-0 bytes; the transform check fires
    with pytest.raises(ValueError, match="irreversible"):
        decode_jp2(bytes(bad[:j + 4 + 1 + (qln - 3)] + code[j + 2 + qln:]))


def test_97_multitile_reduce_and_multicomponent():
    """The lossy path composes with the tile grid, reduce=k, and
    multiple components."""
    rng = np.random.RandomState(5)
    img = (3000 + 800 * np.sin(np.arange(64) / 4.0)[:, None, None]
           * np.cos(np.arange(96) / 5.0)[None, :, None]
           + rng.randint(0, 60, (64, 96, 2))).astype(np.uint16)
    buf = encode_jp2(img, levels=3, transform="9/7", qstep=4.0,
                     tile_size=(32, 32))
    out = decode_jp2(buf)
    assert out.shape == img.shape
    assert _psnr(img, out, 4000) > 50.0
    r1 = decode_jp2(buf, reduce=1)
    assert r1.shape == (32, 48, 2)
    # reduced output differs from a near-lossless 9/7 reduce only by the
    # quantization error (same transform, same pyramid level)
    ref = decode_jp2(encode_jp2(img, levels=3, transform="9/7", qstep=1.0,
                                tile_size=(32, 32)), reduce=1)
    assert np.abs(r1.astype(float) - ref.astype(float)).mean() < 4.0
    # and it stays a faithful coarse image of the scene (DC-gain-1):
    # the 2x2 box mean agrees to well under the signal amplitude
    box = img.astype(float).reshape(32, 2, 48, 2, 2).mean(axis=(1, 3))
    assert np.abs(ref.astype(float) - box).mean() < 100.0


def test_53_stream_bytes_unchanged_by_97_support():
    """The reversible path is byte-identical to the pre-9/7 encoder
    (default transform/qstep leave every 5/3 stream untouched)."""
    img = (np.arange(40 * 40, dtype=np.uint16) * 11 % 2000).reshape(40, 40)
    assert encode_j2k(img, levels=3) == encode_j2k(img, levels=3,
                                                   transform="5/3", qstep=9.9)


def test_semantics_changing_markers_refused():
    """Markers that silently change packet semantics (POC/PPM/PPT
    segments, precincts) raise cleanly instead of decoding garbage;
    SOP claimed in Scod but absent from the stream is legal (SOP is
    optional per packet) and decodes."""
    img = np.zeros((16, 16), dtype=np.uint8)
    code = encode_j2k(img, levels=1)
    i = code.find(b"\xff\x52")
    b = bytearray(code)
    b[i + 4] |= 0x02                     # Scod: SOP markers claimed
    assert (decode_jp2(bytes(b))[:, :, 0] == img).all()
    b = bytearray(code)
    b[i + 4] |= 0x01                     # Scod: precinct partition
    with pytest.raises(ValueError, match="precinct"):
        decode_jp2(bytes(b))
    # inject a POC segment after COD
    (ln,) = struct.unpack_from(">H", code, i + 2)
    poc = b"\xff\x5f" + struct.pack(">H", 9) + b"\x00" * 7
    with pytest.raises(ValueError, match="POC"):
        decode_jp2(code[:i + 2 + ln] + poc + code[i + 2 + ln:])


# ---------------------------------------------------------------------------
# Quality layers (B.10 multi-layer packets) — late-r4
# ---------------------------------------------------------------------------

def test_multilayer_roundtrip_bitexact():
    """5/3 multi-layer streams decode bit-exactly: layer segments are
    slices of one Tier-1 codeword, concatenated back before decode.
    Staggered first inclusion exercises tag-tree thresholds > 1."""
    rng = np.random.RandomState(60)
    cases = [
        (rng.randint(0, 256, (40, 33)).astype(np.uint8), None),
        (rng.randint(0, 4000, (37, 41, 3)).astype(np.uint16), None),
        (rng.randint(0, 256, (70, 65, 2)).astype(np.uint8), (32, 32)),
    ]
    for img, ts in cases:
        for nl in (2, 3, 7):
            out = decode_jp2(encode_jp2(img, levels=3, tile_size=ts,
                                        nlayers=nl))
            want = img if img.ndim == 3 else img[:, :, None]
            assert (out == want).all(), (img.shape, ts, nl)


def test_multilayer_all_progressions():
    """nlayers=3 x nc=2 under each of the five progression orders:
    packet interleaving differs per order, decode walks must match."""
    rng = np.random.RandomState(61)
    img = rng.randint(0, 3000, (48, 35, 2)).astype(np.uint16)
    for prog in ("LRCP", "RLCP", "RPCL", "PCRL", "CPRL"):
        out = decode_jp2(encode_j2k(img, levels=2, nlayers=3, prog=prog))
        assert (out == img).all(), prog


def test_sop_eph_roundtrip():
    """SOP/EPH resilience markers (Scod bits 1/2) survive a multi-layer,
    multi-tile roundtrip; the markers actually appear in the stream."""
    rng = np.random.RandomState(62)
    img = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    code = encode_j2k(img, levels=2, tile_size=(24, 24), nlayers=2,
                      sop=True, eph=True)
    assert code.count(b"\xff\x91") >= 4 and code.count(b"\xff\x92") >= 4
    assert (decode_jp2(code)[:, :, 0] == img).all()
    # and each flag alone
    for kw in (dict(sop=True), dict(eph=True)):
        c = encode_j2k(img, levels=2, nlayers=3, **kw)
        assert (decode_jp2(c)[:, :, 0] == img).all(), kw


def test_layer_truncation_quality_path():
    """decode_jp2(layers=k): RMSE is non-increasing in k and the full
    layer count reproduces the exact image (truncation points carry the
    5-byte MQ look-ahead margin, so kept passes decode exactly)."""
    rng = np.random.RandomState(63)
    base = np.add.outer(np.arange(48) * 3, np.arange(48) * 2)
    img = (base + rng.randint(0, 64, (48, 48))).astype(np.uint16)
    nl = 5
    code = encode_jp2(img, levels=3, nlayers=nl)
    prev = None
    for k in range(1, nl + 1):
        out = decode_jp2(code, layers=k)[:, :, 0].astype(np.float64)
        rmse = float(np.sqrt(np.mean((out - img) ** 2)))
        if prev is not None:
            assert rmse <= prev + 1e-9, (k, rmse, prev)
        prev = rmse
    assert prev == 0.0
    assert (decode_jp2(code, layers=nl) == decode_jp2(code)).all()


def test_multilayer_empty_packets():
    """A near-constant image has single-pass code-blocks: with many
    layers most layers contribute nothing and must round-trip through
    the empty-packet path (leading 0 bit)."""
    img = np.full((32, 32), 7, dtype=np.uint8)
    img[0, 0] = 9
    out = decode_jp2(encode_jp2(img, levels=2, nlayers=8))
    assert (out[:, :, 0] == img).all()


def test_multilayer_97_matches_single_layer():
    """The 9/7 path quantizes before Tier-1, so the multi-layer stream
    carries the same codewords as the single-layer one — full decodes
    must agree exactly."""
    rng = np.random.RandomState(64)
    img = rng.randint(0, 256, (40, 44)).astype(np.uint8)
    a = decode_jp2(encode_j2k(img, levels=2, transform="9/7", qstep=0.5))
    b = decode_jp2(encode_j2k(img, levels=2, transform="9/7", qstep=0.5,
                              nlayers=4))
    assert (a == b).all()


def test_multilayer_reduce_compose():
    """reduce=k (drop finest resolutions) composes with multi-layer
    streams: dropped-resolution packet headers are parsed to walk the
    stream, their codewords never entropy-decode."""
    rng = np.random.RandomState(65)
    img = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    code = encode_jp2(img, levels=3, nlayers=3)
    full = decode_jp2(code)
    red = decode_jp2(code, reduce=1)
    assert red.shape == (32, 32, 1)
    ref = decode_jp2(encode_jp2(img, levels=3), reduce=1)
    assert (red == ref).all()
    assert (full[:, :, 0] == img).all()
