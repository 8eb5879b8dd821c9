"""Codec roundtrips, PSNR gate, synthetic-table determinism (input_hint)."""

import numpy as np

from gdalcubes_cpp_spark import codecs, synth


def test_png_roundtrip_channels():
    for c in (1, 2, 3, 4):
        img = (np.arange(24 * 16 * c).reshape(24, 16, c) * 7 % 256).astype(np.uint8)
        out = codecs.decode_png(codecs.encode_png(img))
        assert np.array_equal(out, img)


def test_png_gray2d():
    img = (np.arange(8 * 8).reshape(8, 8) % 256).astype(np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img))[:, :, 0], img)


def test_lossy_psnr_gate():
    img = synth.make_pixels(987654321, 96, 96)
    dec = codecs.decode(codecs.encode_lossy(img))
    assert codecs.psnr(img, dec) >= 40.0  # BASELINE.json input_hint gate
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_synth_determinism():
    a = synth.images_pdf(20)
    b = synth.images_pdf(20)
    assert a.drop(columns=["bytes"]).equals(b.drop(columns=["bytes"]))
    assert (a["bytes"] == b["bytes"]).all()


def test_synth_schema_and_caption():
    pdf = synth.images_pdf(5)
    assert list(pdf.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "left", "right", "bottom", "top", "ts", "srs",
    ]
    r = pdf.iloc[3]
    assert r["caption"] == f"synthetic scene {r['image_id']} at {r['left']:.3f},{r['top']:.3f}"
    assert r["w"] in (32, 64, 96) and r["h"] in (32, 64, 96)
    # phash reproducible from decoded bytes
    img = codecs.decode(r["bytes"], r["fmt"])
    if r["fmt"] == "png":
        assert synth.phash64(img) == r["phash"]


def test_synth_skew():
    m = synth.meta_arrays(np.arange(5000))
    lon = (m["left"] + m["right"]) / 2
    hot = sum(
        ((np.abs(lon - hx) < 1.0) & (np.abs((m["bottom"] + m["top"]) / 2 - hy) < 1.0)).sum()
        for hx, hy in synth.HOTSPOTS
    )
    assert hot / 5000 > 0.5  # hot cells exist -> skew handling is exercised


def test_spark_generator_matches_pandas(spark):
    sdf = synth.images_df(spark, 50).toPandas().sort_values("image_id").reset_index(drop=True)
    pdf = synth.images_pdf(50).sort_values("image_id").reset_index(drop=True)
    assert (sdf["image_id"] == pdf["image_id"]).all()
    assert (sdf["caption"] == pdf["caption"]).all()  # caption byte-equality gate
    assert (sdf["phash"] == pdf["phash"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(sdf["bytes"], pdf["bytes"]))


def test_encode_lossy_jp2_real_codec():
    """The real lossy path (9/7 JP2) through the generic decode dispatch:
    PSNR above the same 40 dB gate as the stub, smaller than raw, and
    rate falls as qstep grows."""
    import numpy as np

    from gdalcubes_cpp_spark import codecs

    rng = np.random.RandomState(8)
    base = (120 + 80 * np.sin(np.arange(64) / 6.0)[:, None]
            * np.cos(np.arange(64) / 5.0)[None, :])[:, :, None]
    img = np.clip(base + rng.randint(0, 20, (64, 64, 3)), 0, 255).astype(np.uint8)
    b1 = codecs.encode_lossy_jp2(img, qstep=2.0)
    b2 = codecs.encode_lossy_jp2(img, qstep=8.0)
    out = codecs.decode(b1)
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0
    assert len(b2) < len(b1) < img.nbytes
