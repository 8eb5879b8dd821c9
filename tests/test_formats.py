"""collection_format ingest (sources/formats.py) — the analog of the
reference's regex-driven path scan (src/collection_format.h:36-74,
src/image_collection.cpp:155-430), over both translated presets and a raw
reference-schema dict."""

import pandas as pd
import pytest

from gdalcubes_cpp_spark.sources.formats import (
    PRESETS,
    images_table,
    ingest_listing,
    load_format,
)


def test_sentinel2_listing(spark):
    paths = [
        # two bands of one image + one band of another + junk
        "/d/S2A_MSIL2A_20200117T103029_N0214_R065_T33UVP_X1.SAFE/GRANULE/IMG_DATA/T33UVP_20200117T103029_B02_10m.jp2",
        "/d/S2A_MSIL2A_20200117T103029_N0214_R065_T33UVP_X1.SAFE/GRANULE/IMG_DATA/T33UVP_20200117T103029_B08_10m.jp2",
        "/d/S2A_MSIL2A_20200304T101021_N0214_R022_T32TNS_X2.SAFE/GRANULE/IMG_DATA/T32TNS_20200304T101021_SCL_20m.jp2",
        "/d/S2A_MSIL2A_20200304T101021_N0214_R022_T32TNS_X2.SAFE/GRANULE/IMG_DATA/T32TNS_20200304T101021_B99_10m.jp2",  # unknown band
        "/d/readme.txt",  # global pattern miss
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "Sentinel2_L2A").orderBy("path").toPandas()
    assert len(out) == 3
    assert set(out["band"]) == {"B02", "B08", "SCL"}
    a = out[out["band"] == "B02"].iloc[0]
    assert a["image_id"] == "S2A_MSIL2A_20200117T103029_N0214_R065_T33UVP_X1"
    assert a["ts"] == pd.Timestamp("2020-01-17 10:30:29")
    assert a["nodata"] == 0.0 and a["scale"] == 0.0001
    scl = out[out["band"] == "SCL"].iloc[0]
    assert pd.isna(scl["nodata"]) and scl["scale"] == 1.0

    img = images_table(ingest_listing(df, "Sentinel2_L2A")).orderBy("image_id").toPandas()
    assert len(img) == 2
    assert img.iloc[0]["n_bands"] == 2
    assert set(img.iloc[0]["band_paths"].keys()) == {"B02", "B08"}


def test_l8_listing(spark):
    base = "LC08_L1TP_194026_20200613_20200626_01_T1"
    paths = [
        f"/l8/{base}_sr_band4.tif",
        f"/l8/{base}_pixel_qa.tif",
        f"/l8/{base}_thumb.jpeg",
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "L8_SR").orderBy("path").toPandas()
    assert len(out) == 2
    b4 = out[out["band"] == "B04"].iloc[0]
    assert b4["image_id"].startswith("LC08_L1TP_194026_20200613")
    assert b4["ts"] == pd.Timestamp("2020-06-13")
    assert b4["nodata"] == -9999.0


def test_load_format_from_reference_schema_dict(spark):
    """A dict in the reference's formats/*.json schema loads directly."""
    spec = {
        "description": "toy",
        "pattern": r".+\.png",
        "images": {"pattern": r".*/(img_\d+)_.*"},
        "datetime": {"pattern": r".*_(\d{8})\.png", "format": "%Y%m%d"},
        "bands": {"RED": {"pattern": r".+_red_.*", "nodata": 0}},
    }
    fmt = load_format(spec)
    df = spark.createDataFrame(
        pd.DataFrame({"path": ["/x/img_001_red_20210101.png", "/x/img_001_blue_20210101.png"]})
    )
    out = ingest_listing(df, fmt).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["image_id"] == "img_001"
    assert out.iloc[0]["ts"] == pd.Timestamp("2021-01-01")


def test_unknown_preset():
    with pytest.raises(ValueError):
        load_format("NotAFormat")
    assert set(PRESETS) == {"Sentinel2_L2A", "L8_SR"}
