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
    assert {"Sentinel2_L2A", "L8_SR"} <= set(PRESETS)


def test_mxd13a2_listing(spark):
    """MODIS MxD13A2 (formats/MxD13A2.json): HDF4 subdataset paths, %Y%j
    day-of-year stamps, Terra (MOD) and Aqua (MYD) both match."""
    paths = [
        'HDF4_EOS:EOS_GRID:"/m/MOD13A2.A2020017.h18v04.006.2020037211235.hdf":MODIS_Grid_16DAY_1km_VI:"1 km 16 days NDVI"',
        'HDF4_EOS:EOS_GRID:"/m/MOD13A2.A2020017.h18v04.006.2020037211235.hdf":MODIS_Grid_16DAY_1km_VI:"1 km 16 days EVI"',
        'HDF4_EOS:EOS_GRID:"/m/MYD13A2.A2020209.h18v04.006.2020226031228.hdf":MODIS_Grid_16DAY_1km_VI:"1 km 16 days red reflectance"',
        'HDF4_EOS:EOS_GRID:"/m/MYD13A2.A2020209.h18v04.006.2020226031228.hdf":MODIS_Grid_16DAY_1km_VI:"1 km 16 days unknown thing"',
        "/m/readme.txt",
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "MxD13A2").orderBy("path").toPandas()
    assert len(out) == 3
    ndvi = out[out["band"] == "NDVI"].iloc[0]
    assert ndvi["image_id"] == "/m/MOD13A2.A2020017.h18v04.006.2020037211235"
    assert ndvi["ts"] == pd.Timestamp("2020-01-17")  # day 017 of 2020
    assert ndvi["nodata"] == -3000.0
    red = out[out["band"] == "RED"].iloc[0]
    assert red["ts"] == pd.Timestamp("2020-07-27")  # day 209 of 2020


def test_mxd11a2_listing(spark):
    paths = [
        'HDF4_EOS:EOS_GRID:"/m/MOD11A2.A2019185.h17v03.006.2019194223721.hdf":MODIS_Grid_8Day_1km_LST:LST_Day_1km',
        'HDF4_EOS:EOS_GRID:"/m/MOD11A2.A2019185.h17v03.006.2019194223721.hdf":MODIS_Grid_8Day_1km_LST:QC_Day',
        'HDF4_EOS:EOS_GRID:"/m/MOD11A2.A2019185.h17v03.006.2019194223721.hdf":MODIS_Grid_8Day_1km_LST:Emis_31',
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "MxD11A2").orderBy("band").toPandas()
    assert list(out["band"]) == ["EMIS_31", "LST_DAY", "QC_DAY"]
    assert (out["ts"] == pd.Timestamp("2019-07-04")).all()  # day 185 of 2019
    qc = out[out["band"] == "QC_DAY"].iloc[0]
    assert pd.isna(qc["nodata"])  # QC band declares no nodata


def test_sentinel1_listing(spark):
    base = "/s1/S1A_IW_GRDH_1SDV_20200229T053107_20200229T053132_031456_039F11_D30A.SAFE"
    paths = [
        f"{base}/measurement/s1a-iw-grd-vh-20200229t053107-20200229t053132-031456-039f11-002.tiff",
        f"{base}/measurement/s1a-iw-grd-vv-20200229t053107-20200229t053132-031456-039f11-001.tiff",
        f"{base}/annotation/s1a-iw-grd-vv-20200229t053107.xml",  # not /measurement/*.tiff
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "Sentinel1_IW_GRD").orderBy("band").toPandas()
    assert list(out["band"]) == ["VH", "VV"]
    assert (out["image_id"] == base.split("/")[-1][:-5]).all()
    assert (out["ts"] == pd.Timestamp("2020-02-29 05:31:07")).all()
    assert (out["nodata"] == 0.0).all()


def test_chirps_listing(spark):
    paths = [
        "/c/chirps-v2.0.2019.07.14.tif.gz",
        "/c/chirps-v2.0.2020.02.29.tif",
        "/c/other-product.2020.02.29.tif",  # global pattern miss
    ]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "CHIRPS_v2_0_daily_p05_tif").orderBy("path").toPandas()
    assert len(out) == 2
    assert (out["band"] == "precipitation").all()
    assert sorted(out["ts"]) == [
        pd.Timestamp("2019-07-14"), pd.Timestamp("2020-02-29"),
    ]
    assert (out["nodata"] == -9999.0).all()
    assert out[out["path"].str.endswith(".gz")].iloc[0]["image_id"] == "chirps-v2.0.2019.07.14"


def test_all_presets_loadable():
    assert set(PRESETS) >= {
        "Sentinel2_L2A", "L8_SR", "MxD13A2", "MxD11A2",
        "Sentinel1_IW_GRD", "CHIRPS_v2_0_daily_p05_tif",
    }
    for name in PRESETS:
        f = load_format(name)
        assert f.bands and f.pattern and f.datetime_format


def test_l8_l1tp_listing(spark):
    d = "/l8/LC08_L1TP_194026_20200613_20200626_01_T1"
    paths = [f"{d}/LC08_L1TP_194026_20200613_20200626_01_T1_B1.TIF",
             f"{d}/LC08_L1TP_194026_20200613_20200626_01_T1_B10.TIF",
             f"{d}/LC08_L1TP_194026_20200613_20200626_01_T1_BQA.TIF"]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "L8_L1TP").orderBy("band").toPandas()
    assert list(out["band"]) == ["B01", "B10", "BQA"]
    # image id = the scene DIRECTORY name (reference image pattern)
    assert (out["image_id"] == "LC08_L1TP_194026_20200613_20200626_01_T1").all()
    assert (out["ts"] == pd.Timestamp("2020-06-13")).all()


def test_planetscope_multiband_file(spark):
    """One analytic file carries red/green/blue/nir by band INDEX: the
    ingest emits one row per band with band_idx (reference band_num)."""
    paths = ["/p/20200612_093456_1034_3B_AnalyticMS_SR.tif",
             "/p/20200612_093456_1034_3B_AnalyticMS_DN_udm.tif"]
    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    out = ingest_listing(df, "PlanetScope_3B_AnalyticMS_SR").toPandas()
    sr = out[out["path"].str.endswith("SR.tif")].sort_values("band")
    assert list(sr["band"]) == ["blue", "green", "nir", "red"]
    assert list(sr["band_idx"]) == [1, 2, 4, 3]
    assert (sr["nodata"] == 0.0).all()
    udm = out[out["band"] == "udm"]
    assert len(udm) == 1 and udm.iloc[0]["band_idx"] == 1
    assert (out["ts"] == pd.Timestamp("2020-06-12")).all()
    assert (out["image_id"] == "20200612_093456_1034_3B").all()


def test_chirps_monthly_and_s2_aws_and_theia(spark):
    m = ingest_listing(
        spark.createDataFrame(pd.DataFrame({"path": ["/c/chirps-v2.0.2019.07.tif.gz"]})),
        "CHIRPS_v2_0_monthly_p05_tif",
    ).toPandas()
    assert m.iloc[0]["ts"] == pd.Timestamp("2019-07-01")
    aws = ingest_listing(
        spark.createDataFrame(pd.DataFrame({"path": [
            "/vsis3/sentinel-s2-l1c/tiles/1/C/CV/2016/1/10/0/B03.jp2"]})),
        "Sentinel2_L1C_AWS",
    ).toPandas()
    assert aws.iloc[0]["ts"] == pd.Timestamp("2016-01-10")
    assert aws.iloc[0]["band"] == "B03"
    assert aws.iloc[0]["image_id"] == "/1/C/CV/2016/1/10/0"
    th = ingest_listing(
        spark.createDataFrame(pd.DataFrame({"path": [
            "/t/SENTINEL2A_20200612-105312-086_L2A_T31TCJ_C_V2-2/SENTINEL2A_20200612-105312-086_L2A_T31TCJ_C_V2-2_FRE_B4.tif"]})),
        "Sentinel2_L2A_THEIA",
    ).toPandas()
    assert th.iloc[0]["band"] == "B4"
    assert th.iloc[0]["ts"] == pd.Timestamp("2020-06-12 10:53:12")
    assert th.iloc[0]["nodata"] == -10000.0


def test_all_reference_presets_translated():
    """Every preset in the reference's formats/ directory is translated."""
    want = {
        "Sentinel2_L2A", "Sentinel2_L1C", "Sentinel2_L1C_AWS",
        "Sentinel2_L2A_THEIA", "Sentinel1_IW_GRD", "L8_SR", "L8_L1TP",
        "MxD13A2", "MxD13A3", "MxD13Q1", "MxD11A1", "MxD11A2", "MxD10A2",
        "MxD14A2", "MCD64A1", "CHIRPS_v2_0_daily_p05_tif",
        "CHIRPS_v2_0_monthly_p05_tif", "PlanetScope_3B_AnalyticMS_SR",
    }
    assert want <= set(PRESETS)


def test_footprints_from_hdfeos(spark):
    """Collection footprints backfilled from granule bytes executor-side
    (the reference's GDAL-open loop as one mapInPandas pass): each
    granule's StructMetadata.0 yields its own sinusoidal footprint."""
    import numpy as np

    from gdalcubes_cpp_spark.sources.formats import footprints_from_hdfeos
    from gdalcubes_cpp_spark.sources.hdf4 import hdf4_sds_bytes

    def sm(ulx, uly):
        return f"""GROUP=GridStructure
GROUP=GRID_1
GridName="G"
XDim=1200
YDim=1200
UpperLeftPointMtrs=({ulx:.6f},{uly:.6f})
LowerRightMtrs=({ulx + 1111950.519667:.6f},{uly - 1111950.519667:.6f})
Projection=GCTP_SNSOID
ProjParams=(6371007.181000,0,0,0,0,0,0,0,0,0,0,0,0)
END_GROUP=GRID_1
END_GROUP=GridStructure
END
"""
    tiles = {"h17v04": (-1111950.519667, 5559752.598333),
             "h18v04": (0.0, 5559752.598333)}
    rows = [
        (tid, bytearray(hdf4_sds_bytes(
            np.zeros((4, 4), dtype=np.int16), names=["NDVI"],
            global_attrs={"StructMetadata.0": sm(*ul)})))
        for tid, ul in tiles.items()
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in
           footprints_from_hdfeos(df).collect()}
    assert set(got) == set(tiles)
    for tid, (ulx, uly) in tiles.items():
        r = got[tid]
        assert r["left"] == ulx and r["top"] == uly
        assert abs(r["right"] - (ulx + 1111950.519667)) < 1e-6
        assert r["srs"].startswith("SINU:6371007.181")
        assert (r["nx"], r["ny"]) == (1200, 1200)
