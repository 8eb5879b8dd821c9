"""collection_format ingest: from a file-listing DataFrame to the image
collection tables — the analog of the reference's collection_format +
image_collection::add_with_collection_format (src/collection_format.h:36-74,
src/image_collection.cpp:155-430), which scans file paths with regex
patterns from a JSON preset (formats/*.json) and fills the images/gdalrefs/
bands SQLite tables.

Spark-first shape: the listing is a DataFrame of paths (at 10^12 scale, an
object-store inventory table); every extraction is a native regexp_extract /
rlike / to_timestamp column — whole-stage codegen, no UDF, one scan.

Presets below translate the reference's published format semantics (pattern
sources cited per preset); they are data, not code — the reference's JSON
schema is mirrored so any of its other presets drop in the same way.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class CollectionFormat:
    """One image-collection format (src/collection_format.h:36-74)."""

    name: str
    pattern: str                 # global file filter
    image_pattern: str           # capture group 1 = image id
    datetime_pattern: str        # capture group 1 = datetime string
    datetime_format: str         # Java SimpleDateFormat (Spark to_timestamp)
    bands: dict = field(default_factory=dict)  # band -> {pattern, nodata?, scale?}


# strptime-style formats in the reference JSON -> Spark to_timestamp patterns
_STRPTIME_TO_JAVA = {
    "%Y%m%dT%H%M%S": "yyyyMMdd'T'HHmmss",
    "%Y%m%d": "yyyyMMdd",
    "%Y-%m-%d": "yyyy-MM-dd",
    "%Y%j": "yyyyDDD",          # MODIS day-of-year stamps
    "%Y.%m.%d": "yyyy.MM.dd",   # CHIRPS daily naming
    "%Y.%m": "yyyy.MM",         # CHIRPS monthly naming
    "/%Y/%m/%d": "'/'yyyy'/'M'/'d",  # S2 AWS key layout (non-padded m/d)
    "%Y%m%d-%H%M%S": "yyyyMMdd-HHmmss",  # THEIA naming
}


# Translated from the reference's formats/Sentinel2_L2A.json (patterns for
# Copernicus Open Access Hub SAFE archives) — subset of bands; the full set
# drops in identically.
SENTINEL2_L2A = CollectionFormat(
    name="Sentinel2_L2A",
    pattern=r".+/IMG_DATA/.+\.jp2",
    image_pattern=r".*/(.+)\.SAFE.*",
    datetime_pattern=r".*MSIL2A_(.+?)_.*",
    datetime_format="yyyyMMdd'T'HHmmss",
    bands={
        "B01": {"pattern": r".+_B01_60m\.jp2", "nodata": 0.0, "scale": 0.0001},
        "B02": {"pattern": r".+_B02_10m\.jp2", "nodata": 0.0, "scale": 0.0001},
        "B03": {"pattern": r".+_B03_10m\.jp2", "nodata": 0.0, "scale": 0.0001},
        "B04": {"pattern": r".+_B04_10m\.jp2", "nodata": 0.0, "scale": 0.0001},
        "B08": {"pattern": r".+_B08_10m\.jp2", "nodata": 0.0, "scale": 0.0001},
        "SCL": {"pattern": r".+_SCL_20m\.jp2"},
    },
)

# Translated from the reference's formats/L8_SR.json (Landsat 8 surface
# reflectance naming).
L8_SR = CollectionFormat(
    name="L8_SR",
    pattern=r".+\.tif",
    image_pattern=r".*(L[OTC]08_.{4}_.{6}_.{8}_.{8}_.{2}_.{2})[A-Za-z0-9_]+\.tif",
    datetime_pattern=r".*L[OTC]08_.{4}_.{6}_(.{8})_.*\.tif",
    datetime_format="yyyyMMdd",
    bands={
        "B02": {"pattern": r".+sr_band2\.tif", "nodata": -9999.0},
        "B03": {"pattern": r".+sr_band3\.tif", "nodata": -9999.0},
        "B04": {"pattern": r".+sr_band4\.tif", "nodata": -9999.0},
        "B05": {"pattern": r".+sr_band5\.tif", "nodata": -9999.0},
        "PIXEL_QA": {"pattern": r".+_pixel_qa\.tif"},
    },
)

# Translated from the reference's formats/MxD13A2.json (MODIS Terra/Aqua
# 16-day vegetation indices; HDF4 subdataset paths, day-of-year stamps).
MXD13A2 = CollectionFormat(
    name="MxD13A2",
    pattern=r".*\.hdf.*",
    image_pattern=r"HDF4_EOS:EOS_GRID:\"(.+)\.hdf.*",
    datetime_pattern=r".*M[OY]D13A2\.A(.{7})[^/]*",
    datetime_format="yyyyDDD",
    bands={
        "NDVI": {"pattern": r".+NDVI.*", "nodata": -3000.0},
        "EVI": {"pattern": r".+EVI.*", "nodata": -3000.0},
        "VIQ": {"pattern": r".+Quality.*", "nodata": -3000.0},
        "RED": {"pattern": r".+red reflectance.*", "nodata": -3000.0},
        "NIR": {"pattern": r".+NIR reflectance.*", "nodata": -3000.0},
    },
)

# Translated from the reference's formats/MxD11A2.json (MODIS 8-day land
# surface temperature).
MXD11A2 = CollectionFormat(
    name="MxD11A2",
    pattern=r".*\.hdf.*",
    image_pattern=r"HDF4_EOS:EOS_GRID:\"(.+)\.hdf.*",
    datetime_pattern=r".*M[OY]D11A2\.A(.{7}).*",
    datetime_format="yyyyDDD",
    bands={
        "LST_DAY": {"pattern": r".+LST_Day_1km.*", "nodata": 0.0},
        "LST_NIGHT": {"pattern": r".+LST_Night_1km.*", "nodata": 0.0},
        "QC_DAY": {"pattern": r".+QC_Day.*"},
        "EMIS_31": {"pattern": r".+Emis_31.*", "nodata": 0.0},
    },
)

# Translated from the reference's formats/Sentinel1_IW_GRD.json (Copernicus
# SAFE archives, dual-pol SAR backscatter).
SENTINEL1_IW_GRD = CollectionFormat(
    name="Sentinel1_IW_GRD",
    pattern=r".+/measurement/.+\.tiff",
    image_pattern=r".*/(.+)\.SAFE.*",
    datetime_pattern=r".*/S1A_IW_GRDH_1SDV_(.{15})_.*\.SAFE.*",
    datetime_format="yyyyMMdd'T'HHmmss",
    bands={
        "VH": {"pattern": r".+s1a-iw-grd-vh.*\.tiff", "nodata": 0.0},
        "VV": {"pattern": r".+s1a-iw-grd-vv.*\.tiff", "nodata": 0.0},
    },
)

# Translated from the reference's formats/CHIRPS_v2_0_daily_p05_tif.json
# (daily global precipitation GeoTIFFs, optionally gzipped).
CHIRPS_V2_0_DAILY = CollectionFormat(
    name="CHIRPS_v2_0_daily_p05_tif",
    pattern=r".*chirps.+\.tif.*",
    image_pattern=r".*/(.+)\.tif.*",
    datetime_pattern=r".*chirps-v2\.0\.(.{10})\.tif.*",
    datetime_format="yyyy.MM.dd",
    bands={
        "precipitation": {"pattern": r".+", "nodata": -9999.0},
    },
)

# Remaining reference presets, translated verbatim as data (formats/*.json).
# MODIS family: all share the HDF4 subdataset path shape + %Y%j stamps.
def _modis(name: str, dt_tag: str, bands: dict) -> CollectionFormat:
    return CollectionFormat(
        name=name,
        pattern=r".*\.hdf.*",
        image_pattern=r"HDF4_EOS:EOS_GRID:\"(.+)\.hdf.*",
        datetime_pattern=rf".*{dt_tag}\.A(.{{7}})[^/]*",
        datetime_format="yyyyDDD",
        bands=bands,
    )


MXD11A1 = _modis("MxD11A1", "M[OY]D11A1", {
    "LST_DAY": {"pattern": r".+LST_Day_1km.*", "nodata": 0.0},
    "LST_NIGHT": {"pattern": r".+LST_Night_1km.*", "nodata": 0.0},
    "QC_DAY": {"pattern": r".+QC_Day.*"},
    "QC_NIGHT": {"pattern": r".+QC_Night.*"},
    "DAY_VIEW_TIME": {"pattern": r".+Day_view_time.*", "nodata": 255.0},
    "NIGHT_VIEW_TIME": {"pattern": r".+Night_view_time.*", "nodata": 255.0},
})

MXD13A3 = _modis("MxD13A3", "M[OY]D13A3", {
    "NDVI": {"pattern": r".+NDVI.*", "nodata": -3000.0},
    "EVI": {"pattern": r".+EVI.*", "nodata": -3000.0},
    "VIQ": {"pattern": r".+Quality.*", "nodata": -3000.0},
    "RED": {"pattern": r".+red reflectance.*", "nodata": -3000.0},
    "NIR": {"pattern": r".+NIR reflectance.*", "nodata": -3000.0},
    "BLUE": {"pattern": r".+blue reflectance.*", "nodata": -3000.0},
    "MIR": {"pattern": r".+MIR reflectance.*", "nodata": -3000.0},
})

MXD13Q1 = _modis("MxD13Q1", "M[OY]D13Q1", {
    "NDVI": {"pattern": r".+NDVI.*", "nodata": -3000.0, "scale": 0.0001},
    "EVI": {"pattern": r".+EVI.*", "nodata": -3000.0, "scale": 0.0001},
    "VI_Quality": {"pattern": r".+Quality.*", "nodata": 65535.0},
    "red": {"pattern": r".+red reflectance.*", "nodata": -1000.0, "scale": 0.0001},
    "NIR": {"pattern": r".+NIR reflectance.*", "nodata": -1000.0, "scale": 0.0001},
    "blue": {"pattern": r".+blue reflectance.*", "nodata": -1000.0, "scale": 0.0001},
    "MIR": {"pattern": r".+MIR reflectance.*", "nodata": -1000.0, "scale": 0.0001},
    "pixel_reliability": {"pattern": r".+pixel reliability.*"},
})

MXD10A2 = _modis("MxD10A2", "M[OY]D10A2", {
    "Eight_Day_Snow_Cover": {"pattern": r".+Eight_Day_Snow_Cover.*", "nodata": 0.0},
    "Maximum_Snow_Extent": {"pattern": r".+Maximum_Snow_Extent.*", "nodata": 255.0},
})

MXD14A2 = _modis("MxD14A2", "M[OY]D14A2", {
    "FireMask": {"pattern": r".+FireMask.*", "nodata": 0.0},
    "QA": {"pattern": r".+QA.*"},
})

MCD64A1 = _modis("MCD64A1", "MCD64A1", {
    "BurnDate": {"pattern": r".+Burn Date.*", "nodata": -1.0},
    "BurnDateUncertainty": {"pattern": r".+Burn Date Uncertainty.*", "nodata": 0.0},
    "QA": {"pattern": r".+QA.*"},
    "FirstDay": {"pattern": r".+First Day.*", "nodata": -1.0},
    "LastDay": {"pattern": r".+Last Day.*", "nodata": -1.0},
})

L8_L1TP = CollectionFormat(
    name="L8_L1TP",
    pattern=r".+\.TIF",
    image_pattern=r"(?:.*[/\\])?([^/\\]+)[/\\].+\.TIF",
    datetime_pattern=r".*LC08_L1TP_.{6}_(.+?)_.*\.TIF",
    datetime_format="yyyyMMdd",
    bands={
        **{f"B{i:02d}": {"pattern": rf".+_B{i}\.TIF", "nodata": 0.0} for i in range(1, 12)},
        "BQA": {"pattern": r".+_BQA\.TIF"},
    },
)

CHIRPS_V2_0_MONTHLY = CollectionFormat(
    name="CHIRPS_v2_0_monthly_p05_tif",
    pattern=r".*chirps.+\.tif.*",
    image_pattern=r".*/(.+)\.tif.*",
    datetime_pattern=r".*chirps-v2\.0\.(.{7})\.tif.*",
    datetime_format="yyyy.MM",
    bands={"precipitation": {"pattern": r".+", "nodata": -9999.0}},
)

SENTINEL2_L1C = CollectionFormat(
    name="Sentinel2_L1C",
    pattern=r".+/IMG_DATA/.+\.jp2",
    image_pattern=r".*/(.+)\.SAFE.*",
    datetime_pattern=r".*MSIL1C_(.+?)_.*",
    datetime_format="yyyyMMdd'T'HHmmss",
    bands={
        **{f"B{i:02d}": {"pattern": rf".+_B{i:02d}\.jp2", "nodata": 0.0, "scale": 0.0001}
           for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)},
        "B8A": {"pattern": r".+_B8A\.jp2", "nodata": 0.0, "scale": 0.0001},
    },
)

SENTINEL2_L1C_AWS = CollectionFormat(
    name="Sentinel2_L1C_AWS",
    pattern=r".+.jp2",
    image_pattern=r".*tiles((?:/[A-Za-z0-9]+){7})/.*",
    datetime_pattern=r".*tiles(?:/[A-Za-z0-9]+){3}((?:/[A-Za-z0-9]+){3}).*",
    datetime_format="'/'yyyy'/'M'/'d",
    bands={
        **{f"B{i:02d}": {"pattern": rf".+B{i:02d}\.jp2", "nodata": 0.0, "scale": 0.0001}
           for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)},
        "B8A": {"pattern": r".+B8A\.jp2", "nodata": 0.0, "scale": 0.0001},
    },
)

SENTINEL2_L2A_THEIA = CollectionFormat(
    name="Sentinel2_L2A_THEIA",
    pattern=r".+SENTINEL2[AB].+\.tif",
    image_pattern=r".*/(.+)_[A-Z]_V[0-9]-[0-9]_.*",
    datetime_pattern=r".*/SENTINEL2[AB]_([0-9]{8}-[0-9]{6})-.*",
    datetime_format="yyyyMMdd-HHmmss",
    bands={
        **{f"B{i}": {"pattern": rf".+_FRE_B{i}\.tif", "nodata": -10000.0}
           for i in (2, 3, 4, 5, 6, 7, 8, 11, 12)},
        "B8A": {"pattern": r".+_FRE_B8A\.tif", "nodata": -10000.0},
        "CLM": {"pattern": r".+_CLM_R1\.tif"},
    },
)

# PlanetScope: ONE analytic file carries 4 bands selected by band INDEX —
# the multi-band-per-file form (reference band_num); a file matching
# several band entries emits one collection row per band.
PLANETSCOPE_SR = CollectionFormat(
    name="PlanetScope_3B_AnalyticMS_SR",
    pattern=r".+(?:_AnalyticMS_DN_udm|_AnalyticMS_SR)\.tif$",
    image_pattern=r".*([0-9]{8}_[0-9]{6}_.*?)(?:_AnalyticMS_DN_udm|_AnalyticMS_SR)\.tif$",
    datetime_pattern=r".*([0-9]{8}).*?(?:_AnalyticMS_DN_udm|_AnalyticMS_SR)\.tif$",
    datetime_format="yyyyMMdd",
    bands={
        "red": {"pattern": r".+_AnalyticMS_SR\.tif$", "nodata": 0.0, "band": 3},
        "green": {"pattern": r".+_AnalyticMS_SR\.tif$", "nodata": 0.0, "band": 2},
        "blue": {"pattern": r".+_AnalyticMS_SR\.tif$", "nodata": 0.0, "band": 1},
        "nir": {"pattern": r".+_AnalyticMS_SR\.tif$", "nodata": 0.0, "band": 4},
        "udm": {"pattern": r".+_AnalyticMS_DN_udm\.tif$"},
    },
)

PRESETS = {
    f.name: f
    for f in (
        SENTINEL2_L2A, L8_SR, MXD13A2, MXD11A2, SENTINEL1_IW_GRD,
        CHIRPS_V2_0_DAILY, MXD11A1, MXD13A3, MXD13Q1, MXD10A2, MXD14A2,
        MCD64A1, L8_L1TP, CHIRPS_V2_0_MONTHLY, SENTINEL2_L1C,
        SENTINEL2_L1C_AWS, SENTINEL2_L2A_THEIA, PLANETSCOPE_SR,
    )
}


def load_format(spec) -> CollectionFormat:
    """Preset name, CollectionFormat, or a dict in the reference's JSON
    schema (so any formats/*.json content loads directly)."""
    if isinstance(spec, CollectionFormat):
        return spec
    if isinstance(spec, str):
        if spec in PRESETS:
            return PRESETS[spec]
        raise ValueError(f"unknown format preset {spec!r} (have {sorted(PRESETS)})")
    fmt = spec["datetime"].get("format", "%Y-%m-%d")
    return CollectionFormat(
        name=spec.get("description", "custom")[:40],
        pattern=spec["pattern"],
        image_pattern=spec["images"]["pattern"],
        datetime_pattern=spec["datetime"]["pattern"],
        datetime_format=_STRPTIME_TO_JAVA.get(fmt, fmt),
        bands={
            b: {
                "pattern": d["pattern"],
                **({"nodata": float(d["nodata"])} if "nodata" in d else {}),
                **({"scale": float(d["scale"])} if "scale" in d else {}),
                **({"band": int(d["band"])} if "band" in d else {}),
            }
            for b, d in spec["bands"].items()
        },
    )


def _find_pattern(p: str) -> str:
    """Optimize a pattern for rlike's FIND semantics (unanchored search):
    a leading ``.*`` is a no-op and a leading ``.+`` only demands one
    preceding character — rewritten to a fixed-width lookbehind. The
    reference presets all start with ``.+``/``.*``, and under find() that
    leading wildcard makes Java regex retry the greedy backtrack at EVERY
    start position: O(len^2) per path, measured 21s -> 1.3s for the band
    chain over 150k paths. Semantics preserved exactly."""
    while p.startswith(".*") and not p[2:3] in ("?", "+", "*"):
        p = p[2:]
    if p.startswith(".+") and not p[2:3] in ("?", "+", "*"):
        p = "(?<=.)" + p[2:]
    return p


def ingest_listing(listing: DataFrame, fmt, path_col: str = "path") -> DataFrame:
    """file listing -> the gdalrefs-joined-with-images relation: one row per
    recognized (file, band) with (image_id, ts, band, path, band_idx,
    nodata, scale). A file whose path matches SEVERAL band patterns emits
    one row per band — the multi-band-per-file form (reference band_num;
    PlanetScope packs 4 bands into one analytic file selected by index);
    presets with disjoint patterns emit exactly one row per file as before.

    Mirrors image_collection::add_with_collection_format
    (src/image_collection.cpp:155-430): files not matching the global
    pattern are skipped; files matching no band pattern are skipped; image
    id and datetime come from their capture groups. All native column
    expressions — Catalyst keeps the whole extraction in one codegen'd
    scan over the inventory table."""
    from ..partition import spread

    fmt = load_format(fmt)
    # listing tables are metadata-thin (a few path strings per row) and
    # often arrive as a handful of scan partitions, while the extraction
    # below runs several java-regex evaluations per row — widen narrow
    # inputs to session parallelism first (no-op on many-partition inputs).
    # The lazy checkpoint pins the widened layout: without it Catalyst
    # pushes the regex filters (with the whole path expression inlined,
    # recomputed per predicate) back through the exchange onto the narrow
    # source, serializing exactly the work the spread parallelized. It
    # materializes in-run (paths only), nothing persists across runs.
    widened = spread(listing)
    if widened is not listing:
        widened = widened.localCheckpoint(eager=False)
    listing = widened
    p = F.col(path_col)
    hits = F.array(*[
        F.when(
            p.rlike(_find_pattern(spec["pattern"])),
            F.struct(
                F.lit(b).alias("band"),
                F.lit(int(spec.get("band", 1))).alias("band_idx"),
                F.lit(spec.get("nodata")).cast("double").alias("nodata"),
                F.lit(float(spec.get("scale", 1.0))).alias("scale"),
            ),
        )
        for b, spec in fmt.bands.items()
    ])
    out = (
        listing.filter(p.rlike(_find_pattern(fmt.pattern)))
        .select(
            F.regexp_extract(p, fmt.image_pattern, 1).alias("image_id"),
            F.to_timestamp(
                F.regexp_extract(p, fmt.datetime_pattern, 1), fmt.datetime_format
            ).alias("ts"),
            p.alias("path"),
            F.explode(F.filter(hits, lambda s: s.isNotNull())).alias("bs"),
        )
        .filter(F.col("image_id") != "")
        .select(
            "image_id", "ts", F.col("bs.band").alias("band"), "path",
            F.col("bs.band_idx").alias("band_idx"),
            F.col("bs.nodata").alias("nodata"), F.col("bs.scale").alias("scale"),
        )
    )
    return out


def images_table(refs: DataFrame) -> DataFrame:
    """gdalrefs relation -> the images table (one row per image:
    image_id, ts, n_bands, band->path map) — the analog of the reference's
    images SQLite table keyed for the find_range_st join. Footprints are
    not derivable from file NAMES; the reference opens each file with GDAL
    for its bbox (src/image_collection.cpp:330-360) — at scale that is a
    metadata backfill join against an inventory/STAC table — or, for
    HDF-EOS payloads whose bytes are at hand, one executor-side pass
    over the granules' own StructMetadata (footprints_from_hdfeos
    below); synth/testdata provide footprints directly."""
    return refs.groupBy("image_id").agg(
        F.min("ts").alias("ts"),
        F.count("*").alias("n_bands"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("band"), F.col("path"))))
        ).alias("band_paths"),
    )


def footprints_from_hdfeos(images: DataFrame, bytes_col: str = "bytes",
                           id_col: str = "image_id") -> DataFrame:
    """Derive footprints from granule BYTES — the reference's GDAL-open
    backfill (src/image_collection.cpp:330-360) done Spark-side for
    HDF-EOS payloads: a mapInPandas pass reads each granule's OWN
    StructMetadata.0 (sources/hdf4.hdfeos_grid_info) and emits
    (image_id, left, right, bottom, top, srs, nx, ny) for its first
    grid. Only the two metadata columns enter the exchange-free scan;
    the bytes never shuffle. Join the result back onto the collection
    to complete an images table without any sidecar inventory."""
    import pandas as pd

    cols = images.select(id_col, bytes_col)

    def extract(it):
        from .hdf4 import hdfeos_grid_info

        for pdf in it:
            rows = []
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                g = hdfeos_grid_info(bytes(raw))[0]
                rows.append((iid, g["left"], g["right"], g["bottom"],
                             g["top"], g["srs"], g["nx"], g["ny"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "left", "right", "bottom", "top", "srs", "nx", "ny"])

    return cols.mapInPandas(
        extract,
        f"{id_col} string, left double, right double, bottom double, "
        "top double, srs string, nx int, ny int",
    )
