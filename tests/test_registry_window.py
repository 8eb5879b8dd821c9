"""Driver-window invariants (r2 VERDICT #1): the round driver evaluates only
the FIRST 50 REGISTRY insertions, so every oracled query and every
judge-required rows-only query must sit inside that window, oracled first."""

from gdalcubes_cpp_spark.benchqueries import DEFS, REGISTRY

# every operator family that must have a driver row this round
REQUIRED_IN_WINDOW = [
    # r2 VERDICT #1 named entries
    "apply_time_udf_cumsum", "reduce_time_udf_range", "apply_pixel_udf_poly",
    "reduce_space_udf_spread", "format_ingest", "netcdf_roundtrip",
    "ann_knn_join_ivf", "ann_approx_suite", "images_multimodal",
    # r3 additions: dedup clustering + training-mix assembly
    "doc_dedup_clusters", "doc_training_mix",
    # folded suites covering the rest of SURVEY §2
    "stjoin_suite", "cube_mean_median", "cube_first_last", "cube_min_max",
    "cube_counts", "cube_mask_value_range", "cube_srs_suite",
    "reduce_time_full", "reduce_space", "aggregate_time_space",
    "window_time_suite", "fill_time_suite", "apply_filter_pixel",
    "join_bands", "slice_crop", "select_time_labeled", "fill_space_knn",
    "query_points_timeseries", "extract_geom", "zonal_suite",
    "filter_geom_rect", "packed_roundtrip", "cube_write_reread",
    # r4: the test_sampledata MODIS HDF4 end-to-end scenario
    "hdf4_modis_pixels",
    "doc_stats", "doc_exact_dups", "doc_signature_suite", "doc_lsh_jaccard",
    "doc_decontaminate", "ann_cosine_suite", "ann_knn_join",
    # r4: real S2 cell index + exact bucketed kNN (oracled suite)
    "s2_suite",
    "events_tumbling_suite", "events_sessionize", "tpch_suite",
    "doc_near_dups_suite", "cube_decode_suite",
]


def test_window_size():
    assert len(REGISTRY) <= 50


def test_oracled_before_rows_only():
    names = list(REGISTRY)
    kinds = [bool(REGISTRY[n][1]) for n in names]
    # once the first rows-only entry appears, no oracled entry may follow
    seen_rows_only = False
    for has_sql in kinds:
        if not has_sql:
            seen_rows_only = True
        else:
            assert not seen_rows_only, "oracled entry registered after rows-only"


def test_required_entries_in_window():
    window = list(REGISTRY)[:50]
    missing = [n for n in REQUIRED_IN_WINDOW if n not in window]
    assert not missing, f"required driver entries outside the window: {missing}"


def test_every_def_reachable():
    """Every _DEFS entry is either in the window or a member of a folded
    suite that is (no silently-dropped operators)."""
    folded_members = {
        "cube_mean", "cube_median", "cube_first", "cube_last",
        "cube_count_images", "cube_count_values", "cube_mask_value",
        "cube_mask_range", "aggregate_time", "aggregate_space",
        "fill_time_linear", "fill_time_locf", "query_points",
        "query_timeseries", "window_time_mean", "window_time_kernel",
        "tpch_pricing", "tpch_market_revenue", "doc_near_dups_pipeline",
        "doc_simhash_near_dups", "cube_average_decode", "cube_real_decode",
        "simple_cube_decode", "cube_mask_band_decode",
        "ann_ivf_topk", "ann_rp_lsh_pairs", "ann_topk", "ann_dup_pairs",
        "stjoin_rows", "stjoin_s2", "events_tumbling", "events_tumbling_ice",
        "events_asof",  # r5: folded into events_tumbling_suite
        "cube_utm_mean", "cube_polar_mean", "cube_sinu_mean", "cube_lcc_mean",
        "cube_laea_mean", "cube_aea_mean", "zonal_statistics", "zonal_topk",
            "cube_osgb_mean", "cube_swiss_mean", "cube_jp2_decode", "cube_hom_mean",
            "doc_minhash", "doc_simhash",
            "cube_cea_mean", "cube_aeqd_mean", "cube_eqc_mean",
            "s2_cells", "s2_knn", "hex_cells_img", "cube_jpegbase_decode",
            "stjoin_hex",
        "reduce_time_exact", "reduce_time_stats", "reduce_time_which",
        # r5-r6: extract_geom is a 3-source union (WKT + GeoJSON + SHP),
        # images_multimodal a 3-modality union (image + audio + video)
        "extract_geom_wkt", "extract_geom_geojson", "extract_geom_shp",
        "images_mm_image", "images_mm_audio", "images_mm_video",
    }
    window = set(REGISTRY)
    orphans = [n for n in DEFS if n not in window and n not in folded_members]
    assert not orphans, f"unregistered, unfolded defs: {orphans}"
