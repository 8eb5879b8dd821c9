from .features import read_features, write_geojson, write_shp  # noqa: F401
