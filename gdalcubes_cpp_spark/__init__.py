"""gdalcubes_cpp_spark — PySpark-native spatial-join + tiling engine.

Public API (a user of the reference maps 1:1 onto these):

    from gdalcubes_cpp_spark import (
        get_spark, CubeView, Cube,
        build_cube, st_join, images_df, default_view,
        dummy_cube, formula_cube, empty_cube, simple_cube,
        read_chunks, write_cube,
    )
"""

from .cube import Cube
from .session import get_spark
from .view import Band, CubeView, Duration

__all__ = [
    "Band", "Cube", "CubeView", "Duration", "get_spark",
    "build_cube", "st_join", "images_df", "default_view",
    "dummy_cube", "formula_cube", "empty_cube", "simple_cube",
    "read_chunks", "write_cube",
]


def __getattr__(name):  # lazy: avoid importing Spark-heavy modules eagerly
    if name in ("build_cube",):
        from .operators.build import build_cube

        return build_cube
    if name in ("st_join",):
        from .operators.stjoin import st_join

        return st_join
    if name in ("images_df",):
        from .synth import images_df

        return images_df
    if name in ("default_view", "dummy_cube", "formula_cube", "empty_cube",
                "simple_cube", "read_chunks", "write_cube"):
        from .sources import collection

        return getattr(collection, name)
    raise AttributeError(name)
