"""In-process A/B: ring-walk width for the polygonize family fixtures.

Times contour_polygons / raster_footprint / polygonize_rings variants at
walk widths {8, 16, 32} in ONE warmed session, interleaved min-of-3
(same-session interleaving is the only protocol that beats this VM's
cross-invocation tenancy noise).

Usage: taskset -c 0-31 python scripts/ab_walk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_extra import get_session, _force  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session()

from pyspark.sql import functions as F  # noqa: E402

from osgeo_gdal_spark import entry_queries as EQ  # noqa: E402
from osgeo_gdal_spark.operators import contour as CT, polygonize as PZ  # noqa: E402
from osgeo_gdal_spark.sources import raster as RS  # noqa: E402


def contour_poly(walk):
    from osgeo_gdal_spark.kernels import wkb as W  # noqa: F401

    tiles = RS.synth_tiles(spark, EQ.RASTER_ZOOM)
    cp = CT.contour_polygons(tiles, EQ.RASTER_ZOOM, EQ.CONTOUR_BANDS,
                             shuffle_partitions=8, walk_partitions=walk)
    # same derived projection as q_contour_polygons
    return cp


def footprint(walk):
    tiles = RS.synth_tiles(spark, EQ.RASTER_ZOOM)
    return PZ.footprint(tiles, EQ.RASTER_ZOOM, lambda g: g == 1,
                        shuffle_partitions=8, walk_partitions=walk)


def rings(walk):
    tiles = RS.synth_category_tiles(spark, EQ.RASTER_ZOOM, block=96)
    return PZ.polygonize_polygons(tiles, EQ.RASTER_ZOOM,
                                  shuffle_partitions=8,
                                  walk_partitions=walk)


CASES = {"contour_polygons": contour_poly, "footprint": footprint,
         "rings": rings}
WIDTHS = [8, 16, 32]

results = {(c, w): [] for c in CASES for w in WIDTHS}
for rep in range(3):
    for cname, fn in CASES.items():
        for w in WIDTHS:
            t0 = time.perf_counter()
            _force(fn(w))
            results[(cname, w)].append(round(time.perf_counter() - t0, 3))

for cname in CASES:
    for w in WIDTHS:
        rs = results[(cname, w)]
        print(f"{cname:20s} walk={w:3d} min={min(rs):6.3f} {rs}")
spark.stop()
