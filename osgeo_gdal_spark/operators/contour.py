"""Distributed contour: per-tile marching squares with halo cell ownership.

GDAL contour (``/root/reference/alg/contour.cpp``) emits iso-line segments
then stitches polylines; the segment phase is cell-local, so distribution
needs only the focal-style 1-px halo: a tile owns every 2x2 cell whose
top-left pixel lives in it, and its east/south halo strips provide the
other corners for border cells. Segment output is exactly the full-raster
marching squares, partitioned by owner tile (verified against a full-grid
reference). Polyline stitching across tiles is the deferred second phase
(same border machinery as polygonize).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..sources.raster import TILE, parse_tile
from .focal import _strips

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)


def contour_segments(tiles: DataFrame, zoom: int, levels) -> DataFrame:
    """Iso-line segments in global pixel-center coordinates for each level."""
    lv = [float(x) for x in levels]

    def stencil(pdf):
        import pandas as pd

        from ..kernels.contour import marching_squares

        tgx, tgy = int(pdf["tgx"].iloc[0]), int(pdf["tgy"].iloc[0])
        # assemble tile + east/south(+SE) halo: cells owned by this tile
        # are those with top-left pixel inside it -> need one extra row/col
        pad = np.full((TILE + 1, TILE + 1), np.nan)
        for _, row in pdf.iterrows():
            arr = np.frombuffer(bytes(row["strip"]), dtype=np.float64).reshape(
                row["sh"], row["sw"]
            )
            dx, dy = int(row["dx"]), int(row["dy"])
            if (dx, dy) == (0, 0):
                pad[:TILE, :TILE] = arr
            elif (dx, dy) == (1, 0):      # from west neighbor: not needed
                pass
            elif (dx, dy) == (-1, 0):     # strip from EAST neighbor's west col
                pad[:TILE, TILE:] = arr
            elif (dx, dy) == (0, -1):     # from SOUTH neighbor's north row
                pad[TILE:, :TILE] = arr
            elif (dx, dy) == (-1, -1):    # from SE neighbor's NW corner
                pad[TILE:, TILE:] = arr
        rows = []
        ox, oy = tgx * TILE, tgy * TILE
        for level in lv:
            # marching_squares skips any cell with a NaN corner, so the
            # NaN halo padding (global border tiles, sparse tile tables)
            # needs no trimming — missing neighbors simply emit nothing
            for x0, y0, x1, y1 in marching_squares(pad, level):
                rows.append((level, ox + x0, oy + y0, ox + x1, oy + y1))
        return pd.DataFrame(rows, columns=["level", "x0", "y0", "x1", "y1"])

    strips = _strips(tiles, zoom)
    return strips.groupBy("tgx", "tgy").applyInPandas(stencil, _SEG_SCHEMA)
