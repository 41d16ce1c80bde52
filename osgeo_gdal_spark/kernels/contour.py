"""Marching-squares iso-line segments for one contour level.

The kernel core of GDAL contour (``/root/reference/alg/contour.cpp`` +
``alg/marching_squares/``): each 2x2 pixel cell contributes 0..2 segments
of the iso-line at `level`, with endpoints linearly interpolated along the
crossed cell edges. Marching squares is *cell-local*, so the distributed
operator only needs a 1-px halo to own every cell — no cross-tile
iteration (polyline stitching is a separate, deferred step; GDAL also
emits segments first and stitches after).

Coordinates: pixel-center grid; a cell (i, j) has corners at pixel centers
(j, i), (j+1, i), (j, i+1), (j+1, i+1). Saddle cells (case 5/10) follow
the standard center-average disambiguation.
"""

from __future__ import annotations

import numpy as np


def marching_squares(grid: np.ndarray, level: float, with_cells=False,
                     origin=(0, 0)):
    """Segments [(x0, y0, x1, y1), ...] in pixel-center coords;
    with_cells=True prepends the owning cell (j, i) to each tuple.

    ``origin`` = (j0, i0) integer cell offset added to every index BEFORE
    the int->float coordinate construction, so running the kernel on a
    window SLICE of a larger grid emits bit-identical coordinates to
    running it on the full grid (int addition commutes exactly; float
    addition does not, so offsetting after the fact would drift a ulp)."""
    g = np.asarray(grid, dtype=np.float64)
    j_off, i_off = int(origin[0]), int(origin[1])
    h, w = g.shape
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    bl = g[1:, :-1]
    br = g[1:, 1:]
    case = (
        (tl >= level).astype(np.int8)
        | ((tr >= level).astype(np.int8) << 1)
        | ((br >= level).astype(np.int8) << 2)
        | ((bl >= level).astype(np.int8) << 3)
    )
    # a cell with ANY NaN corner is outside the known raster (missing halo
    # or sparse tile table) and must emit nothing — NaN >= level comparing
    # False would otherwise fake a "below-level" corner and interpolate
    # NaN endpoints
    any_nan = np.isnan(tl) | np.isnan(tr) | np.isnan(bl) | np.isnan(br)
    ys, xs = np.nonzero((case != 0) & (case != 15) & ~any_nan)
    segs = []

    def interp(a, b):
        # fraction along the edge from corner value a to b where it hits level
        d = b - a
        return 0.5 if d == 0 else (level - a) / d

    for i, j in zip(ys.tolist(), xs.tolist()):
        a, b, c, d = g[i, j], g[i, j + 1], g[i + 1, j + 1], g[i + 1, j]
        cs = int(case[i, j])
        jj, ii = j + j_off, i + i_off
        # edge points: top (between a-b), right (b-c), bottom (d-c), left (a-d)
        top = (jj + interp(a, b), float(ii))
        right = (float(jj + 1), ii + interp(b, c))
        bottom = (jj + interp(d, c), float(ii + 1))
        left = (float(jj), ii + interp(a, d))
        table = {
            1: [(left, top)], 2: [(top, right)], 3: [(left, right)],
            4: [(right, bottom)], 6: [(top, bottom)], 7: [(left, bottom)],
            8: [(bottom, left)], 9: [(bottom, top)], 11: [(bottom, right)],
            12: [(right, left)], 13: [(right, top)], 14: [(top, left)],
        }
        if cs in (5, 10):
            center = (a + b + c + d) / 4.0
            if cs == 5:
                pairs = [(left, top), (right, bottom)] if center < level else [
                    (left, bottom), (right, top)]
            else:
                pairs = [(top, right), (bottom, left)] if center < level else [
                    (top, left), (bottom, right)]
        else:
            pairs = table[cs]
        for (x0, y0), (x1, y1) in pairs:
            if with_cells:
                segs.append((jj, ii, x0, y0, x1, y1))
            else:
                segs.append((x0, y0, x1, y1))
    return segs
