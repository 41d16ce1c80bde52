"""Rectangle clipping of polygon rings (Sutherland-Hodgman).

The geometry kernel behind the layer-algebra Clip overlay EMITTING
geometries (``/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:7537``
delegates polygon∩polygon to GEOS; the axis-rect clip window — ogr2ogr's
``-clipsrc xmin ymin xmax ymax``, ``apps/ogr2ogr_lib.cpp:2460`` — is the
dominant use and needs no GEOS: Sutherland-Hodgman against each of the
four half-planes). Holes clip independently; even-odd semantics of the
clipped ring set reproduce shell∩rect minus hole∩rect.
"""

from __future__ import annotations

import numpy as np


def sh_clip_ring(xs, ys, x0: float, y0: float, x1: float, y1: float):
    """Sutherland-Hodgman clip of one ring against the axis rect
    [x0,x1]x[y0,y1]. Input ring open or closed; output is an OPEN ring
    (first point not repeated), possibly empty. Degenerate (collapsed)
    outputs with < 3 points return empty."""
    pts = list(zip([float(v) for v in xs], [float(v) for v in ys]))
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]

    def clip_edge(points, inside, intersect):
        out = []
        n = len(points)
        for i in range(n):
            cur = points[i]
            prv = points[i - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        return out

    def ix_v(xc):
        def f(a, b):
            t = (xc - a[0]) / (b[0] - a[0])
            return (xc, a[1] + t * (b[1] - a[1]))
        return f

    def ix_h(yc):
        def f(a, b):
            t = (yc - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), yc)
        return f

    for inside, ix in (
        (lambda p: p[0] >= x0, ix_v(x0)),
        (lambda p: p[0] <= x1, ix_v(x1)),
        (lambda p: p[1] >= y0, ix_h(y0)),
        (lambda p: p[1] <= y1, ix_h(y1)),
    ):
        pts = clip_edge(pts, inside, ix)
        if not pts:
            return np.array([]), np.array([])
    if len(pts) < 3:
        return np.array([]), np.array([])
    return (np.array([p[0] for p in pts]), np.array([p[1] for p in pts]))


def ring_area(xs, ys) -> float:
    """Signed shoelace area of an open ring."""
    if len(xs) < 3:
        return 0.0
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) / 2.0)


def supercover_cells(xa, ya, xb, yb):
    """Integer cells whose INTERIOR the open segment passes through
    (crossing-parameter walk: split [0,1] at every gridline crossing,
    classify each sub-interval by its midpoint). Cells merely touched at
    a corner or along an edge get zero-length intervals and are skipped —
    harmless either way, since band cells are always exactly clipped."""
    ts = [0.0, 1.0]
    dx, dy = xb - xa, yb - ya
    if dx != 0.0:
        lo, hi = sorted((xa, xb))
        k = np.ceil(lo)
        while k <= hi:
            ts.append((k - xa) / dx)
            k += 1.0
    if dy != 0.0:
        lo, hi = sorted((ya, yb))
        k = np.ceil(lo)
        while k <= hi:
            ts.append((k - ya) / dy)
            k += 1.0
    ts = sorted(t for t in ts if 0.0 <= t <= 1.0)
    cells = set()
    for t0, t1 in zip(ts, ts[1:]):
        if t1 - t0 <= 0.0:
            continue
        tm = 0.5 * (t0 + t1)
        cells.add((int(np.floor(xa + tm * dx)), int(np.floor(ya + tm * dy))))
    return cells


def ring_cov_weights(xs, ys, ox: int, oy: int, size: int) -> np.ndarray:
    """(size, size) fractional coverage of each pixel box
    [cx,cx+1]x[cy,cy+1] (cx = ox..ox+size-1 global px) by the simple
    ring's interior: cells the boundary passes through get the exact
    Sutherland-Hodgman clip area; all others get the 0/1 center rule
    (a center exactly ON the boundary only occurs in a crossed cell,
    where PIP is never consulted). Row index is y - oy."""
    from .pip import points_in_ring

    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if xs[0] != xs[-1] or ys[0] != ys[-1]:
        xs = np.append(xs, xs[0])
        ys = np.append(ys, ys[0])

    cx = ox + np.arange(size) + 0.5
    cy = oy + np.arange(size) + 0.5
    CX, CY = np.meshgrid(cx, cy)
    w = points_in_ring(CX.ravel(), CY.ravel(), xs, ys) \
        .reshape(size, size).astype(np.float64)

    band = set()
    for i in range(len(xs) - 1):
        band |= supercover_cells(xs[i], ys[i], xs[i + 1], ys[i + 1])
    for gx, gy in band:
        ix, iy = gx - ox, gy - oy
        if 0 <= ix < size and 0 <= iy < size:
            qx, qy = sh_clip_ring(xs, ys, gx, gy, gx + 1, gy + 1)
            w[iy, ix] = abs(ring_area(qx, qy))
    return w


def polygon_cov_weights(rings, ox: int, oy: int, size: int) -> np.ndarray:
    """Coverage weights for a polygon given as [outer, hole, hole, ...]
    rings (each an (xs, ys) pair): outer coverage minus hole coverage."""
    w = ring_cov_weights(rings[0][0], rings[0][1], ox, oy, size)
    for hx, hy in rings[1:]:
        w -= ring_cov_weights(hx, hy, ox, oy, size)
    return w
