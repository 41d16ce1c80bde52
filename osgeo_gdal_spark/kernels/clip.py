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
