"""Polygon-polygon predicates without GEOS.

The exact-refine kernels behind a polygon x polygon spatial join — the
filter-and-refine pattern of ``ogrlayer.cpp:4004-4076`` extended beyond
point probes (the reference delegates the exact test to GEOS prepared
geometries; these are the closed-form equivalents for polygon rings):

- ``segments_cross``: proper segment intersection (strict), vectorized
  over all edge pairs;
- ``polygons_intersect``: interiors overlap ⟺ any edge pair crosses, or
  a vertex of one lies strictly inside the other, or (grazing overlap
  with no vertex containment) an edge MIDPOINT of one lies strictly
  inside the other. Boundary-only touches are NOT intersections here
  (strict-interior semantics, matching the repo's PIP convention; the
  fixture layers are built on offset grids so ties never arise);
- ``polygon_contains_polygon``: every vertex of B strictly inside A and
  no edge crossings.

All predicates operate on PackedGeometry ring arrays (kernels/wkb.py) and
honor holes via the even-odd PIP kernel.
"""

from __future__ import annotations

import numpy as np

from . import pip as PIP


def _rings(g):
    ring_i = 0
    for nrings in g.part_rings:
        for _ in range(int(nrings)):
            s, e = g.ring_offsets[ring_i], g.ring_offsets[ring_i + 1]
            yield g.xs[s:e], g.ys[s:e]
            ring_i += 1


def _edges(g):
    ex0, ey0, ex1, ey1 = [], [], [], []
    for xs, ys in _rings(g):
        x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
        ex0.append(xs)
        ey0.append(ys)
        ex1.append(x1)
        ey1.append(y1)
    return (np.concatenate(ex0), np.concatenate(ey0),
            np.concatenate(ex1), np.concatenate(ey1))


def segments_cross(a0x, a0y, a1x, a1y, b0x, b0y, b1x, b1y) -> bool:
    """True if ANY segment of A properly crosses ANY segment of B
    (strict: shared endpoints / collinear touching do not count).
    Vectorized over the full (edges_A x edges_B) pair matrix."""
    A0x = a0x[:, None]; A0y = a0y[:, None]
    A1x = a1x[:, None]; A1y = a1y[:, None]
    B0x = b0x[None, :]; B0y = b0y[None, :]
    B1x = b1x[None, :]; B1y = b1y[None, :]
    d1 = (A1x - A0x) * (B0y - A0y) - (A1y - A0y) * (B0x - A0x)
    d2 = (A1x - A0x) * (B1y - A0y) - (A1y - A0y) * (B1x - A0x)
    d3 = (B1x - B0x) * (A0y - B0y) - (B1y - B0y) * (A0x - B0x)
    d4 = (B1x - B0x) * (A1y - B0y) - (B1y - B0y) * (A1x - B0x)
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def polygons_intersect(ga, gb) -> bool:
    """Strict-interior intersection of two (multi)polygons with holes."""
    # cheap envelope reject first (FilterGeometry stage 1)
    ax0, ay0, ax1, ay1 = ga.envelope()
    bx0, by0, bx1, by1 = gb.envelope()
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return False
    ea = _edges(ga)
    eb = _edges(gb)
    if segments_cross(*ea, *eb):
        return True
    # vertex containment (covers A inside B / B inside A)
    if PIP.points_in_polygon(ea[0], ea[1], gb).any():
        return True
    if PIP.points_in_polygon(eb[0], eb[1], ga).any():
        return True
    # edge midpoints (covers equal-boundary / vertex-on-boundary overlaps)
    if PIP.points_in_polygon((ea[0] + ea[2]) / 2.0,
                             (ea[1] + ea[3]) / 2.0, gb).any():
        return True
    if PIP.points_in_polygon((eb[0] + eb[2]) / 2.0,
                             (eb[1] + eb[3]) / 2.0, ga).any():
        return True
    return False


def polygon_contains_polygon(ga, gb) -> bool:
    """A strictly contains B: all B vertices inside A, no edge crossings."""
    ea = _edges(ga)
    eb = _edges(gb)
    if segments_cross(*ea, *eb):
        return False
    return bool(PIP.points_in_polygon(eb[0], eb[1], ga).all())


def convex_hull(xs, ys):
    """Andrew monotone chain over point arrays; returns hull ring (open,
    CCW in y-up coords) — the ST_ConvexHull / `gdal vector convex-hull`
    kernel (no GEOS needed)."""
    pts = sorted(set(zip([float(v) for v in xs], [float(v) for v in ys])))
    if len(pts) <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]
