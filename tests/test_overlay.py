"""Rect-clip overlay (Sutherland-Hodgman) kernel + operator tests."""

import numpy as np

from osgeo_gdal_spark.kernels import clip as CL
from osgeo_gdal_spark.operators import overlay as OV
from osgeo_gdal_spark.sources import polygons as PL


def test_sh_clip_basic_cases():
    # square [0,10]^2 clipped by [2,3]x[8,7] window
    xs, ys = CL.sh_clip_ring([0, 10, 10, 0], [0, 0, 10, 10], 2, 3, 8, 7)
    assert CL.ring_area(xs, ys) == (8 - 2) * (7 - 3)
    # fully inside: unchanged ring
    xs, ys = CL.sh_clip_ring([4, 6, 6, 4], [4, 4, 6, 6], 2, 3, 8, 7)
    assert CL.ring_area(xs, ys) == 4.0 and len(xs) == 4
    # fully outside: empty
    xs, ys = CL.sh_clip_ring([20, 30, 30, 20], [0, 0, 10, 10], 2, 3, 8, 7)
    assert len(xs) == 0
    # triangle cut by one edge: area by sampled reference
    tx, ty = [0.0, 9.0, 0.0], [0.0, 0.0, 9.0]
    xs, ys = CL.sh_clip_ring(tx, ty, 0, 0, 4.5, 100)
    # tri x<=4.5 region: trapezoid area = integral of height over x
    want = 4.5 * 9 - 4.5 * 4.5 / 2  # int_0^4.5 (9 - x) dx
    assert abs(CL.ring_area(xs, ys) - want) < 1e-12


def test_sh_clip_hole_subtracts():
    import struct

    from osgeo_gdal_spark.kernels import wkb as W

    shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]
    wkb = W.polygon_wkb([shell, hole])
    g = W.parse_wkb(wkb)
    total = 0.0
    ring_i = 0
    for nr in g.part_rings:
        for j in range(int(nr)):
            s, e = g.ring_offsets[ring_i], g.ring_offsets[ring_i + 1]
            cx, cy = CL.sh_clip_ring(g.xs[s:e], g.ys[s:e], 2, 2, 8, 8)
            a = abs(CL.ring_area(cx, cy))
            total += a if j == 0 else -a
            ring_i += 1
    assert total == 6 * 6 - 2 * 2


def test_clip_features_rect_vs_sampling(spark):
    """Operator result vs dense point sampling of (polygon AND rect)."""
    rect = (-100.0, -35.0, 165.0, 49.5)
    rows = OV.clip_features_rect(PL.polygons_df(spark), rect).collect()
    got = {r["eas_id"]: r["clip_area"] for r in rows}
    # features entirely outside are dropped
    assert 166 not in got and 165 not in got
    rng = np.random.default_rng(5)
    n = 400_000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    cell = 360.0 * 180.0 / n
    inrect = ((lon > rect[0]) & (lon < rect[2])
              & (lat > rect[1]) & (lat < rect[3]))
    for p in PL.POLYGONS:
        kind, prm = p.kind, p.params
        if kind == "rect":
            x0, y0, x1, y1 = prm["bounds"]
            m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
        elif kind == "rect_hole":
            x0, y0, x1, y1 = prm["bounds"]
            hx0, hy0, hx1, hy1 = prm["hole"]
            m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
            m &= ~((lon > hx0) & (lon < hx1) & (lat > hy0) & (lat < hy1))
        elif kind == "tri":
            (ax, ay), (bx, by), (cx, cy) = prm["vertices"]
            m = ((bx - ax) * (lat - ay) - (by - ay) * (lon - ax) > 0)
            m &= ((cx - bx) * (lat - by) - (cy - by) * (lon - bx) > 0)
            m &= ((ax - cx) * (lat - cy) - (ay - cy) * (lon - cx) > 0)
        else:
            y0, y1 = prm["lat"]
            m = (((lon > prm["west_lon"]) | (lon < prm["east_lon"]))
                 & (lat > y0) & (lat < y1))
        approx = (m & inrect).sum() * cell
        if p.eas_id in got:
            assert abs(got[p.eas_id] - approx) < max(30.0, 0.1 * approx), p.eas_id
        else:
            assert approx < 30.0, p.eas_id
