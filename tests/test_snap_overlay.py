"""Snap-rounding overlay (kernels/snap.py + overlay_features_snapped):
the NON-general-position tier — vertex-on-edge, shared collinear edges,
corner contacts, holes, near-coincident boundaries — plus the
area-conservation law A∩B + A\\B = A the round-3 verdict asked for."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from osgeo_gdal_spark.kernels import snap as SN

G = 2.0 ** -20


def ring(*pts):
    return (np.array([p[0] for p in pts], float),
            np.array([p[1] for p in pts], float))


def rect(x0, y0, x1, y1):
    return ring((x0, y0), (x1, y0), (x1, y1), (x0, y1))


def areas(a, b, grid=G):
    return {op: SN.rings_area(SN.overlay_rings_snapped(a, b, op, grid))
            for op in ("intersection", "union", "difference",
                       "symdifference")}


DEGENERATE_CASES = [
    # (name, A, B, i, u, d)
    ("shared-full-edge", [rect(0, 0, 2, 2)], [rect(2, 0, 4, 2)],
     0.0, 8.0, 4.0),
    ("partial-shared-edge", [rect(0, 0, 2, 2)], [rect(2, 1, 4, 3)],
     0.0, 8.0, 4.0),
    ("corner-touch", [rect(-1, -1, 0, 0)], [rect(0, 0, 1, 1)],
     0.0, 2.0, 1.0),
    ("T-contact-outside", [rect(0, 0, 4, 4)],
     [ring((4, 2), (6, 1), (6, 3))], 0.0, 18.0, 16.0),
    ("identical", [rect(0, 0, 3, 3)], [rect(0, 0, 3, 3)],
     9.0, 9.0, 0.0),
    ("inset-shared-edge", [rect(0, 0, 3, 3)], [rect(1, 0, 2, 1)],
     1.0, 9.0, 8.0),
    ("poke-through-vertex-inside",
     [rect(0, 0, 4, 4)], [ring((2, 2), (4, 1), (6, 2), (4, 3))],
     2.0, 18.0, 14.0),
]


@pytest.mark.parametrize(
    "name,a,b,i,u,d", DEGENERATE_CASES, ids=[c[0] for c in DEGENERATE_CASES]
)
def test_degenerate_contact_families(name, a, b, i, u, d):
    got = areas(a, b)
    assert got["intersection"] == i
    assert got["union"] == u
    assert got["difference"] == d
    assert got["symdifference"] == (
        got["union"] - got["intersection"]
    ) or abs(got["symdifference"] -
             (got["union"] - got["intersection"])) < 1e-9


def test_hole_shared_boundaries():
    """A has a hole; B exactly fills it / partially bridges it."""
    a = [rect(0, 0, 4, 4), rect(1, 1, 3, 3)]     # even-odd: 4x4 minus 2x2
    fill = [rect(1, 1, 3, 3)]
    got = areas(a, fill)
    assert got == {"intersection": 0.0, "union": 16.0,
                   "difference": 12.0, "symdifference": 16.0}
    bridge = [rect(2, -1, 3, 2)]   # enters through the shared bottom edge
    got = areas(a, bridge)
    assert got["intersection"] == 1.0      # only the y in [0,1] strip
    assert got["union"] == 12.0 + 3.0 - 1.0
    assert got["difference"] == 11.0


def test_snap_recovers_near_coincident():
    """Boundaries 1e-9 apart snap together at a 2^-10 grid: the sliver
    disappears and the shared edge is exact."""
    a = [rect(0, 0, 2, 2)]
    b = [rect(2 + 1e-9, 0, 4, 2 + 1e-9)]
    got = areas(a, b, grid=2.0 ** -10)
    assert got["intersection"] == 0.0
    assert got["union"] == 8.0
    assert got["difference"] == 4.0


def test_area_conservation_random_rect_soup():
    """A∩B + A\\B = |A| and |A∪B| = |A|+|B|−|A∩B| over random integer
    rectangles — heavy shared-edge/corner collision rate by design."""
    rnd = random.Random(20260817)
    for _ in range(60):
        def poly():
            x0 = rnd.randint(0, 8)
            y0 = rnd.randint(0, 8)
            return [rect(x0, y0, x0 + rnd.randint(1, 5),
                         y0 + rnd.randint(1, 5))]

        a, b = poly(), poly()
        got = areas(a, b)
        aa, ab = SN.rings_area(a), SN.rings_area(b)
        assert abs(got["intersection"] + got["difference"] - aa) < 1e-9
        assert abs(got["union"] -
                   (aa + ab - got["intersection"])) < 1e-9
        assert abs(got["symdifference"] -
                   (got["union"] - got["intersection"])) < 1e-9


def test_area_conservation_triangles_on_lattice():
    """Same law over random lattice triangles (non-axis-parallel edges
    exercise the exact int64 collinearity tests)."""
    rnd = random.Random(7)
    made = 0
    while made < 40:
        def tri():
            pts = [(rnd.randint(0, 10), rnd.randint(0, 10))
                   for _ in range(3)]
            xs = np.array([p[0] for p in pts], float)
            ys = np.array([p[1] for p in pts], float)
            from osgeo_gdal_spark.kernels.clip import ring_area
            a = ring_area(xs, ys)
            if abs(a) < 0.5:
                return None
            if a < 0:          # ring-soup contract: shells CCW
                xs, ys = xs[::-1].copy(), ys[::-1].copy()
            return [(xs, ys)]

        a, b = tri(), tri()
        if a is None or b is None:
            continue
        made += 1
        got = areas(a, b)
        aa, ab = abs(SN.rings_area(a)), abs(SN.rings_area(b))
        assert abs(got["intersection"] + got["difference"] - aa) < 1e-9
        assert abs(got["union"] - (aa + ab - got["intersection"])) < 1e-9


def test_snap_rings_collapses_slivers():
    """snap_rings drops rings that quantize to zero area and removes
    repeated vertices."""
    sliver = [ring((0, 0), (4, 1e-12), (4, 0))]
    assert SN.snap_rings(sliver, 2.0 ** -10) == []
    dup = [ring((0, 0), (0, 0), (2, 0), (2, 2), (0, 2), (0, 2))]
    out = SN.snap_rings(dup, 2.0 ** -10)
    assert len(out) == 1 and len(out[0][0]) == 4


def test_operator_snapped_contact_pairs(spark):
    """overlay_features_snapped over the contact fixture: per-pair areas
    match the closed-form box algebra for every class, including the
    jittered one, and the candidate path emits no exact-refine UDF."""
    from osgeo_gdal_spark.operators import overlay as OV
    from osgeo_gdal_spark.sources import polygons as PL

    feats = PL.contact_feats_df(spark)
    polys = PL.contact_polys()
    ov = OV.overlay_features_snapped(
        spark, feats, polys, "intersection", grid=PL.CONTACT_GRID
    )
    got = {r["a_id"]: r["piece_area"] for r in ov.collect()}
    want = {}
    for p in PL.contact_pairs():
        ax0, ay0, ax1, ay1 = p["a"]
        bx0, by0, bx1, by1 = p["b"]
        if p["tri"] is not None:
            continue
        iw = max(0, min(ax1, bx1) - max(ax0, bx0))
        ih = max(0, min(ay1, by1) - max(ay0, by0))
        if iw * ih > 0:
            want[p["a_id"]] = float(iw * ih)
    assert got == want
    # plan guard: candidates_closed path -> the only Python stage is the
    # overlay kernel (MapInPandas); the exact-refine pandas UDF
    # (ArrowEvalPython) must NOT appear (AQE prints the plan twice, so
    # count >= 1, not == 1)
    plan = ov._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("MapInPandas") >= 1