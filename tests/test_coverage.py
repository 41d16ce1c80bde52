"""Coverage tier (kernels/coverage.py): clean-coverage + simplify-
coverage — the GEOS CoverageCleaner/CoverageSimplifier re-expression
(apps/gdalalg_vector_clean_coverage.cpp, _simplify_coverage.cpp)."""

import numpy as np

from osgeo_gdal_spark.kernels import coverage as CV, snap as SN
from osgeo_gdal_spark.kernels.clip import ring_area

G = 2.0 ** -12


def rect(x0, y0, x1, y1):
    return (np.array([x0, x1, x1, x0], float),
            np.array([y0, y0, y1, y1], float))


def test_overlap_longest_border():
    """Overlap face merges into the neighbor with the longest shared
    border (A: two h-2 side edges + 2 caps beats B: one h-2 edge)."""
    polys = [(1, [rect(0, 0, 5, 4)]), (2, [rect(4, 1, 9, 3)])]
    out = CV.clean_coverage(polys, grid=G, merge_strategy="longest-border")
    assert SN.rings_area(out[1]) == 20.0
    assert SN.rings_area(out[2]) == 8.0


def test_overlap_strategies():
    polys = [(1, [rect(0, 0, 5, 4)]), (2, [rect(4, 0, 9, 4)])]
    for strat, want in (("min-index", (20.0, 16.0)),
                        ("max-area", (20.0, 16.0)),   # tie -> min pid
                        ("min-area", (20.0, 16.0))):
        out = CV.clean_coverage(polys, grid=G, merge_strategy=strat)
        got = (SN.rings_area(out[1]), SN.rings_area(out[2]))
        assert got == want, (strat, got)
        # conservation: exact partition of the union
        assert sum(got) == 36.0
        assert SN.overlay_areas_snapped(out[1], out[2], G)["i"] == 0.0


def test_gap_closes_within_threshold():
    """An ENCLOSED notch gap merges into the longest-border neighbor;
    max_gap_area leaves larger gaps open (maximum-gap-width analog)."""
    apts = [(0, 0), (4, 0), (4, 1.5), (3.5, 2.0), (4, 2.5), (4, 4), (0, 4)]
    A = (np.array([p[0] for p in apts]),
         np.array([p[1] for p in apts], dtype=float))
    polys = [(1, [A]), (2, [rect(4, 0, 9, 4)])]
    out = CV.clean_coverage(polys, grid=G)
    assert SN.rings_area(out[1]) == 16.0      # notch sides 2*~0.7 beat B's 1.0
    assert SN.rings_area(out[2]) == 20.0
    out = CV.clean_coverage(polys, grid=G, max_gap_area=0.1)
    assert SN.rings_area(out[1]) == 15.75     # 0.25 gap stays open
    assert SN.rings_area(out[2]) == 20.0


def test_simplify_shared_border_consistent():
    """The zigzag shared border simplifies ONCE: neighbors stay
    gap-free and overlap-free, total area is conserved exactly
    (preserve_boundary keeps the outer rectangle)."""
    zz = [(4.0, 0.0)] + [(4 + (0.3 if i % 2 else -0.3), 0.5 + i * 0.5)
                         for i in range(7)] + [(4.0, 4.0)]
    apts = [(0, 0), (4, 0)] + zz[1:-1] + [(4, 4), (0, 4)]
    bpts = [(4, 0), (9, 0), (9, 4), (4, 4)] + zz[1:-1][::-1]
    A = (np.array([p[0] for p in apts]),
         np.array([p[1] for p in apts], dtype=float))
    B = (np.array([p[0] for p in bpts]),
         np.array([p[1] for p in bpts], dtype=float))
    tot0 = ring_area(*A) + ring_area(*B)
    out = CV.simplify_coverage([(1, [A]), (2, [B])], tolerance=0.5,
                               grid=G, preserve_boundary=True)
    s1, s2 = SN.rings_area(out[1]), SN.rings_area(out[2])
    # border straightened to x=4 -> exact rects
    assert (s1, s2) == (16.0, 20.0)
    assert s1 + s2 == tot0
    # zero gaps / zero overlaps after simplification
    assert SN.overlay_areas_snapped(out[1], out[2], G)["i"] == 0.0
    u = SN.rings_area(SN.overlay_rings_snapped(out[1], out[2], "union", G))
    assert u == s1 + s2
    # vertex count actually dropped (the zigzag collapsed)
    assert sum(len(xs) for xs, _ in out[1]) < len(apts)


def test_simplify_without_preserve_boundary_simplifies_exterior():
    """With preserve_boundary=False an exterior zigzag simplifies too."""
    zz = [(0.0, 0.0)] + [((0.3 if i % 2 else -0.3), 0.5 + i * 0.5)
                         for i in range(7)] + [(0.0, 4.0)]
    apts = zz + [(-4, 4), (-4, 0)]
    A = (np.array([p[0] for p in apts]),
         np.array([p[1] for p in apts], dtype=float))
    keep = CV.simplify_coverage([(1, [A])], tolerance=0.5, grid=G,
                                preserve_boundary=True)
    drop = CV.simplify_coverage([(1, [A])], tolerance=0.5, grid=G,
                                preserve_boundary=False)
    assert sum(len(xs) for xs, _ in keep[1]) == len(apts)
    assert sum(len(xs) for xs, _ in drop[1]) < len(apts)
    assert SN.rings_area(drop[1]) == 16.0     # straightened to the rect


# --- property suite: random rect coverages --------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _rect_coverage(draw):
    """2-4 random integer rects (overlaps/gaps/shared edges arise
    naturally at this density)."""
    n = draw(st.integers(2, 4))
    polys = []
    for pid in range(1, n + 1):
        x0 = draw(st.integers(0, 8))
        y0 = draw(st.integers(0, 8))
        w = draw(st.integers(2, 6))
        h = draw(st.integers(2, 6))
        polys.append((pid, [rect(x0, y0, x0 + w, y0 + h)]))
    return polys


@settings(max_examples=300, deadline=None, derandomize=True)
@given(_rect_coverage(), st.sampled_from(
    ["longest-border", "max-area", "min-area", "min-index"]))
def test_hypothesis_clean_coverage_partition(polys, strategy):
    """clean_coverage always returns an exact partition: pairwise
    intersections are empty and the areas sum to the area of the
    union of the inputs (gaps all closed: every bounded gap merges)."""
    out = CV.clean_coverage(polys, grid=G, merge_strategy=strategy)
    areas = {p: SN.rings_area(r) for p, r in out.items()}
    # pairwise disjoint
    pids = sorted(out)
    for i in range(len(pids)):
        for j in range(i + 1, len(pids)):
            if out[pids[i]] and out[pids[j]]:
                got = SN.overlay_areas_snapped(
                    out[pids[i]], out[pids[j]], G)
                assert abs(got["i"]) < 1e-9, (pids[i], pids[j], strategy)
    # conservation: union of inputs == sum of outputs (all rects are
    # axis-aligned integers, unions are exact)
    u = None
    for _p, rs in polys:
        u = rs if u is None else SN.overlay_rings_snapped(u, rs, "union", G)
    # gaps fully enclosed by the input union ARE closed, so the total
    # must be >= union area is not enough — it must be exactly the
    # union area PLUS enclosed gaps; recompute via the cleaned union
    cu = None
    for p in pids:
        if not out[p]:
            continue
        cu = out[p] if cu is None else \
            SN.overlay_rings_snapped(cu, out[p], "union", G)
    assert abs(sum(areas.values()) - SN.rings_area(cu)) < 1e-9
    # no input area is ever LOST (the cleaned union covers the input
    # union; it may legitimately EXCEED it by closed enclosed gaps)
    lost = SN.rings_area(SN.overlay_rings_snapped(u, cu, "difference", G))
    assert abs(lost) < 1e-9
    # with gap closing disabled the cleaned union is EXACTLY the
    # input union (both directions empty)
    out0 = CV.clean_coverage(polys, grid=G, merge_strategy=strategy,
                             max_gap_area=0.0)
    cu0 = None
    for p in sorted(out0):
        if out0[p]:
            cu0 = out0[p] if cu0 is None else \
                SN.overlay_rings_snapped(cu0, out0[p], "union", G)
    d1 = SN.rings_area(SN.overlay_rings_snapped(u, cu0, "difference", G))
    d2 = SN.rings_area(SN.overlay_rings_snapped(cu0, u, "difference", G))
    assert abs(d1) < 1e-9 and abs(d2) < 1e-9
