"""Property suite for the warp aggregating resamplers (VERDICT r5 #8):
random footprint boxes + nodata masks vs an independent SCALAR
transliteration of GWKAverageOrModeThread
(/root/reference/alg/gdalwarpkernel.cpp:7573 — average/sum/min/max
folds, the GRA_Mode weight-histogram with the GWKTS_First tie rule
:8103-8165, and the GRA_Med/Q1/Q3 ceil(quant*n - 1) selection :8338),
over the same [floor(min+1e-10), ceil(max-1e-10)) index window.

Derandomized (derandomize=True) like the buffer/coverage suites; 400
examples per method family.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from osgeo_gdal_spark.operators.raster_ops import (
    _aggregate_footprints, _footprint_indices)

METHODS = ["average", "asum", "amin", "amax", "amode", "amed", "aq1", "aq3"]
EPS = 1e-10


def scalar_reference(mosaic, bx0, bx1, by0, by1, world, method):
    """Straight-line transliteration of the reference per-dst-pixel
    loop; returns NaN when nothing contributes."""
    if not all(map(math.isfinite, (bx0, bx1, by0, by1))):
        return float("nan")
    if not (bx1 > -EPS and bx0 < world + EPS
            and by1 > -EPS and by0 < world + EPS):
        return float("nan")
    ix0 = max(int(math.floor(bx0 + EPS)), 0)
    ix1 = min(int(math.ceil(bx1 - EPS)), world)
    iy0 = max(int(math.floor(by0 + EPS)), 0)
    iy1 = min(int(math.ceil(by1 - EPS)), world)
    if ix0 == ix1 and ix1 < world:
        ix1 += 1
    if iy0 == iy1 and iy1 < world:
        iy1 += 1
    vals = []  # scan order: y outer, x inner (the reference loop order)
    for iy in range(iy0, iy1):
        for ix in range(ix0, ix1):
            v = mosaic[iy, ix]
            if not math.isnan(v):
                vals.append(float(v))
    if not vals:
        return float("nan")
    if method == "average":
        return sum(vals) / len(vals)
    if method == "asum":
        return sum(vals)
    if method == "amin":
        return min(vals)
    if method == "amax":
        return max(vals)
    if method == "amode":
        # GRA_Mode, GWKTS_First: counts grow in scan order; update the
        # winner only on a STRICT count increase, so the first value to
        # reach the maximal count wins ties (gdalwarpkernel.cpp:8141)
        counts = {}
        max_count, mode = 0, float("nan")
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
            if counts[v] > max_count:
                max_count, mode = counts[v], v
        return mode
    quant = {"amed": 0.5, "aq1": 0.25, "aq3": 0.75}[method]
    s = sorted(vals)
    return s[int(math.ceil(quant * len(s) - 1))]


@st.composite
def cases(draw):
    world = draw(st.integers(2, 7))
    vals = draw(st.lists(st.integers(0, 5), min_size=world * world,
                         max_size=world * world))
    mask = draw(st.lists(st.booleans(), min_size=world * world,
                         max_size=world * world))
    mosaic = np.array(vals, dtype=np.float64).reshape(world, world)
    mosaic[np.array(mask).reshape(world, world)] = np.nan
    coord = st.floats(-2.0, world + 2.0, allow_nan=False, width=32)
    boxes = draw(st.lists(st.tuples(coord, coord, coord, coord),
                          min_size=1, max_size=5))
    return world, mosaic, boxes


@settings(max_examples=400, deadline=None, derandomize=True)
@given(cases(), st.sampled_from(METHODS))
def test_footprint_aggregation_matches_reference(case, method):
    world, mosaic, boxes = case
    bx0 = np.array([min(b[0], b[1]) for b in boxes])
    bx1 = np.array([max(b[0], b[1]) for b in boxes])
    by0 = np.array([min(b[2], b[3]) for b in boxes])
    by1 = np.array([max(b[2], b[3]) for b in boxes])
    ix0, ix1, iy0, iy1, valid = _footprint_indices(bx0, bx1, by0, by1,
                                                   world)
    out, cnt = _aggregate_footprints(
        mosaic, ix0, ix1, iy0, iy1, valid, 0, 0, world, world, method)
    for i, b in enumerate(boxes):
        exp = scalar_reference(mosaic, bx0[i], bx1[i], by0[i], by1[i],
                               world, method)
        got = out[i]
        if math.isnan(exp) or not valid[i] or cnt[i] == 0:
            assert math.isnan(exp) and (not valid[i] or cnt[i] == 0
                                        or math.isnan(got)), (
                b, method, exp, got)
        elif method in ("average", "asum"):
            assert math.isclose(got, exp, rel_tol=1e-12), (b, method)
        else:
            assert got == exp, (b, method, exp, got)


def test_fixture_class_mode_tie_first_reach():
    """Pinned fixture: two values with equal final counts — the winner
    is the FIRST to reach the max count in scan order (value 3 at
    positions 0,1 beats value 5 at positions 2,3)."""
    mosaic = np.array([[3.0, 3.0], [5.0, 5.0]])
    ix0, ix1, iy0, iy1, valid = _footprint_indices(
        np.array([0.0]), np.array([2.0]), np.array([0.0]),
        np.array([2.0]), 2)
    out, cnt = _aggregate_footprints(
        mosaic, ix0, ix1, iy0, iy1, valid, 0, 0, 2, 2, "amode")
    assert out[0] == 3.0 and cnt[0] == 4


def test_fixture_class_quantile_selection():
    """Pinned fixture: med/q1/q3 of 4 values select indices
    ceil(q*4-1) = 1, 0, 2 of the sorted list."""
    mosaic = np.array([[4.0, 1.0], [3.0, 2.0]])
    args = (np.array([0.0]), np.array([2.0]),
            np.array([0.0]), np.array([2.0]))
    ix0, ix1, iy0, iy1, valid = _footprint_indices(*args, 2)
    for method, exp in (("amed", 2.0), ("aq1", 1.0), ("aq3", 3.0)):
        out, _ = _aggregate_footprints(
            mosaic, ix0, ix1, iy0, iy1, valid, 0, 0, 2, 2, method)
        assert out[0] == exp, method


def test_resize_named_verb_upscale_near(spark):
    """resize_tiles (gdal raster resize) in the upscale direction with
    NEAR: each src pixel becomes a 2x2 block (dst center maps to
    sx = 0.5X - 0.25, so floor(sx + 0.5) = floor(X/2 + 0.25) = X//2)."""
    from osgeo_gdal_spark.operators import raster_ops as RO
    from osgeo_gdal_spark.sources.raster import (synth_pixel_grid,
                                                 synth_tiles)

    out = RO.resize_tiles(synth_tiles(spark, 0), 0, 1, method="near")
    rows = out.collect()
    assert len(rows) == 4 and all(r["zoom"] == 1 for r in rows)
    src = synth_pixel_grid(0, 0, 0)
    for r in rows:
        got = np.frombuffer(bytes(r["pixels"]), dtype=np.float64).reshape(
            256, 256)
        gx, gy = int(r["gx"]), int(r["gy"])
        dx = gx * 256 + np.arange(256)[None, :]
        dy = gy * 256 + np.arange(256)[:, None]
        exp = src[dy // 2, dx // 2]
        assert (got == exp).all()


def test_resize_zoom3_scale_smoke(spark):
    """64-tile resize (z3 -> z2) end-to-end: cover derivation + warp at
    a tile count where a driver-side loop would already hurt — checks
    output grid completeness and an exact dyadic window probe."""
    from osgeo_gdal_spark.operators import raster_ops as RO
    from osgeo_gdal_spark.sources.raster import synth_tiles

    out = RO.resize_tiles(synth_tiles(spark, 3), 3, 2, method="bilinear")
    keys = {(r["gx"], r["gy"]) for r in out.select("gx", "gy").collect()}
    assert keys == {(x, y) for x in range(4) for y in range(4)}
    px = RO.explode_pixels(out).filter(
        "gpx >= 500 and gpx < 504 and gpy >= 500 and gpy < 504").collect()
    assert len(px) == 16
    for r in px:
        X, Y = r["gpx"], r["gpy"]
        vals = [((2 * X + dx) * 7 + (2 * Y + dy) * 11 + 3) % 255
                for dx in (0, 1) for dy in (0, 1)]
        assert r["value"] == sum(vals) / 4.0, (X, Y)
