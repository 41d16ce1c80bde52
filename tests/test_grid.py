"""Grid scatter interpolation (gdalgrid.cpp invdist/average/nearest)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osgeo_gdal_spark.operators import grid as GR
from osgeo_gdal_spark.sources import raster as RS

ZOOM = 1
WORLD = 512
R = 40.0


@pytest.fixture(scope="module")
def pts_pdf():
    rng = np.random.default_rng(11)
    n = 120
    return {
        "px": (rng.random(n) * WORLD).astype(np.float64),
        "py": (rng.random(n) * WORLD).astype(np.float64),
        "z": rng.integers(1, 100, n).astype(np.float64),
    }


@pytest.fixture(scope="module")
def pts_df(spark, pts_pdf):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(pts_pdf))


def _brute(pts, method, window, radius=R, power=2.0, smoothing=0.0, nodata=0.0):
    x0, y0, w, h = window
    out = np.full((h, w), nodata)
    order = np.lexsort((pts["z"], pts["py"], pts["px"]))
    px, py, z = pts["px"][order], pts["py"][order], pts["z"][order]
    for yy in range(h):
        for xx in range(w):
            xc, yc = x0 + xx + 0.5, y0 + yy + 0.5
            d2 = (px - xc) ** 2 + (py - yc) ** 2
            m = d2 <= radius * radius
            if not m.any():
                continue
            if method == "invdist":
                r2 = d2[m] + smoothing * smoothing
                if (r2 < 1e-13).any():
                    out[yy, xx] = z[m][r2 < 1e-13][0]
                    continue
                # mirror the kernel's p=2 pow-free path bit-for-bit
                wgt = (1.0 / r2 if power == 2.0
                       else 1.0 / np.power(r2, power / 2.0))
                num = den = 0.0
                for wi, zi in zip(wgt, z[m]):
                    num += wi * zi
                    den += wi
                out[yy, xx] = num / den
            elif method == "average":
                s = 0.0
                for zi in z[m]:
                    s += zi
                out[yy, xx] = s / m.sum()
            else:
                out[yy, xx] = z[m][np.argmin(d2[m])]
    return out


@pytest.mark.parametrize("method", ["invdist", "average", "nearest"])
def test_grid_matches_brute_force(spark, pts_df, pts_pdf, method):
    win = (96, 64, 64, 48)
    tiles = GR.grid_interpolate(spark, pts_df, ZOOM, method, R, window=win)
    got_tiles = {(r["gx"], r["gy"]): RS.parse_tile(r) for r in tiles.collect()}
    want = _brute(pts_pdf, method, win)
    x0, y0, w, h = win
    for yy in range(h):
        for xx in range(w):
            gpx, gpy = x0 + xx, y0 + yy
            g = got_tiles[(gpx // 256, gpy // 256)][gpy % 256, gpx % 256]
            assert g == want[yy, xx], (method, gpx, gpy, g, want[yy, xx])


def test_grid_invdist_smoothing_and_power(spark, pts_df, pts_pdf):
    win = (128, 128, 32, 32)
    tiles = GR.grid_interpolate(spark, pts_df, ZOOM, "invdist", R,
                                power=3.0, smoothing=2.0, window=win)
    got = {(r["gx"], r["gy"]): RS.parse_tile(r) for r in tiles.collect()}
    want = _brute(pts_pdf, "invdist", win, power=3.0, smoothing=2.0)
    x0, y0, w, h = win
    for yy in range(0, h, 5):
        for xx in range(0, w, 5):
            gpx, gpy = x0 + xx, y0 + yy
            g = got[(gpx // 256, gpy // 256)][gpy % 256, gpx % 256]
            np.testing.assert_allclose(g, want[yy, xx], rtol=1e-12)


def test_grid_nodata_outside_radius(spark):
    import pandas as pd

    one = spark.createDataFrame(
        pd.DataFrame({"px": [100.0], "py": [100.0], "z": [7.0]})
    )
    tiles = GR.grid_interpolate(spark, one, ZOOM, "nearest", 10.0,
                                nodata=-1.0, window=(0, 0, 256, 256))
    g = RS.parse_tile(tiles.collect()[0])
    assert g[100, 100] == 7.0
    assert g[100, 111] == -1.0 and g[200, 200] == -1.0
    # exact disc: pixel centers within 10 px of the point (100.0, 100.0)
    cx = np.arange(256) + 0.5
    d2 = (cx[None, :] - 100.0) ** 2 + (cx[:, None] - 100.0) ** 2
    assert (g != -1.0).sum() == (d2 <= 100.0).sum() > 200


def test_grid_partition_invariance(spark, pts_df):
    win = (96, 64, 64, 48)
    a = {(r["gx"], r["gy"]): r["checksum"]
         for r in GR.grid_interpolate(spark, pts_df.repartition(1), ZOOM,
                                      "invdist", R, window=win).collect()}
    b = {(r["gx"], r["gy"]): r["checksum"]
         for r in GR.grid_interpolate(spark, pts_df.repartition(13), ZOOM,
                                      "invdist", R, window=win).collect()}
    assert a == b


def test_invdistnn_selects_nearest_n(spark):
    """invdistnn equals brute-force nearest-N IDW, and differs from plain
    invdist where more than max_points fall in the radius."""
    import pandas as pd

    from osgeo_gdal_spark.operators import grid as GR, raster_ops as RO

    rng = np.random.default_rng(11)
    n = 60
    pdf = pd.DataFrame({
        "px": rng.uniform(100, 140, n),
        "py": rng.uniform(100, 140, n),
        "z": rng.integers(0, 100, n).astype(float),
    })
    pts = spark.createDataFrame(pdf)
    win = (110, 110, 16, 16)
    tiles = GR.grid_interpolate(spark, pts, 1, "invdistnn", 20.0,
                                window=win, max_points=5)
    px = RO.explode_pixels(tiles)
    got = {(r["gpx"], r["gpy"]): r["value"] for r in px.collect()
           if win[0] <= r["gpx"] < win[0] + win[2]
           and win[1] <= r["gpy"] < win[1] + win[3]}

    order = np.lexsort((pdf["z"], pdf["py"], pdf["px"]))
    sx = pdf["px"].to_numpy()[order]
    sy = pdf["py"].to_numpy()[order]
    sz = pdf["z"].to_numpy()[order]
    differs = 0
    for (gx, gy), v in got.items():
        cx, cy = gx + 0.5, gy + 0.5
        d2 = (sx - cx) ** 2 + (sy - cy) ** 2
        inr = d2 <= 400.0
        idx = np.nonzero(inr)[0]
        if len(idx) == 0:
            assert v == 0.0
            continue
        sel = idx[np.argsort(d2[idx], kind="stable")[:5]]
        num = den = 0.0
        for i in sel:                 # sequential, sorted order
            w = 1.0 / d2[i]
            num += w * sz[i]
            den += w
        assert v == num / den, (gx, gy)
        if len(idx) > 5:
            allnum = allden = 0.0
            for i in idx:
                w = 1.0 / d2[i]
                allnum += w * sz[i]
                allden += w
            if allnum / allden != v:
                differs += 1
    assert differs > 0   # the cap actually changed some pixels


def test_delaunay_euler_and_affine_reproduction():
    from osgeo_gdal_spark.kernels import delaunay as D
    from osgeo_gdal_spark.kernels.polypoly import convex_hull

    rng = np.random.default_rng(5)
    px = rng.uniform(0, 100, 80)
    py = rng.uniform(0, 100, 80)
    tris = D.delaunay(px, py)
    h = len(convex_hull(px, py))
    assert len(tris) == 2 * 80 - h - 2     # Euler: T = 2n - h - 2
    pz = 3.0 * px + 7.0 * py + 1.0
    planes = D.tin_planes(px, py, pz, tris)
    qx = rng.uniform(10, 90, 400)
    qy = rng.uniform(10, 90, 400)
    got = D.tin_interpolate(planes, qx, qy, nodata=np.nan)
    m = ~np.isnan(got)
    assert m.mean() > 0.9
    assert np.allclose(got[m], (3.0 * qx + 7.0 * qy + 1.0)[m], atol=1e-9)
    # regular lattice (maximally cocircular): still a full triangulation
    gx, gy = np.meshgrid(np.arange(6) * 10.0, np.arange(5) * 10.0)
    lt = D.delaunay(gx.ravel(), gy.ravel())
    assert len(lt) == 2 * 30 - 18 - 2


def test_grid_data_metrics_brute_force(spark):
    """minimum/maximum/count vs a brute-force python reference over the
    probe window (range/average_distance are driver-gated)."""
    import numpy as np

    from osgeo_gdal_spark.operators import grid as GR, raster_ops as RO
    from osgeo_gdal_spark.sources import pages as PG
    from tests.conftest import SF_DIR

    zoom, radius = 1, 3.0
    win = (100, 100, 16, 16)
    pages = PG.pages_df(spark, SF_DIR).select(
        "lon", "lat", F.col("doc_id").alias("z"))
    pts = GR.points_to_px(pages, zoom, value="z", projection="equirect")
    P = np.array([(r["px"], r["py"], r["z"]) for r in pts.collect()])

    for meth in ("minimum", "maximum", "count"):
        tiles = GR.grid_interpolate(spark, pts, zoom, meth, radius,
                                    window=win, nodata=-1.0)
        px = RO.explode_pixels(tiles)
        got = {(r["gpx"], r["gpy"]): r["value"] for r in px.filter(
            (F.col("gpx") >= win[0]) & (F.col("gpx") < win[0] + win[2])
            & (F.col("gpy") >= win[1]) & (F.col("gpy") < win[1] + win[3])
        ).collect()}
        for gy in range(win[1], win[1] + win[3]):
            for gx in range(win[0], win[0] + win[2]):
                d2 = (P[:, 0] - (gx + 0.5)) ** 2 + (P[:, 1] - (gy + 0.5)) ** 2
                sel = P[d2 <= radius * radius, 2]
                if len(sel) == 0:
                    want = -1.0
                elif meth == "minimum":
                    want = sel.min()
                elif meth == "maximum":
                    want = sel.max()
                else:
                    want = float(len(sel))
                assert got[(gx, gy)] == want, (meth, gx, gy)


def test_delaunay_distributed_matches_single_pass(spark):
    """Block-certified distributed Delaunay == the single Bowyer-Watson
    triangulation on a general-position random set, WITHOUT the
    single-task fallback (certifies in the block rounds), and with
    DataFrame.toPandas never called (the round-3 driver bottleneck)."""
    import numpy as np
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from osgeo_gdal_spark.kernels import delaunay as D
    from osgeo_gdal_spark.operators import grid as GR

    rng = np.random.default_rng(11)
    px = rng.uniform(0, 400, 120).round(3)
    py = rng.uniform(0, 400, 120).round(3)
    # dedup: round-3 coords could collide
    seen = sorted(set(zip(px, py)))
    px = np.array([p[0] for p in seen])
    py = np.array([p[1] for p in seen])
    z = rng.uniform(-10, 10, len(px)).round(3)

    pts = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(px, py, z)],
        "px DOUBLE, py DOUBLE, z DOUBLE",
    )

    orig = CDF.toPandas

    def banned(self):
        raise AssertionError("grid_linear must not call toPandas")

    CDF.toPandas = banned
    try:
        tri_df, rounds = GR.delaunay_tin_distributed(
            spark, pts, block=64.0, max_rounds=4
        )
        got = {tuple(r) for r in tri_df.collect()}
    finally:
        CDF.toPandas = orig

    # the 64px block on a 400px extent must certify without the
    # final whole-set gather
    assert rounds < 4

    tris = D.delaunay(px, py)
    want = set()
    for (i, j, k) in tris:
        vs = sorted([(px[i], py[i], z[i]), (px[j], py[j], z[j]),
                     (px[k], py[k], z[k])])
        want.add(tuple(v for vert in vs for v in vert))
    assert got == want


def test_grid_linear_tiles_distributed_interpolation(spark):
    """The tile-join interpolation path (triangles explode to covered
    tiles; no broadcast TIN) reproduces the affine field and nodata
    outside the hull, across a tile seam."""
    import numpy as np

    from osgeo_gdal_spark.operators import grid as GR, raster_ops as RO

    pts = []
    for i in range(5):
        for j in range(5):
            x, y = 200.0 + i * 30.0, 200.0 + j * 30.0
            if 0 < i < 4 and 0 < j < 4:
                x += ((i * 3 + j) % 3) * 0.5
            pts.append((x, y, 2.0 * x + 0.5 * y - 3.0))
    df = spark.createDataFrame(pts, "px DOUBLE, py DOUBLE, z DOUBLE")
    tiles = GR.grid_linear(spark, df, 1, nodata=-1.0,
                           window=(192, 192, 160, 160))
    px_rows = RO.explode_pixels(tiles).collect()
    inside = outside = 0
    for r in px_rows:
        x, y, v = r["gpx"] + 0.5, r["gpy"] + 0.5, r["value"]
        if 200 < x < 320 and 200 < y < 320:
            assert abs(v - (2.0 * x + 0.5 * y - 3.0)) < 1e-9, (x, y)
            inside += 1
        elif x < 200 or x > 320 or y < 200 or y > 320:
            assert v == -1.0
            outside += 1
    assert inside > 5000 and outside > 1000
