"""The ST_* geometry function library over WKB BinaryType columns.

Mirrors the function set GDAL registers into its SQLite dialect
(``/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp``:
ST_Area, ST_Buffer, ST_Length, ST_MakePoint, ST_AsText/AsBinary/
GeomFromText/GeomFromWKB, ST_Union + unary/binary predicates; SURVEY
§2.C/§2.D). Implementation: Arrow-batched pandas UDFs over the packed-
array kernels in ``kernels/wkb.py`` / ``kernels/pip.py`` — the slow path
by design; anything expressible natively (bbox predicates, makepoint)
stays a plain column expression. The formerly-GEOS-delegating tier is
now real within named bounds: Union/Intersection/Difference via the
overlay kernel, Buffer for convex rings, MakeValid for proper-crossing
rings (kernels/makevalid.py); the general-position remainder of each
names its shapely extension point.

``register_all(spark)`` exposes them to SQL: ``SELECT ST_Area(geometry)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, SparkSession, functions as F, types as T

from ..kernels import pip as P, wkb as W


def _series_udf(fn, rettype):
    @F.pandas_udf(rettype)
    def udf(*cols):
        import pandas as pd

        return pd.Series(fn(*cols))

    return udf


def _areas(geoms):
    return [
        float("nan") if g is None else W.polygon_area(W.parse_wkb(bytes(g)))
        for g in geoms
    ]


def _centroid_x(geoms):
    return [float("nan") if g is None else W.centroid(W.parse_wkb(bytes(g)))[0]
            for g in geoms]


def _centroid_y(geoms):
    return [float("nan") if g is None else W.centroid(W.parse_wkb(bytes(g)))[1]
            for g in geoms]


def _envelope(geoms):
    import pandas as pd

    rows = []
    for g in geoms:
        if g is None:
            rows.append((None, None, None, None))
        else:
            rows.append(W.parse_wkb(bytes(g)).envelope())
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


def _geom_type(geoms):
    return [None if g is None else W.parse_wkb(bytes(g)).geom_type for g in geoms]


def _contains_point(geoms, xs, ys):
    out = np.zeros(len(geoms), dtype=bool)
    for i, g in enumerate(geoms):
        if g is None:
            continue
        pg = W.parse_wkb(bytes(g))
        out[i] = bool(
            P.points_in_polygon(np.asarray([xs.iloc[i]]), np.asarray([ys.iloc[i]]), pg)[0]
        )
    return out


def _as_text(geoms):
    def wkt(g):
        if g is None:
            return None
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type == "Point":
            return f"POINT ({pg.xs[0]:.6f} {pg.ys[0]:.6f})"
        rings = []
        for xs, ys in pg.rings():
            pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys))
            rings.append(f"({pts})")
        name = "POLYGON" if pg.geom_type == "Polygon" else "MULTIPOLYGON"
        return f"{name} ({', '.join(rings)})"

    return [wkt(g) for g in geoms]


st_area = _series_udf(_areas, T.DoubleType())
st_centroid_x = _series_udf(_centroid_x, T.DoubleType())
st_centroid_y = _series_udf(_centroid_y, T.DoubleType())
st_geometry_type = _series_udf(_geom_type, T.StringType())
st_astext = _series_udf(_as_text, T.StringType())
st_contains_point = _series_udf(_contains_point, T.BooleanType())

_ENV_TYPE = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


@F.pandas_udf(_ENV_TYPE)
def st_envelope(geoms):
    return _envelope(geoms)


@F.pandas_udf(T.BinaryType())
def st_makepoint(x, y):
    import pandas as pd

    return pd.Series(
        [W.point_wkb(float(a), float(b)) for a, b in zip(x, y)]
    )


def _not_implemented(name, hint):
    @F.pandas_udf(T.BinaryType())
    def udf(g):
        raise NotImplementedError(
            f"{name} needs a full GEOS-class engine (reference delegates to "
            f"GEOS, SURVEY §2.D ○-tier). Extension point: {hint}"
        )

    return udf


def _binary_overlay(op):
    """Two-geometry boolean set op via the GEOS-free edge-classification
    kernel (kernels/overlay_kernel.py) — the closed-form replacement for
    the GEOS delegation in ``ogrgeometry.cpp:4893`` (Intersection),
    ``:5437`` (Union), ``:5556`` (Difference). General-position inputs
    (no shared boundary segments); see the kernel docstring."""

    @F.pandas_udf(T.BinaryType())
    def udf(ga, gb):
        import pandas as pd

        from ..kernels import overlay_kernel as OVK

        out = []
        for a, b in zip(ga, gb):
            if a is None or b is None:
                out.append(None)
                continue
            ra = OVK.geometry_rings(W.parse_wkb(bytes(a)))
            rb = OVK.geometry_rings(W.parse_wkb(bytes(b)))
            out.append(OVK.rings_to_wkb(OVK.overlay_rings(ra, rb, op)))
        return pd.Series(out)

    return udf


def _ring_lengths(pg):
    total = 0.0
    for r in range(len(pg.ring_offsets) - 1):
        s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
        dx = np.diff(pg.xs[s:e])
        dy = np.diff(pg.ys[s:e])
        total += float(np.sum(np.sqrt(dx * dx + dy * dy)))
    return total


def _lengths(geoms):
    """OGR_G_Length semantics (ogrsqlitesqlfunctions.cpp ST_Length /
    ogrcurve.cpp get_Length): LineString -> polyline length; polygons ->
    boundary (perimeter) length; points -> 0."""
    out = []
    for g in geoms:
        if g is None:
            out.append(float("nan"))
            continue
        pg = W.parse_wkb(bytes(g))
        out.append(0.0 if pg.geom_type == "Point" else _ring_lengths(pg))
    return out


def _spherical_lengths(geoms):
    """ST_SphericalLength — the fast SPHERICAL great-circle sum
    (haversine, WGS84 mean radius): within ~0.5% of the ellipsoid.
    The accurate tier is _geodesic_lengths (kernels/geodesic, the
    Karney ellipsoidal model the reference reaches via PROJ)."""
    R = 6371008.8
    out = []
    for g in geoms:
        if g is None:
            out.append(float("nan"))
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type == "Point":
            out.append(0.0)
            continue
        total = 0.0
        for r in range(len(pg.ring_offsets) - 1):
            s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
            lon = np.radians(pg.xs[s:e])
            lat = np.radians(pg.ys[s:e])
            dlat = np.diff(lat)
            dlon = np.diff(lon)
            a = (np.sin(dlat / 2) ** 2
                 + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlon / 2) ** 2)
            total += float(np.sum(2 * R * np.arcsin(np.sqrt(a))))
        out.append(total)
    return out


def _from_text(wkts):
    """ST_GeomFromText: WKT -> WKB for POINT / LINESTRING / POLYGON /
    MULTIPOLYGON (the geometry types of this engine's data model)."""
    import re

    def ring_of(body):
        return [tuple(float(v) for v in pt.split())
                for pt in body.split(",")]

    out = []
    for s in wkts:
        if s is None:
            out.append(None)
            continue
        s = s.strip()
        m = re.match(r"^(\w+)\s*\((.*)\)$", s, re.S)
        if not m:
            out.append(None)
            continue
        kind, body = m.group(1).upper(), m.group(2).strip()
        if kind == "POINT":
            x, y = (float(v) for v in body.split())
            out.append(W.point_wkb(x, y))
        elif kind == "LINESTRING":
            out.append(W.linestring_wkb(ring_of(body)))
        elif kind == "POLYGON":
            rings = re.findall(r"\(([^()]*)\)", body)
            out.append(W.polygon_wkb([ring_of(r) for r in rings]))
        elif kind == "MULTIPOLYGON":
            polys = []
            for pm in re.findall(r"\(((?:\([^()]*\),?\s*)+)\)", body):
                polys.append([ring_of(r)
                              for r in re.findall(r"\(([^()]*)\)", pm)])
            out.append(W.multipolygon_wkb(polys))
        else:
            out.append(None)
    return out


def _spherical_areas(geoms):
    """ST_SphericalArea — the fast SPHERICAL excess on the WGS84 mean
    radius: signed l'Huilier fan from the first vertex, exact for
    great-circle-edged polygons; holes subtract. Within ~0.5% of the
    ellipsoid; the accurate tier is _geodesic_areas below
    (kernels/geodesic, the Karney ellipsoidal model)."""
    R = 6371008.8

    def tri_excess(v0, v1, v2):
        # central angles via the numerically-stable chord formula
        def ang(a, b):
            return 2.0 * np.arcsin(
                min(1.0, 0.5 * float(np.linalg.norm(a - b))))
        a, b, c = ang(v1, v2), ang(v0, v2), ang(v0, v1)
        s = 0.5 * (a + b + c)
        t = (np.tan(s / 2) * np.tan((s - a) / 2)
             * np.tan((s - b) / 2) * np.tan((s - c) / 2))
        e = 4.0 * np.arctan(np.sqrt(max(0.0, t)))
        sign = np.sign(float(np.dot(v0, np.cross(v1, v2))))
        return sign * e

    def unit(lon, lat):
        lo, la = np.radians(lon), np.radians(lat)
        return np.stack(
            [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
             np.sin(la)], axis=-1)

    out = []
    for g in geoms:
        if g is None:
            out.append(float("nan"))
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "MultiPolygon"):
            out.append(0.0)
            continue
        total = 0.0
        ring_idx = 0
        for part in pg.part_rings:
            for r in range(part):
                s, e = (pg.ring_offsets[ring_idx],
                        pg.ring_offsets[ring_idx + 1])
                xs, ys = pg.xs[s:e], pg.ys[s:e]
                # drop the duplicated closing vertex only on EXACT
                # lon/lat equality, tested before unit-vector conversion
                # (np.allclose's absolute tolerance could wrongly drop a
                # genuinely distinct ~1e-8-radian closing edge)
                if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
                    xs, ys = xs[:-1], ys[:-1]
                v = unit(xs, ys)
                exc = 0.0
                for i in range(1, len(v) - 1):
                    exc += tri_excess(v[0], v[i], v[i + 1])
                a = abs(exc) * R * R
                total += a if r == 0 else -a
                ring_idx += 1
        out.append(total)
    return out


@F.pandas_udf(T.BinaryType())
def st_concavehull_a2(geoms):
    """ST_ConcaveHull (ogrgeometry.cpp:4569; GEOS ConcaveHull) — the
    Edelsbrunner alpha-shape over the self-contained Bowyer-Watson
    Delaunay (kernels/delaunay.concave_hull), alpha fixed at 2.0
    coordinate units (pandas UDFs take columns; re-register a partial
    for other alphas). alpha -> inf reproduces ConvexHull; pytest pins
    the notch-excluding property."""
    import pandas as pd

    from ..kernels import delaunay as DL

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        hx, hy = DL.concave_hull(pg.xs, pg.ys, alpha=2.0)
        if len(hx) < 3:
            out.append(None)
            continue
        out.append(W.polygon_wkb([list(zip(hx.tolist(), hy.tolist()))]))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def st_linearize(geoms):
    """ST_Linearize / the OGR_GT_GetLinear ingest contract
    (ogr/ogr_core.h:621; ogrgeometryfactory.cpp:6071
    curveToLineString): stroke CircularString / CompoundCurve /
    CurvePolygon / MultiCurve / MultiSurface WKB to linear WKB at the
    default 4-degree arc step (OGR_ARC_STEPSIZE). Linear geometries
    pass through byte-identical, so a reader can apply this
    unconditionally to accept curve-bearing layers (e.g. GPKG)."""
    import pandas as pd

    from ..kernels import curves as CV

    return pd.Series([
        None if g is None else CV.linearize_wkb(bytes(g)) for g in geoms
    ])


@F.pandas_udf(T.DoubleType())
def st_distance(ga, gb):
    """ST_Distance (OGRGeometry::Distance, ogrgeometry.cpp:3892):
    planar min distance — 0 for touching/crossing/containing pairs,
    else min vertex-to-segment both ways (kernels/polypoly.
    geometry_distance). Point/LineString/Polygon/MultiPolygon."""
    import pandas as pd

    from ..kernels import polypoly as PP

    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(float("nan"))
            continue
        out.append(PP.geometry_distance(
            W.parse_wkb(bytes(a)), W.parse_wkb(bytes(b))))
    return pd.Series(out)


def _normalized(geoms):
    """ST_Normalize (OGRGeometry::Normalize, ogrgeometry.cpp:4369):
    canonical form — each ring rotated to start at its lexicographically
    smallest (x, y) vertex, exterior rings CCW, holes CW."""
    from .. import kernels

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "MultiPolygon"):
            out.append(bytes(g))
            continue
        polys = []
        ring_idx = 0
        for part in pg.part_rings:
            rings = []
            for r in range(part):
                s, e = (pg.ring_offsets[ring_idx],
                        pg.ring_offsets[ring_idx + 1])
                pts = list(zip(pg.xs[s:e].tolist(), pg.ys[s:e].tolist()))
                if pts[0] == pts[-1]:
                    pts = pts[:-1]
                area = sum(
                    pts[i][0] * pts[(i + 1) % len(pts)][1]
                    - pts[(i + 1) % len(pts)][0] * pts[i][1]
                    for i in range(len(pts))
                )
                want_ccw = (r == 0)
                if (area > 0) != want_ccw:
                    pts = pts[::-1]
                k = min(range(len(pts)), key=lambda i: pts[i])
                rings.append(pts[k:] + pts[:k])
                ring_idx += 1
            polys.append(rings)
        if pg.geom_type == "Polygon":
            out.append(W.polygon_wkb(polys[0]))
        else:
            out.append(W.multipolygon_wkb(polys))
    return out


def _set_precision_grid1(geoms):
    """ST_SetPrecision (ogrgeometry.cpp:7024; GEOS Precision Model) at
    grid size 1.0: snap every coordinate to the grid, then run the
    MakeValid repairs (duplicate collapse, degenerate-ring drop,
    crossing split) that snapping can introduce."""
    from ..kernels import makevalid as MV

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "MultiPolygon"):
            out.append(bytes(g))
            continue
        loops = []
        for r in range(len(pg.ring_offsets) - 1):
            s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
            xs = np.round(pg.xs[s:e])
            ys = np.round(pg.ys[s:e])
            loops.extend(MV.make_valid_rings(xs, ys))
        if not loops:
            out.append(None)
        elif len(loops) == 1:
            out.append(W.polygon_wkb([loops[0]]))
        else:
            out.append(W.multipolygon_wkb([[lp] for lp in loops]))
    return out


def _segmentize_max1(geoms):
    """ST_Segmentize with max edge length 1.0 (OGRGeometry::segmentize,
    ogrgeometry.cpp / ogr2ogr's -segmentize): insert evenly-spaced
    vertices so no edge exceeds the maximum — geometry unchanged as a
    point set, denser as a vertex set (the pre-reprojection densify
    step)."""
    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "LineString"):
            out.append(bytes(g))
            continue
        rings = []
        for r in range(len(pg.ring_offsets) - 1):
            s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
            pts = list(zip(pg.xs[s:e].tolist(), pg.ys[s:e].tolist()))
            dense = []
            for i in range(len(pts) - 1):
                (x0, y0), (x1, y1) = pts[i], pts[i + 1]
                dense.append((x0, y0))
                d = float(np.hypot(x1 - x0, y1 - y0))
                n = int(np.ceil(d / 1.0))
                for k in range(1, n):
                    t = k / n
                    dense.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
            dense.append(pts[-1])
            rings.append(dense)
        if pg.geom_type == "LineString":
            out.append(W.linestring_wkb(rings[0]))
        else:
            out.append(W.polygon_wkb(rings))
    return out


def _dump_parts(geoms):
    """ST_Dump / ogr2ogr -explodecollections: MultiPolygon -> array of
    its part-polygon WKBs (explode the array for one row per part);
    single geometries dump to a one-element array."""
    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type != "MultiPolygon":
            out.append([bytes(g)])
            continue
        parts = []
        ring_idx = 0
        for nr in pg.part_rings:
            rings = []
            for _ in range(nr):
                s, e = (pg.ring_offsets[ring_idx],
                        pg.ring_offsets[ring_idx + 1])
                rings.append(list(zip(pg.xs[s:e].tolist(),
                                      pg.ys[s:e].tolist())))
                ring_idx += 1
            parts.append(W.polygon_wkb(rings))
        out.append(parts)
    return out


st_segmentize = _series_udf(_segmentize_max1, T.BinaryType())
st_dump = _series_udf(_dump_parts, T.ArrayType(T.BinaryType()))
st_normalize = _series_udf(_normalized, T.BinaryType())
st_setprecision = _series_udf(_set_precision_grid1, T.BinaryType())


def _xs_of(geoms):
    """ST_X (ogrsqlitesqlfunctions.cpp ST_X: point x coordinate)."""
    return [
        float("nan") if g is None else float(W.parse_wkb(bytes(g)).xs[0])
        for g in geoms
    ]


def _ys_of(geoms):
    return [
        float("nan") if g is None else float(W.parse_wkb(bytes(g)).ys[0])
        for g in geoms
    ]


def _swapped_xy(geoms):
    """``gdal vector swap-xy`` (apps/gdalalg_vector_swap_xy.cpp via
    OGRGeometry::swapXY): rebuild the WKB with x/y exchanged — all
    linear geometry kinds."""
    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type == "Point":
            out.append(W.point_wkb(float(pg.ys[0]), float(pg.xs[0])))
        elif pg.geom_type == "LineString":
            out.append(W.linestring_wkb(
                list(zip(pg.ys.tolist(), pg.xs.tolist()))))
        elif pg.geom_type == "Polygon":
            rings = [list(zip(pg.ys[s:e].tolist(), pg.xs[s:e].tolist()))
                     for s, e in zip(pg.ring_offsets, pg.ring_offsets[1:])]
            out.append(W.polygon_wkb(rings))
        elif pg.geom_type == "MultiPolygon":
            polys, ring_idx = [], 0
            for nr in pg.part_rings:
                rings = []
                for _ in range(int(nr)):
                    s, e = (pg.ring_offsets[ring_idx],
                            pg.ring_offsets[ring_idx + 1])
                    rings.append(list(zip(pg.ys[s:e].tolist(),
                                          pg.xs[s:e].tolist())))
                    ring_idx += 1
                polys.append(rings)
            out.append(W.multipolygon_wkb(polys))
        else:
            raise NotImplementedError(
                f"swap-xy: unsupported geometry {pg.geom_type}")
    return out


def _npoints(geoms):
    """ST_NPoints (ogrsqlitesqlfunctions.cpp ST_NPoints: total vertex
    count over all rings/parts, closing vertices included)."""
    return [
        0 if g is None else int(len(W.parse_wkb(bytes(g)).xs))
        for g in geoms
    ]


st_x = _series_udf(_xs_of, T.DoubleType())
st_y = _series_udf(_ys_of, T.DoubleType())
st_swapxy = _series_udf(_swapped_xy, T.BinaryType())
st_npoints = _series_udf(_npoints, T.IntegerType())
def _geodesic_areas(geoms):
    """ST_GeodesicArea (ogrsqlitesqlfunctions.cpp: OGR_GeodesicArea via
    PROJ's geodesic) — ELLIPSOIDAL WGS84 area from kernels/geodesic:
    exact auxiliary-sphere relations + Green's theorem in the authalic
    q-function, GL-20 quadrature (no series, converged to machine
    precision; the octant with a pole vertex closes to total/8
    bitwise). Shells add, holes subtract, signed by ring winding."""
    from ..kernels import geodesic as GD

    out = []
    for g in geoms:
        if g is None:
            out.append(float("nan"))
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "MultiPolygon"):
            out.append(0.0)
            continue
        total = 0.0
        ring_idx = 0
        for part in pg.part_rings:
            for r in range(part):
                s0, e0 = (pg.ring_offsets[ring_idx],
                          pg.ring_offsets[ring_idx + 1])
                xs, ys = pg.xs[s0:e0], pg.ys[s0:e0]
                a = abs(GD.polygon_area(xs, ys))
                total += a if r == 0 else -a
                ring_idx += 1
        out.append(total)
    return out


def _geodesic_lengths(geoms):
    """ST_GeodesicLength — ELLIPSOIDAL WGS84 geodesic length
    (kernels/geodesic; meridian/equator arcs are closed-form exact:
    the quarter meridian evaluates to the published 10001965.729 m)."""
    from ..kernels import geodesic as GD

    out = []
    for g in geoms:
        if g is None:
            out.append(float("nan"))
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type == "Point":
            out.append(0.0)
            continue
        total = 0.0
        for r in range(len(pg.ring_offsets) - 1):
            s0, e0 = pg.ring_offsets[r], pg.ring_offsets[r + 1]
            total += GD.line_length(pg.xs[s0:e0], pg.ys[s0:e0])
        out.append(total)
    return out


st_geodesic_area = _series_udf(_geodesic_areas, T.DoubleType())
st_spherical_area = _series_udf(_spherical_areas, T.DoubleType())
st_spherical_length = _series_udf(_spherical_lengths, T.DoubleType())
st_concavehull = st_concavehull_a2
st_length = _series_udf(_lengths, T.DoubleType())
st_geodesic_length = _series_udf(_geodesic_lengths, T.DoubleType())

st_geomfromtext = _series_udf(_from_text, T.BinaryType())
# ST_AsBinary / ST_GeomFromWKB are identities in a WKB-native engine;
# ST_SRID is the constant data-model CRS (EPSG:4326 lon/lat).
st_asbinary = _series_udf(lambda g: [None if x is None else bytes(x)
                                     for x in g], T.BinaryType())
st_srid = _series_udf(lambda g: [None if x is None else 4326 for x in g],
                      T.IntegerType())


@F.pandas_udf(T.BinaryType())
def st_pointonsurface(geoms):
    """ST_PointOnSurface (ogrgeometry.cpp:6730; GEOS InteriorPointArea):
    the widest-interval midpoint of the envelope's horizontal bisector
    crossings — guaranteed inside the polygon (holes respected),
    unlike the centroid of a concave shape. Returns a WKB Point."""
    import pandas as pd

    from ..kernels import polypoly as PP

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        x, y = PP.interior_point(W.parse_wkb(bytes(g)))
        out.append(W.point_wkb(float(x), float(y)))
    return pd.Series(out)


st_union = _binary_overlay("union")
st_intersection = _binary_overlay("intersection")
st_difference = _binary_overlay("difference")
st_symdifference = _binary_overlay("symdifference")


def _binary_predicate(fn_name):
    """Two-geometry boundary-exact predicate from kernels/polypoly.py —
    the closed-form replacements for the GEOS delegation in
    ``ogrgeometry.cpp:6082`` (Touches), ``:6409`` (Overlaps), ``:1239``
    (Equals) and the disjoint complement."""

    @F.pandas_udf(T.BooleanType())
    def udf(ga, gb):
        import pandas as pd

        from ..kernels import polypoly as PP

        fn = getattr(PP, fn_name)
        out = []
        for a, b in zip(ga, gb):
            if a is None or b is None:
                out.append(None)
                continue
            out.append(bool(fn(W.parse_wkb(bytes(a)), W.parse_wkb(bytes(b)))))
        return pd.Series(out)

    return udf


@F.pandas_udf(T.BooleanType())
def st_crosses(ga, gb):
    """OGC Crosses (ogrgeometry.cpp:6155): defined for mixed dimensions —
    a LineString crosses a polygon when its interior has points both
    inside and outside; equal-dimension area pairs never Cross."""
    import pandas as pd

    from ..kernels import polypoly as PP

    poly_types = ("Polygon", "MultiPolygon")
    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
            continue
        A, B = W.parse_wkb(bytes(a)), W.parse_wkb(bytes(b))
        if A.geom_type == "LineString" and B.geom_type in poly_types:
            out.append(bool(PP.line_crosses_polygon(A, B)))
        elif B.geom_type == "LineString" and A.geom_type in poly_types:
            out.append(bool(PP.line_crosses_polygon(B, A)))
        else:
            out.append(False)
    return pd.Series(out)


st_touches = _binary_predicate("polygons_touch")
st_overlaps = _binary_predicate("polygons_overlap")
st_equals = _binary_predicate("polygons_equal")
st_covers = _binary_predicate("polygons_covers")
st_disjoint = _binary_predicate("polygons_disjoint")

@F.pandas_udf(T.BinaryType())
def st_buffer_1(geoms):
    """ST_Buffer with distance 1.0 (OGRGeometry::Buffer,
    ogrgeometry.cpp:4949) — ALL geometry types: Points become disk
    polygons, LineStrings the capsule-union path buffer
    (kernels/buffer.buffer_path), convex single-ring polygons take the
    round-join Minkowski fast path (kernels/polypoly.buffer_convex,
    quadsegs 30 — the OGR default), and everything else — non-convex,
    holes, multipolygons — runs the GENERAL morphology kernel
    (kernels/buffer.buffer_rings: boundary band + snapped union fold,
    quadsegs 8). Fixed distance because pandas UDFs take columns;
    parametrize via partial registration when needed."""
    import pandas as pd

    from ..kernels import buffer as BF
    from ..kernels import overlay_kernel as OVK
    from ..kernels import polypoly as PP

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type == "Point":
            dx, dy = BF.disk_polygon(float(pg.xs[0]), float(pg.ys[0]),
                                     1.0, 8)
            out.append(W.polygon_wkb([list(zip(dx.tolist(), dy.tolist()))]))
            continue
        if pg.geom_type == "LineString":
            rings = BF.buffer_path(pg.xs, pg.ys, 1.0, quadsegs=8)
            out.append(OVK.rings_to_wkb(rings) if rings else None)
            continue
        try:
            xs, ys = PP.buffer_convex(pg, 1.0, quadsegs=30)
            out.append(W.polygon_wkb([list(zip(xs.tolist(), ys.tolist()))]))
        except NotImplementedError:
            rings = BF.buffer_rings(OVK.geometry_rings(pg), 1.0, quadsegs=8)
            out.append(OVK.rings_to_wkb(rings) if rings else None)
    return pd.Series(out)


st_buffer = st_buffer_1

@F.pandas_udf(T.BinaryType())
def st_makevalid(geoms):
    """ST_MakeValid (OGRGeometry::MakeValid, ogrgeometry.cpp:4183;
    GEOS linework/structure method) — REAL for polygons whose self-
    contacts are proper segment crossings: the ring is noded at every
    crossing and split into simple CCW loops (bowtie -> two triangles,
    figure-eight chains -> one loop per lobe). When the noded faces
    OVERLAP (pentagram-style interleaved crossings) the full
    arrangement pass takes over: every bounded face with nonzero
    winding is emitted as its own polygon — 5 point-triangles plus the
    winding-2 core for a pentagram (GEOS linework/Polygonizer
    structure; kernels/makevalid._arrangement_faces). Collinear-overlap
    and vertex-on-edge self-contacts route through the exact snap-
    lattice arrangement (kernels/makevalid.make_valid_lattice — the
    round-4 completion of the 4-tier dispatch). Valid input passes
    through unchanged-as-polygon; fully degenerate input yields
    NULL."""
    import pandas as pd

    from ..kernels import makevalid as MV

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        loops = MV.make_valid(W.parse_wkb(bytes(g)))
        if loops is None:
            out.append(bytes(g))   # already valid: pass through
        elif not loops:
            out.append(None)
        elif len(loops) == 1:
            out.append(W.polygon_wkb([loops[0]]))
        else:
            # loop winding is structure: CCW = shell, CW = hole of the
            # preceding shell (only the intact-multi-ring repair tier
            # emits CW loops — makevalid.make_valid restores input
            # winding there; every noding tier emits all-CCW loops,
            # which keep the one-shell-per-polygon behavior)
            import numpy as _np

            from ..kernels.clip import ring_area as _ra

            polys = []
            for loop in loops:
                ccw = _ra(_np.array([p[0] for p in loop]),
                          _np.array([p[1] for p in loop])) >= 0.0
                if ccw or not polys:
                    polys.append([loop if ccw else loop[::-1]])
                else:
                    polys[-1].append(loop)
            out.append(W.polygon_wkb(polys[0]) if len(polys) == 1
                       else W.multipolygon_wkb(polys))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def st_isvalid_reason(geoms):
    """ST_IsValidReason (check-geometry verb): 'valid' /
    'self-intersection' / 'self-contact' from the MakeValid tier
    dispatch (kernels/makevalid.validity_reason)."""
    import pandas as pd

    from ..kernels import makevalid as MV

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type not in ("Polygon", "MultiPolygon"):
            out.append("valid")
            continue
        out.append(MV.validity_reason(pg))
    return pd.Series(out)


@F.pandas_udf(T.BooleanType())
def st_isvalid(geoms):
    """ST_IsValid — boolean twin of st_isvalid_reason."""
    import pandas as pd

    from ..kernels import makevalid as MV

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        out.append(pg.geom_type not in ("Polygon", "MultiPolygon")
                   or MV.validity_reason(pg) == "valid")
    return pd.Series(out)


def register_all(spark: SparkSession) -> None:
    """Expose the library to Spark SQL (the analog of GDAL registering
    OGR2SQLITE functions into the SQLite VM)."""
    spark.udf.register("ST_Area", st_area)
    spark.udf.register("ST_CentroidX", st_centroid_x)
    spark.udf.register("ST_CentroidY", st_centroid_y)
    spark.udf.register("ST_GeometryType", st_geometry_type)
    spark.udf.register("ST_AsText", st_astext)
    spark.udf.register("ST_ContainsPoint", st_contains_point)
    spark.udf.register("ST_MakePoint", st_makepoint)
    spark.udf.register("ST_Intersects", st_intersects)
    spark.udf.register("ST_Contains", st_contains)
    spark.udf.register("ST_ConvexHull", st_convexhull)
    spark.udf.register("ST_Union", st_union)
    spark.udf.register("ST_Intersection", st_intersection)
    spark.udf.register("ST_Difference", st_difference)
    spark.udf.register("ST_Touches", st_touches)
    spark.udf.register("ST_Overlaps", st_overlaps)
    spark.udf.register("ST_Equals", st_equals)
    spark.udf.register("ST_Covers", st_covers)
    spark.udf.register("ST_Disjoint", st_disjoint)
    spark.udf.register("ST_Crosses", st_crosses)
    spark.udf.register("ST_MakeValid", st_makevalid)
    spark.udf.register("ST_Buffer", st_buffer)
    spark.udf.register("ST_SymDifference", st_symdifference)
    spark.udf.register("ST_PointOnSurface", st_pointonsurface)
    spark.udf.register("ST_Length", st_length)
    spark.udf.register("ST_GeodesicLength", st_geodesic_length)
    spark.udf.register("ST_SphericalLength", st_spherical_length)
    spark.udf.register("ST_SphericalArea", st_spherical_area)
    spark.udf.register("ST_IsValid", st_isvalid)
    spark.udf.register("ST_IsValidReason", st_isvalid_reason)
    spark.udf.register("ST_GeomFromText", st_geomfromtext)
    spark.udf.register("ST_GeomFromWKB", st_asbinary)
    spark.udf.register("ST_AsBinary", st_asbinary)
    spark.udf.register("ST_SRID", st_srid)
    spark.udf.register("ST_GeodesicArea", st_geodesic_area)
    spark.udf.register("ST_ConcaveHull", st_concavehull)
    spark.udf.register("ST_Distance", st_distance)
    spark.udf.register("ST_Normalize", st_normalize)
    spark.udf.register("ST_SetPrecision", st_setprecision)
    spark.udf.register("ST_Segmentize", st_segmentize)
    spark.udf.register("ST_Dump", st_dump)
    spark.udf.register("ST_X", st_x)
    spark.udf.register("ST_Y", st_y)
    spark.udf.register("ST_SwapXY", st_swapxy)
    spark.udf.register("ST_NPoints", st_npoints)


@F.pandas_udf(T.BinaryType())
def st_simplify_tol1(geoms):
    """ST_Simplify with tolerance 1.0 (Douglas-Peucker over packed rings —
    kernels/simplify.py; OGR delegates to GEOS, ogrgeometry.cpp:6778).
    Fixed tolerance because pandas UDFs take columns; parametrize via
    partial registration when needed."""
    import pandas as pd

    from ..kernels import simplify as SIMP

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        if pg.geom_type != "Polygon":
            out.append(bytes(g))
            continue
        rings = []
        for xs, ys in pg.rings():
            sx, sy = SIMP.simplify_ring(xs, ys, 1.0)
            rings.append(list(zip(sx.tolist(), sy.tolist())))
        out.append(W.polygon_wkb(rings))
    return pd.Series(out)


@F.pandas_udf(T.BooleanType())
def st_intersects(ga, gb):
    """ST_Intersects over two WKB columns — the closed-form polygon x
    polygon kernel (kernels/polypoly.py; strict-interior semantics, the
    GEOS-prepared slot of OGR2SQLITE_ST_int_geomgeom_op)."""
    import pandas as pd

    from ..kernels import polypoly as PP

    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(PP.polygons_intersect(W.parse_wkb(bytes(a)),
                                         W.parse_wkb(bytes(b))))
    return pd.Series(out)


@F.pandas_udf(T.BooleanType())
def st_contains(ga, gb):
    """ST_Contains(A, B): A strictly contains B (kernels/polypoly.py)."""
    import pandas as pd

    from ..kernels import polypoly as PP

    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(PP.polygon_contains_polygon(W.parse_wkb(bytes(a)),
                                               W.parse_wkb(bytes(b))))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def st_convexhull(geoms):
    """ST_ConvexHull over a WKB column (Andrew monotone chain — no GEOS;
    `gdal vector convex-hull` step analog)."""
    import pandas as pd

    from ..kernels import polypoly as PP

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        hull = PP.convex_hull(pg.xs, pg.ys)
        out.append(W.polygon_wkb([hull]))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def st_cliprect_10x10(geoms):
    """ST clip against the fixed rect [-10,-10]x[10,10] (Sutherland-
    Hodgman, kernels/clip.py). Fixed window because pandas UDFs take
    columns; parametrize via partial registration when needed."""
    import pandas as pd

    from ..kernels import clip as CL

    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        pg = W.parse_wkb(bytes(g))
        rings = []
        ring_i = 0
        for nr in pg.part_rings:
            for _ in range(int(nr)):
                s, e = pg.ring_offsets[ring_i], pg.ring_offsets[ring_i + 1]
                cx, cy = CL.sh_clip_ring(pg.xs[s:e], pg.ys[s:e],
                                         -10.0, -10.0, 10.0, 10.0)
                ring_i += 1
                if len(cx) >= 3:
                    rings.append(list(zip(cx.tolist(), cy.tolist())))
        out.append(W.polygon_wkb(rings) if rings else None)
    return pd.Series(out)
