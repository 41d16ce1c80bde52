"""Curve geometry ingest (OGR_GT_GetLinear contract;
ogrgeometryfactory.cpp curveToLineString/GetCurveParameters/StrokeArc).
The CircularString stroking itself is hash-gated vs a full SQL
transliteration (entry_queries.sql_curve_linearize); these tests pin
the container assembly and the reference's documented invariants."""

import math
import struct

import pytest

from osgeo_gdal_spark.kernels import curves as CV


def cs_wkb(pts):
    return struct.pack("<BI", 1, CV.CIRCULARSTRING) + CV._wr_points(
        [(float(x), float(y)) for x, y in pts])


def ls_wkb(pts):
    return struct.pack("<BI", 1, CV.LINESTRING) + CV._wr_points(
        [(float(x), float(y)) for x, y in pts])


def read_line(buf):
    e, t, off = CV._rd_header(buf, 0)
    assert t == CV.LINESTRING
    pts, _ = CV._rd_points(buf, off, e)
    return pts


def test_arc_direction_symmetry():
    """curveToLineString doc guarantee: the same arc with swapped first/
    final point returns exactly reversed vertices (binary identical)."""
    fwd = read_line(CV.linearize_wkb(cs_wkb([(2, 0), (1, 1), (0, 0)])))
    rev = read_line(CV.linearize_wkb(cs_wkb([(0, 0), (1, 1), (2, 0)])))
    assert rev == fwd[::-1]
    assert len(fwd) == 47  # 90deg halves at 4deg: 22 intermediates each


def test_arc_chord_radius_invariant():
    """Every stroked vertex of a true arc lies on the circle."""
    pts = read_line(CV.linearize_wkb(cs_wkb([(10, 3), (6, 7), (2, 3)])))
    for x, y in pts:
        assert math.isclose(math.hypot(x - 6, y - 3), 4.0, rel_tol=1e-12)


def test_full_circle_and_collinear():
    circ = read_line(CV.linearize_wkb(cs_wkb([(0, 0), (2, 0), (0, 0)])))
    assert circ[0] == circ[-1] == (0.0, 0.0)
    assert len(circ) == 91  # two half-circles, 44 intermediates each
    line = read_line(CV.linearize_wkb(cs_wkb([(0, 0), (1, 1), (2, 2)])))
    assert line == [(0, 0), (1, 1), (2, 2)]


def test_linear_passthrough_and_bad_input():
    w = ls_wkb([(0, 0), (1, 1)])
    assert CV.linearize_wkb(w) == w
    with pytest.raises(ValueError):
        CV.circularstring_to_points([(0, 0), (1, 1)])  # even point count


def test_compound_curve_concat():
    """CompoundCurve = LineString + CircularString; shared junction
    vertex emitted once, arc part identical to the standalone stroke."""
    cc = (struct.pack("<BII", 1, CV.COMPOUNDCURVE, 2)
          + ls_wkb([(5, 0), (2, 0)])
          + cs_wkb([(2, 0), (1, 1), (0, 0)]))
    got = read_line(CV.linearize_wkb(cc))
    arc = read_line(CV.linearize_wkb(cs_wkb([(2, 0), (1, 1), (0, 0)])))
    assert got == [(5.0, 0.0)] + arc


def test_curve_polygon_rings():
    """CurvePolygon -> Polygon: full-circle exterior ring stays closed,
    linear hole passes through untouched."""
    hole = [(1.5, 0.5), (2.5, 0.5), (2.5, -0.5), (1.5, -0.5), (1.5, 0.5)]
    cp = (struct.pack("<BII", 1, CV.CURVEPOLYGON, 2)
          + cs_wkb([(0, 0), (4, 0), (0, 0)])
          + ls_wkb(hole))
    out = CV.linearize_wkb(cp)
    e, t, off = CV._rd_header(out, 0)
    assert t == CV.POLYGON
    (nr,) = struct.unpack_from("<I", out, off)
    assert nr == 2
    r0, off2 = CV._rd_points(out, off + 4, "<")
    r1, _ = CV._rd_points(out, off2, "<")
    assert r0[0] == r0[-1]
    assert r1 == hole
    # shoelace area of the stroked circle approximates pi*R^2 (R=2)
    area = 0.0
    for (x0, y0), (x1, y1) in zip(r0, r0[1:]):
        area += x0 * y1 - x1 * y0
    assert abs(abs(area) / 2 - math.pi * 4) < 0.02


def test_multicurve_multisurface():
    mc = (struct.pack("<BII", 1, CV.MULTICURVE, 2)
          + cs_wkb([(2, 0), (1, 1), (0, 0)])
          + ls_wkb([(9, 9), (8, 8)]))
    out = CV.linearize_wkb(mc)
    e, t, off = CV._rd_header(out, 0)
    assert t == CV.MULTILINESTRING
    (n,) = struct.unpack_from("<I", out, off)
    assert n == 2
    ms = (struct.pack("<BII", 1, CV.MULTISURFACE, 1)
          + struct.pack("<BII", 1, CV.CURVEPOLYGON, 1)
          + cs_wkb([(0, 0), (2, 0), (0, 0)]))
    out2 = CV.linearize_wkb(ms)
    e, t, off = CV._rd_header(out2, 0)
    assert t == CV.MULTIPOLYGON
    (n,) = struct.unpack_from("<I", out2, off)
    assert n == 1


def test_st_linearize_udf(spark):
    """The pandas UDF path: curve in, linear out; linear passthrough is
    byte-identical (so a reader can apply it unconditionally)."""
    from pyspark.sql import functions as F

    from osgeo_gdal_spark.functions import st as ST

    rows = [(1, cs_wkb([(2, 0), (1, 1), (0, 0)])),
            (2, ls_wkb([(0, 0), (3, 4)]))]
    df = spark.createDataFrame(rows, "fid INT, wkb BINARY")
    got = {r["fid"]: bytes(r["lw"]) for r in
           df.select("fid", ST.st_linearize(F.col("wkb")).alias("lw"))
           .collect()}
    assert len(read_line(got[1])) == 47
    assert got[2] == rows[1][1]


def test_parse_wkb_linearizes_curves_on_read():
    """kernels/wkb.parse_wkb accepts curve WKB directly (the
    OGR_GT_GetLinear read contract): CircularString parses as a stroked
    LineString, CurvePolygon as a Polygon with the disk's area."""
    from osgeo_gdal_spark.kernels import wkb as W

    pg = W.parse_wkb(cs_wkb([(2, 0), (1, 1), (0, 0)]))
    assert pg.geom_type == "LineString" and len(pg.xs) == 47
    cp = (struct.pack("<BII", 1, CV.CURVEPOLYGON, 1)
          + cs_wkb([(0, 0), (4, 0), (0, 0)]))
    poly = W.parse_wkb(cp)
    assert poly.geom_type == "Polygon"
    assert abs(W.polygon_area(poly) - math.pi * 4) < 0.02


def test_arc_property_suite():
    """Derandomized property sweep over random integer arcs: every
    stroked intermediate lies on the circumcircle (1e-9 relative), the
    three control points are always present exactly, and reversal
    symmetry holds bitwise (curveToLineString's documented guarantee)."""
    import random

    rng = random.Random(20260817)
    checked = 0
    for _ in range(300):
        p0 = (rng.randint(-20, 20), rng.randint(-20, 20))
        p1 = (rng.randint(-20, 20), rng.randint(-20, 20))
        p2 = (rng.randint(-20, 20), rng.randint(-20, 20))
        if len({p0, p1, p2}) < 3:
            continue
        pts = CV.arc_to_points(*p0, *p1, *p2)
        rev = CV.arc_to_points(*p2, *p1, *p0)
        assert rev == pts[::-1]
        assert pts[0] == (float(p0[0]), float(p0[1]))
        assert pts[-1] == (float(p2[0]), float(p2[1]))
        assert (float(p1[0]), float(p1[1])) in pts
        params = CV.get_curve_parameters(*p0, *p1, *p2)
        if params is None:
            assert pts == [tuple(map(float, p)) for p in (p0, p1, p2)]
            continue
        r, cx, cy, a0, a1, a2 = params
        for x, y in pts:
            d = math.sqrt((x - cx) ** 2 + (y - cy) ** 2)
            assert abs(d - r) <= 1e-9 * max(r, 1.0), (p0, p1, p2, x, y)
        checked += 1
    assert checked > 200  # the degenerate fraction stays small


def test_zm_srid_flag_wkb_rejected_loudly():
    """ADVICE r6: Z/M and EWKB-SRID type flags must raise, not be
    masked into a 2-D misparse; wkb.py and curves.py share one flag
    decoder so curve detection and the linearizer always agree."""
    from osgeo_gdal_spark.kernels import wkb as WKB

    # shared decoder: ISO offsets and EWKB bits map to the same base
    assert WKB.decode_wkb_type(8) == (8, False, False, False)
    assert WKB.decode_wkb_type(1008) == (8, True, False, False)
    assert WKB.decode_wkb_type(2008) == (8, False, True, False)
    assert WKB.decode_wkb_type(3008) == (8, True, True, False)
    assert WKB.decode_wkb_type(0x80000008) == (8, True, False, False)
    assert WKB.decode_wkb_type(0x40000008) == (8, False, True, False)
    assert WKB.decode_wkb_type(0x20000008) == (8, False, False, True)

    body = struct.pack("<I", 3) + struct.pack("<9d", 0, 0, 0, 1, 1, 0, 2, 0, 0)
    for raw in (1008, 0x80000008, 0x20000008):
        buf = struct.pack("<BI", 1, raw) + body
        with pytest.raises(NotImplementedError):
            WKB.parse_wkb(buf)
        with pytest.raises(NotImplementedError):
            CV.linearize_wkb(buf)

    # 2-D linear + curve types still parse
    pt = struct.pack("<BI", 1, 1) + struct.pack("<dd", 3.0, 4.0)
    g = WKB.parse_wkb(pt)
    assert g.geom_type == "Point" and g.xs[0] == 3.0
