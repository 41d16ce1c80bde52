"""Curve geometry ingest: stroke CircularString / CompoundCurve /
CurvePolygon / MultiCurve / MultiSurface WKB to linear WKB at read.

The reference linearizes curve types on demand via ``OGR_GT_GetLinear``
(/root/reference/ogr/ogr_core.h:621) with the arc discretization in
``OGRGeometryFactory::curveToLineString``
(/root/reference/ogr/ogrgeometryfactory.cpp:6071): per 3-point arc,
circle parameters from ``GetCurveParameters`` (:5809 — scale-normalized
perpendicular-bisector intersection, CCW/CW from the determinant sign,
full-circle special case when p0 == p2), a binary-symmetry endpoint
swap (``OGRGF_NeedSwithArcOrder`` :6014 — so the same arc followed in
either direction strokes to bitwise-mirrored points), and uniform-angle
stepping (``OGRGeometryFactoryStrokeArc`` :5906 — nSteps =
trunc(|Δα|/step + 0.5), floor 4, default step 4° =
``OGR_ARC_STEPSIZE``). This port implements the documented
``ADD_INTERMEDIATE_POINT=YES`` mode (the intermediate point is emitted
explicitly); the STEALTH default exists only to round-trip back to
curves via hidden low-significant bits, which a linear-only data model
never does.

Everything here is exact transliteration-grade arithmetic: with
integer/dyadic control points the circle parameters are exact IEEE
doubles, so a SQL oracle reproduces every stroked vertex bit-for-bit
(libm cos/sin/atan2 are shared with DuckDB on this platform; gate
outputs are quantized to 2^-20 px like the contour tier regardless).
"""

from __future__ import annotations

import math
import struct

# WKB geometry type codes (2-D)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION = 4, 5, 6, 7
CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON = 8, 9, 10
MULTICURVE, MULTISURFACE = 11, 12

DEFAULT_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (ogrgeometryfactory.cpp:4735)

_CURVED = {CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON,
           MULTICURVE, MULTISURFACE}


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """GetCurveParameters (ogrgeometryfactory.cpp:5809): circle through
    three points -> (R, cx, cy, alpha0, alpha1, alpha2) with the
    monotone angle convention, or None when degenerate/collinear."""
    if any(math.isnan(v) for v in (x0, y0, x1, y1, x2, y2)):
        return None
    if x0 == x2 and y0 == y2:  # full circle, CCW like PostGIS
        if x0 == x1 and y0 == y1:
            return None
        cx = (x0 + x1) / 2
        cy = (y0 + y1) / 2
        # DISTANCE macro (ogrgeometryfactory.cpp:4759): sqrt of squares,
        # NOT hypot — bit-different, and sqrt is the cross-engine-exact op
        r = math.sqrt((x0 - cx) * (x0 - cx) + (y0 - cy) * (y0 - cy))
        a0 = math.atan2(y0 - cy, x0 - cx)
        return r, cx, cy, a0, a0 + math.pi, a0 + 2 * math.pi

    dx01 = x1 - x0
    dy01 = y1 - y0
    dx12 = x2 - x1
    dy12 = y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return None
    x01_mid = (x0 + x1) * inv
    x12_mid = (x1 + x2) * inv
    y01_mid = (y0 + y1) * inv
    y12_mid = (y1 + y2) * inv
    c01 = dx01 * x01_mid + dy01 * y01_mid
    c12 = dx12 * x12_mid + dy12 * y12_mid
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    r = math.sqrt((x0 - cx) * (x0 - cx) + (y0 - cy) * (y0 - cy))
    if det < 0:
        if a1 > a0:
            a1 -= 2 * math.pi
        if a2 > a1:
            a2 -= 2 * math.pi
    else:
        if a1 < a0:
            a1 += 2 * math.pi
        if a2 < a1:
            a2 += 2 * math.pi
    return r, cx, cy, a0, a1, a2


def _stroke_arc(out, cx, cy, r, alpha0, alpha1, step):
    """OGRGeometryFactoryStrokeArc (:5906), non-stealth: intermediate
    vertices strictly between alpha0 and alpha1 at uniform angles.
    One deliberate deviation: angles are formed as alpha0 + k*d rather
    than the reference's cumulative `alpha += d` — identical up to the
    accumulation's last-ulp rounding, and exactly reproducible by a SQL
    oracle (k*d has no running state)."""
    sign = 1 if step > 0 else -1
    nsteps = int(abs((alpha1 - alpha0) / step) + 0.5)
    if nsteps < 4:
        nsteps = 4
    d = sign * abs((alpha1 - alpha0) / nsteps)
    for k in range(1, nsteps + 1):
        alpha = alpha0 + k * d
        if not (alpha - alpha1) * sign < -1e-8:
            break
        out.append((cx + r * math.cos(alpha), cy + r * math.sin(alpha)))


def arc_to_points(x0, y0, x1, y1, x2, y2, step_deg=DEFAULT_STEP_DEG):
    """curveToLineString (:6071) for one 3-point arc, with the
    NeedSwitchArcOrder binary-symmetry rule and explicit intermediate
    point: returns the full [p0, ..., p1, ..., p2] vertex list."""
    if x0 < x2 or (x0 == x2 and y0 < y2):  # OGRGF_NeedSwithArcOrder
        pts = arc_to_points(x2, y2, x1, y1, x0, y0, step_deg)
        return pts[::-1]
    params = get_curve_parameters(x0, y0, x1, y1, x2, y2)
    if params is None:
        return [(x0, y0), (x1, y1), (x2, y2)]
    r, cx, cy, a0, a1, a2 = params
    sign = 1 if a1 >= a0 else -1
    step = max(step_deg, 0.01) / 180.0 * math.pi * sign
    out = [(x0, y0)]
    _stroke_arc(out, cx, cy, r, a0, a1, step)
    out.append((x1, y1))
    _stroke_arc(out, cx, cy, r, a1, a2, step)
    out.append((x2, y2))
    return out


def circularstring_to_points(pts, step_deg=DEFAULT_STEP_DEG):
    """Stroke a CircularString point list (triples (0,1,2), (2,3,4), …;
    shared junction vertices emitted once)."""
    if len(pts) < 3 or len(pts) % 2 == 0:
        raise ValueError(f"CircularString needs odd >= 3 points, got "
                         f"{len(pts)}")
    out = []
    for i in range(0, len(pts) - 2, 2):
        seg = arc_to_points(*pts[i], *pts[i + 1], *pts[i + 2], step_deg)
        out.extend(seg if i == 0 else seg[1:])
    return out


# --- WKB plumbing ---------------------------------------------------------

def _rd_header(buf, off):
    endian = "<" if buf[off] == 1 else ">"
    (raw,) = struct.unpack_from(endian + "I", buf, off + 1)
    # Shared flag decoding with wkb.py — curve detection and the
    # linearizer must agree on the base type (ISO offsets + EWKB bits).
    from .wkb import decode_wkb_type

    gtype, has_z, has_m, has_srid = decode_wkb_type(raw)
    if has_z or has_m:
        # Every point reader here assumes 2 doubles per point; masking
        # the dimension away would misparse Z/M curves into garbage
        # vertices (the reference's curveToLineString carries z through;
        # this engine's data model is 2-D) — fail loudly.
        raise NotImplementedError(
            f"Z/M curve WKB (raw type 0x{raw:08x}) is not supported: "
            "the engine's data model is 2-D"
        )
    if has_srid:
        raise NotImplementedError(
            f"EWKB embedded-SRID curve WKB (raw type 0x{raw:08x}) is "
            "not supported: strip the SRID word (ISO WKB) before ingest"
        )
    return endian, gtype, off + 5


def _rd_points(buf, off, endian):
    (n,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    pts = []
    for _ in range(n):
        x, y = struct.unpack_from(endian + "dd", buf, off)
        pts.append((x, y))
        off += 16
    return pts, off


def _wr(gtype, payload):
    return struct.pack("<BI", 1, gtype) + payload


def _wr_points(pts):
    return struct.pack("<I", len(pts)) + b"".join(
        struct.pack("<dd", x, y) for x, y in pts)


def _linearize_curve_body(buf, off, endian, gtype, step_deg):
    """Read one curve component (LineString/CircularString/CompoundCurve
    body at off) -> (point list, new offset)."""
    if gtype == LINESTRING:
        return _rd_points(buf, off, endian)
    if gtype == CIRCULARSTRING:
        pts, off = _rd_points(buf, off, endian)
        return circularstring_to_points(pts, step_deg), off
    if gtype == COMPOUNDCURVE:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        out = []
        for i in range(n):
            e2, t2, off = _rd_header(buf, off)
            pts, off = _linearize_curve_body(buf, off, e2, t2, step_deg)
            out.extend(pts if i == 0 else pts[1:])
        return out, off
    raise NotImplementedError(f"curve component type {gtype}")


def linearize_wkb(buf: bytes, step_deg=DEFAULT_STEP_DEG) -> bytes:
    """Stroke curved WKB to linear WKB (the OGR_GT_GetLinear read
    contract): CircularString/CompoundCurve -> LineString, CurvePolygon
    -> Polygon, MultiCurve -> MultiLineString, MultiSurface ->
    MultiPolygon. Linear types pass through unchanged."""
    buf = bytes(buf)
    endian, gtype, off = _rd_header(buf, 0)
    if gtype not in _CURVED:
        return buf
    if gtype in (CIRCULARSTRING, COMPOUNDCURVE):
        pts, _ = _linearize_curve_body(buf, off, endian, gtype, step_deg)
        return _wr(LINESTRING, _wr_points(pts))
    if gtype == CURVEPOLYGON:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(n):
            e2, t2, off = _rd_header(buf, off)
            pts, off = _linearize_curve_body(buf, off, e2, t2, step_deg)
            rings.append(pts)
        payload = struct.pack("<I", len(rings)) + b"".join(
            _wr_points(r) for r in rings)
        return _wr(POLYGON, payload)
    # MultiCurve / MultiSurface: linearize each member geometry
    (n,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    parts = []
    for _ in range(n):
        member, off = _linearize_member(buf, off, step_deg)
        parts.append(member)
    out_type = MULTILINESTRING if gtype == MULTICURVE else MULTIPOLYGON
    return _wr(out_type, struct.pack("<I", len(parts)) + b"".join(parts))


def _linearize_member(buf, off, step_deg):
    """Linearize the full WKB geometry starting at off; returns
    (linear WKB bytes, offset past the member)."""
    endian, gtype, boff = _rd_header(buf, off)
    if gtype in (LINESTRING, CIRCULARSTRING, COMPOUNDCURVE):
        pts, end = _linearize_curve_body(buf, boff, endian, gtype, step_deg)
        if gtype == LINESTRING:
            return buf[off:end], end
        return _wr(LINESTRING, _wr_points(pts)), end
    if gtype in (POLYGON, CURVEPOLYGON):
        (n,) = struct.unpack_from(endian + "I", buf, boff)
        boff += 4
        rings = []
        for _ in range(n):
            if gtype == POLYGON:
                pts, boff = _rd_points(buf, boff, endian)
            else:
                e2, t2, boff2 = _rd_header(buf, boff)
                pts, boff = _linearize_curve_body(buf, boff2, e2, t2,
                                                  step_deg)
            rings.append(pts)
        payload = struct.pack("<I", len(rings)) + b"".join(
            _wr_points(r) for r in rings)
        return _wr(POLYGON, payload), boff
    raise NotImplementedError(f"multi-member type {gtype}")
