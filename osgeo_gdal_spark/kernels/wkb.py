"""Minimal WKB codec -> packed coordinate arrays.

The engine's native geometry encoding is ISO WKB bytes in a BinaryType
column (mirroring OGR's canonical interchange,
``/root/reference/ogr/ogrgeometry.cpp:1501`` importFromWkb / ``:1596``
exportToWkb). Kernels parse WKB into *packed ring arrays* — a flat
``(ring_offsets, xs, ys)`` triple — the layout every vectorized geometry
kernel (PIP, envelope, centroid, area) operates on.

v1 scope: 2-D Point, LineString, Polygon, MultiPolygon, little- and
big-endian, no Z/M (curve types are linearized by GDAL itself before most
ops — ``ogr_core.h:621``).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6


class PackedGeometry:
    """Packed representation: per-part ring offsets + flat coord arrays.

    ``ring_offsets[i]:ring_offsets[i+1]`` slices ring i out of xs/ys.
    ``part_rings[j]`` = number of rings in polygon part j (for multipolys);
    ring 0 of each part is the exterior ring (OGR convention,
    ``ogrpolygon.cpp:780``).
    """

    __slots__ = ("geom_type", "ring_offsets", "xs", "ys", "part_rings")

    def __init__(self, geom_type, ring_offsets, xs, ys, part_rings):
        self.geom_type = geom_type
        self.ring_offsets = ring_offsets
        self.xs = xs
        self.ys = ys
        self.part_rings = part_rings

    def envelope(self):
        """(xmin, ymin, xmax, ymax) — the bbox sidecar value."""
        return (
            float(self.xs.min()),
            float(self.ys.min()),
            float(self.xs.max()),
            float(self.ys.max()),
        )

    def rings(self):
        """Yield (xs, ys) per ring."""
        for i in range(len(self.ring_offsets) - 1):
            s, e = self.ring_offsets[i], self.ring_offsets[i + 1]
            yield self.xs[s:e], self.ys[s:e]


def decode_wkb_type(raw):
    """Decode a raw WKB geometry-type word into
    ``(base_type, has_z, has_m, has_srid)``.

    Handles BOTH flag conventions the reference accepts
    (ogrgeometry.cpp importFromWkb): ISO dimension offsets
    (base + 1000 Z / 2000 M / 3000 ZM) and EWKB bit flags
    (0x80000000 Z, 0x40000000 M, 0x20000000 embedded SRID).
    Shared by wkb.py and curves.py so curve detection and the
    linearizer can never disagree on the base type.
    """
    has_z = bool(raw & 0x80000000)
    has_m = bool(raw & 0x40000000)
    has_srid = bool(raw & 0x20000000)
    base = raw & 0x0FFFFFFF
    dim = base // 1000
    base = base % 1000
    if dim in (1, 3):
        has_z = True
    if dim in (2, 3):
        has_m = True
    return base, has_z, has_m, has_srid


def _read_header(buf, off):
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (raw,) = struct.unpack_from(endian + "I", buf, off + 1)
    gtype, has_z, has_m, has_srid = decode_wkb_type(raw)
    if has_z or has_m:
        # The 2-D data model is a declared scope boundary (SURVEY §1.1);
        # masking the flag would misparse the 3rd ordinate as the next
        # point's x — fail loudly instead.
        raise NotImplementedError(
            f"Z/M WKB geometry (raw type 0x{raw:08x}) is not supported: "
            "the engine's data model is 2-D"
        )
    if has_srid:
        raise NotImplementedError(
            f"EWKB embedded-SRID WKB (raw type 0x{raw:08x}) is not "
            "supported: strip the SRID word (ISO WKB) before ingest"
        )
    return endian, gtype, off + 5


def _read_coords(buf, off, n, endian):
    arr = np.frombuffer(buf, dtype=endian + "f8", count=2 * n, offset=off)
    return arr[0::2].copy(), arr[1::2].copy(), off + 16 * n


def parse_wkb(buf: bytes) -> PackedGeometry:
    """Parse WKB bytes into a PackedGeometry. Curve types
    (CircularString/CompoundCurve/CurvePolygon/MultiCurve/MultiSurface)
    are LINEARIZED on read — the reference's OGR_GT_GetLinear ingest
    contract (ogr/ogr_core.h:621; kernels/curves.py), so a
    curve-bearing layer (e.g. GPKG) is stroked, never rejected."""
    endian, gtype, off = _read_header(buf, 0)
    if 8 <= gtype <= 12:
        from . import curves as _CV

        linear = _CV.linearize_wkb(bytes(buf))
        if linear == bytes(buf):
            # Guard against infinite recursion: the linearizer must
            # rewrite every curve type it claims to accept.
            raise ValueError(
                f"linearize_wkb returned curve type {gtype} unchanged"
            )
        return parse_wkb(linear)
    if gtype == WKB_POINT:
        xs, ys, off = _read_coords(buf, off, 1, endian)
        return PackedGeometry("Point", np.array([0, 1]), xs, ys, np.array([1]))
    if gtype == WKB_LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        xs, ys, off = _read_coords(buf, off + 4, n, endian)
        return PackedGeometry("LineString", np.array([0, n]), xs, ys, np.array([1]))
    if gtype == WKB_POLYGON:
        offsets, xs, ys, off = _parse_polygon_body(buf, off, endian)
        return PackedGeometry(
            "Polygon", offsets, xs, ys, np.array([len(offsets) - 1])
        )
    if gtype == WKB_MULTIPOLYGON:
        (nparts,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        all_off = [0]
        all_xs, all_ys, part_rings = [], [], []
        for _ in range(nparts):
            pendian, pg, off = _read_header(buf, off)
            if pg != WKB_POLYGON:
                raise ValueError(f"multipolygon part has type {pg}")
            offs, xs, ys, off = _parse_polygon_body(buf, off, pendian)
            base = all_off[-1]
            all_off.extend((offs[1:] + base).tolist())
            all_xs.append(xs)
            all_ys.append(ys)
            part_rings.append(len(offs) - 1)
        return PackedGeometry(
            "MultiPolygon",
            np.asarray(all_off, dtype=np.int64),
            np.concatenate(all_xs) if all_xs else np.empty(0),
            np.concatenate(all_ys) if all_ys else np.empty(0),
            np.asarray(part_rings, dtype=np.int64),
        )
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _parse_polygon_body(buf, off, endian):
    (nrings,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    offsets = [0]
    xs_list, ys_list = [], []
    for _ in range(nrings):
        (n,) = struct.unpack_from(endian + "I", buf, off)
        xs, ys, off = _read_coords(buf, off + 4, n, endian)
        offsets.append(offsets[-1] + n)
        xs_list.append(xs)
        ys_list.append(ys)
    return (
        np.asarray(offsets, dtype=np.int64),
        np.concatenate(xs_list) if xs_list else np.empty(0),
        np.concatenate(ys_list) if ys_list else np.empty(0),
        off,
    )


def point_wkb(x: float, y: float) -> bytes:
    """Little-endian WKB Point."""
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def polygon_wkb(rings) -> bytes:
    """Little-endian WKB Polygon from [(x,y), ...] rings.

    Rings are closed automatically if first != last point.
    """
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(struct.pack("<I", len(pts)))
        for x, y in pts:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    """Little-endian WKB MultiPolygon from [[ring, ...], ...]."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed shoelace area of one closed ring (CCW positive)."""
    return float(0.5 * np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def polygon_area(geom: PackedGeometry) -> float:
    """|exterior| - |holes| summed over parts (planar, like OGR get_Area)."""
    total = 0.0
    ring_i = 0
    for nrings in geom.part_rings:
        for j in range(int(nrings)):
            s, e = geom.ring_offsets[ring_i], geom.ring_offsets[ring_i + 1]
            a = abs(shoelace_area(geom.xs[s:e], geom.ys[s:e]))
            total += a if j == 0 else -a
            ring_i += 1
    return total


def centroid(geom: PackedGeometry):
    """Area-weighted centroid (shoelace formula), holes subtracted,
    orientation normalized per ring (mirrors ogrgeometry.cpp:6526 semantics).
    """
    cx_acc = cy_acc = a_acc = 0.0
    ring_i = 0
    for nrings in geom.part_rings:
        for j in range(int(nrings)):
            s, e = geom.ring_offsets[ring_i], geom.ring_offsets[ring_i + 1]
            xs, ys = geom.xs[s:e], geom.ys[s:e]
            cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
            a = 0.5 * np.sum(cross)
            if a != 0:
                cx = np.sum((xs[:-1] + xs[1:]) * cross) / (6.0 * a)
                cy = np.sum((ys[:-1] + ys[1:]) * cross) / (6.0 * a)
                w = abs(a) * (1.0 if j == 0 else -1.0)
                cx_acc += cx * w
                cy_acc += cy * w
                a_acc += w
            ring_i += 1
    if a_acc == 0:
        return float(np.mean(geom.xs)), float(np.mean(geom.ys))
    return cx_acc / a_acc, cy_acc / a_acc


def linestring_wkb(pts) -> bytes:
    """[(x, y), ...] -> little-endian WKB LineString."""
    import struct

    out = struct.pack("<BII", 1, WKB_LINESTRING, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", float(x), float(y))
    return out
