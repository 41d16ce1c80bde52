"""General polygon boolean overlay (intersection / union / difference).

The geometry kernel behind layer-algebra Intersection / Union / Identity
(``/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385`` /
``:5803`` / ``:6770`` — the reference delegates the per-pair set
operation to GEOS ``OGRGeometry::Intersection``,
``ogr/ogrgeometry.cpp:4893``). The container has no GEOS/shapely, so
this is a self-contained edge-classification overlay — the classic
Weiler–Atherton / Greiner–Hormann family reduced to its planar-algebra
core:

1. every directed edge of A is split at its proper crossings with B
   (and vice versa); each crossing point is computed ONCE and shared by
   both sides, so ring-assembly keys match bit-exactly;
2. each sub-edge is classified by whether its midpoint lies strictly
   inside the other polygon (even-odd over the full ring soup — holes
   and multi-parts need no special cases);
3. the boolean op selects and orients sub-edges
   (``intersection``: A-in-B + B-in-A, both forward; ``union``:
   A-out-B + B-out-A, both forward; ``difference`` A−B: A-out-B
   forward + B-in-A reversed);
4. selected directed sub-edges are walked into closed cycles: CCW
   cycles are shells, CW cycles are holes of the result.

Geometries are "ring soups": lists of open oriented ``(xs, ys)`` ring
pairs with even-odd interior semantics (shells CCW, holes CW). That
representation composes, so a union FOLD over many polygons (dissolve /
UnaryUnion, ``apps/gdalalg_vector_dissolve.cpp:120``) is just repeated
two-way overlay.

GENERAL-POSITION CONTRACT (same as kernels/polypoly.py): no
vertex-on-edge contacts, no collinear overlapping edges between the two
inputs. All fixture layers are built on mutually offset grids so ties
never arise; real-world data at these semantics would need a snapping
pass first (GEOS applies exactly the same caveat before its snap-based
overlay rewrite).
"""

from __future__ import annotations

import numpy as np

from . import pip as PIP
from .clip import ring_area
from .wkb import PackedGeometry, multipolygon_wkb, polygon_wkb

_AREA_EPS = 1e-12


def geometry_rings(g: PackedGeometry):
    """PackedGeometry -> ring soup: open rings, shells CCW, holes CW.

    WKB y-up shoelace: CCW == positive signed area. Ring 0 of each part
    is the shell; subsequent rings are holes.
    """
    out = []
    ring_i = 0
    for nrings in g.part_rings:
        for j in range(int(nrings)):
            s, e = g.ring_offsets[ring_i], g.ring_offsets[ring_i + 1]
            xs = np.asarray(g.xs[s:e], dtype=np.float64)
            ys = np.asarray(g.ys[s:e], dtype=np.float64)
            ring_i += 1
            if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
                xs, ys = xs[:-1], ys[:-1]
            if len(xs) < 3:
                continue
            a = ring_area(xs, ys)
            want_ccw = j == 0
            if (a > 0) != want_ccw:
                xs, ys = xs[::-1].copy(), ys[::-1].copy()
            out.append((xs, ys))
    return out


def rings_area(rings) -> float:
    """Even-odd area of a ring soup = sum of signed shoelace areas
    (shells positive, holes negative)."""
    return float(sum(ring_area(xs, ys) for xs, ys in rings))


def rings_envelope(rings):
    xs = np.concatenate([r[0] for r in rings])
    ys = np.concatenate([r[1] for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _points_in_rings(px, py, rings):
    """Strict even-odd containment over the whole ring soup: XOR of the
    per-ring crossing parities (reuses the exact ogrlinearring.cpp:452
    ray-cast port; closed copies are what points_in_ring expects)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for xs, ys in rings:
        cx = np.concatenate([xs, xs[:1]])
        cy = np.concatenate([ys, ys[:1]])
        inside ^= PIP.points_in_ring(px, py, cx, cy)
    return inside


def _edges(rings):
    """Directed edge arrays (x0, y0, x1, y1) of a ring soup, plus the
    per-edge ring index (unused by callers today, kept cheap)."""
    x0 = np.concatenate([xs for xs, _ in rings])
    y0 = np.concatenate([ys for _, ys in rings])
    x1 = np.concatenate([np.roll(xs, -1) for xs, _ in rings])
    y1 = np.concatenate([np.roll(ys, -1) for _, ys in rings])
    return x0, y0, x1, y1


def _split_subedges(x0, y0, x1, y1, cuts):
    """Split each directed edge at its crossing points.

    cuts: dict edge_index -> list of (t, px, py). Returns parallel lists
    of sub-edge endpoints (sx0, sy0, sx1, sy1) as Python floats.
    """
    s0x, s0y, s1x, s1y = [], [], [], []
    for i in range(len(x0)):
        pts = [(0.0, float(x0[i]), float(y0[i]))]
        pts += sorted(cuts.get(i, ()))
        pts.append((1.0, float(x1[i]), float(y1[i])))
        for (_, ax, ay), (_, bx, by) in zip(pts, pts[1:]):
            if ax == bx and ay == by:
                continue
            s0x.append(ax)
            s0y.append(ay)
            s1x.append(bx)
            s1y.append(by)
    return (np.array(s0x), np.array(s0y), np.array(s1x), np.array(s1y))


def _assemble(starts_x, starts_y, ends_x, ends_y):
    """Walk directed sub-edges into closed cycles. General position ⇒
    each node has matching in/out degree; multiple outgoing edges at a
    node (two crossings meeting at an original vertex) are consumed in
    arbitrary stable order."""
    succ = {}
    for i in range(len(starts_x)):
        succ.setdefault((starts_x[i], starts_y[i]), []).append(
            (ends_x[i], ends_y[i])
        )
    cycles = []
    while succ:
        start = next(iter(succ))
        path = [start]
        node = start
        ok = True
        while True:
            nxts = succ.get(node)
            if not nxts:
                ok = False  # dangling chain: degenerate input, drop it
                break
            nxt = nxts.pop()
            if not nxts:
                del succ[node]
            if nxt == start:
                break
            path.append(nxt)
            node = nxt
        if ok and len(path) >= 3:
            xs = np.array([p[0] for p in path])
            ys = np.array([p[1] for p in path])
            if abs(ring_area(xs, ys)) > _AREA_EPS:
                cycles.append((xs, ys))
    return cycles


def overlay_rings(rings_a, rings_b, op: str):
    """Boolean overlay of two ring soups -> result ring soup.

    op ∈ {intersection, union, difference, symdifference}.
    ``difference`` is A − B; ``symdifference`` composes the two
    interior-disjoint differences into one even-odd ring soup
    (OGRGeometry::SymDifference, ogrgeometry.cpp:5874).
    """
    if op == "symdifference":
        return (overlay_rings(rings_a, rings_b, "difference")
                + overlay_rings(rings_b, rings_a, "difference"))
    if not rings_a or not rings_b:
        if op == "intersection":
            return []
        if op == "union":
            return list(rings_a) + list(rings_b)
        return list(rings_a)

    ax0, ay0, ax1, ay1 = rings_envelope(rings_a)
    bx0, by0, bx1, by1 = rings_envelope(rings_b)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        if op == "intersection":
            return []
        if op == "union":
            return list(rings_a) + list(rings_b)
        return list(rings_a)

    ea = _edges(rings_a)
    eb = _edges(rings_b)

    # pairwise proper crossings: a0 + t·r = b0 + u·s, 0<t<1, 0<u<1
    rx = (ea[2] - ea[0])[:, None]
    ry = (ea[3] - ea[1])[:, None]
    sx = (eb[2] - eb[0])[None, :]
    sy = (eb[3] - eb[1])[None, :]
    qpx = eb[0][None, :] - ea[0][:, None]
    qpy = eb[1][None, :] - ea[1][:, None]
    rxs = rx * sy - ry * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * sy - qpy * sx) / rxs
        u = (qpx * ry - qpy * rx) / rxs
    cross = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)

    cuts_a: dict = {}
    cuts_b: dict = {}
    ia, ib = np.nonzero(cross)
    for i, j in zip(ia.tolist(), ib.tolist()):
        tv = float(t[i, j])
        uv = float(u[i, j])
        # the crossing point is computed ONCE (from A's parameterization)
        # and shared, so both sides' sub-edges meet at the SAME float pair
        px = float(ea[0][i]) + tv * float(ea[2][i] - ea[0][i])
        py = float(ea[1][i]) + tv * float(ea[3][i] - ea[1][i])
        cuts_a.setdefault(i, []).append((tv, px, py))
        cuts_b.setdefault(j, []).append((uv, px, py))

    sa = _split_subedges(*ea, cuts_a)
    sb = _split_subedges(*eb, cuts_b)

    mida = ((sa[0] + sa[2]) / 2.0, (sa[1] + sa[3]) / 2.0)
    midb = ((sb[0] + sb[2]) / 2.0, (sb[1] + sb[3]) / 2.0)
    a_in_b = _points_in_rings(mida[0], mida[1], rings_b)
    b_in_a = _points_in_rings(midb[0], midb[1], rings_a)

    if op == "intersection":
        ka, kb, flip_b = a_in_b, b_in_a, False
    elif op == "union":
        ka, kb, flip_b = ~a_in_b, ~b_in_a, False
    elif op == "difference":
        ka, kb, flip_b = ~a_in_b, b_in_a, True
    else:
        raise ValueError(op)

    if flip_b:
        kept_b = (sb[2][kb], sb[3][kb], sb[0][kb], sb[1][kb])
    else:
        kept_b = (sb[0][kb], sb[1][kb], sb[2][kb], sb[3][kb])
    starts_x = np.concatenate([sa[0][ka], kept_b[0]])
    starts_y = np.concatenate([sa[1][ka], kept_b[1]])
    ends_x = np.concatenate([sa[2][ka], kept_b[2]])
    ends_y = np.concatenate([sa[3][ka], kept_b[3]])
    return _assemble(
        starts_x.tolist(), starts_y.tolist(), ends_x.tolist(), ends_y.tolist()
    )


def union_all_rings(ring_soups):
    """UnaryUnion fold (dissolve kernel): union of many ring soups.

    Disjoint-envelope pairs short-circuit to concatenation inside
    overlay_rings, so a group of mostly-disjoint members costs one
    envelope test per member pair actually touched.
    """
    acc = []
    for rings in ring_soups:
        acc = overlay_rings(acc, rings, "union")
    return acc


def rings_to_wkb(rings) -> bytes:
    """Ring soup -> WKB: CCW cycles are shells, CW cycles are holes;
    each hole is assigned to the smallest shell whose interior contains
    its first vertex (general position ⇒ containment is unambiguous)."""
    shells = [(xs, ys) for xs, ys in rings if ring_area(xs, ys) > 0]
    holes = [(xs, ys) for xs, ys in rings if ring_area(xs, ys) < 0]
    if not shells:
        return polygon_wkb([])
    polys = [[list(zip(xs.tolist(), ys.tolist()))] for xs, ys in shells]
    order = sorted(
        range(len(shells)), key=lambda i: ring_area(*shells[i])
    )  # smallest shell first
    for hx, hy in holes:
        for i in order:
            if _points_in_rings(hx[:1], hy[:1], [shells[i]])[0]:
                polys[i].append(list(zip(hx.tolist(), hy.tolist())))
                break
    if len(polys) == 1:
        return polygon_wkb(polys[0])
    return multipolygon_wkb(polys)
