"""Snap-rounding overlay: boolean ops on NON-general-position inputs.

Closes the general-position contract gap named by kernels/
overlay_kernel.py and kernels/polypoly.py: real-world layers constantly
present vertex-on-edge (T) contacts and collinear overlapping (shared)
edges between the two inputs, which the crossing-only kernel refuses.
GEOS solved the same problem with a snap-rounding pass before its
overlay (the reference reaches it via ``OGRGeometry::Intersection``,
``/root/reference/ogr/ogrgeometry.cpp:4893``, and the layer-algebra
SNAP options, ``ogr/ogrsf_frmts/generic/ogrlayer.cpp:5402``).

Recipe (all per-pair, feature-sized — runs inside the same broadcast
Arrow kernel as the general-position overlay):

1. **Snap** both inputs to a power-of-two grid (ST_SetPrecision
   semantics; the default resolution derives from coordinate
   magnitude). Snapped coordinates are exact dyadic floats, so they
   convert losslessly to int64 LATTICE UNITS.
2. **Node exactly**: with integer endpoints, collinearity /
   on-segment / overlap tests are exact int64 arithmetic — no epsilon
   anywhere in the noding. Every edge is split at (a) proper crossings
   (the crossing point is computed ONCE in float and shared by both
   edges, so assembly keys match bit-exactly), (b) lattice vertices of
   the other input lying in its interior (T-contacts), and (c)
   endpoints of collinear overlapping segments.
3. **Classify by side-sampling**: a noded sub-segment lies on the
   result boundary iff the op's predicate (inA ∧ inB for intersection,
   inA ∨ inB for union, inA ∧ ¬inB for difference) differs between the
   two sides of the segment. Sides are probed at midpoint ± ε·n̂ with ε
   halved until both probes are strictly off every edge of both inputs
   — the polypoly face-witness move. Coincident (shared) sub-segments
   collapse to one before probing.
4. **Orient interior-on-left and face-walk**: kept segments are
   directed so the result interior lies to their left (shells come out
   CCW, holes CW). Assembly picks, at every node, the first outgoing
   edge CLOCKWISE from the reversed incoming direction — the planar
   face-traversal successor rule — which stays correct at the degree-4
   nodes (corner contacts) the general-position walker never sees.

Contract notes:
- Output is the AREAL (dimension-2) component: boundary-only contacts
  (shared edges of an intersection, touching corners) produce no rings,
  where GEOS would return lower-dimensional geometries.
- Snapping is a real geometric perturbation of up to grid/2 per vertex
  — identical to what ST_SetPrecision + GEOS snap-rounding does.
"""

from __future__ import annotations

import math

import numpy as np

from .clip import ring_area
from .overlay_kernel import (
    _points_in_rings,
    geometry_rings,
    rings_area,
    rings_envelope,
    rings_to_wkb,
)

# lattice extent bound: |coord|/grid < 2^25 keeps every cross/dot
# product within 2^51 — exact in int64 AND in float64
_MAX_LATTICE = 1 << 25


def default_grid(rings_a, rings_b) -> float:
    """Snap resolution derived from coordinate magnitude (the
    SetPrecision auto rule): 2^(e-23) for the smallest power of two
    2^e >= max|coord| — ~7 decimal digits of relative precision
    (float32-grade, far above double noise), and a lattice extent of
    2^24 that stays inside the kernel's exact-int64 bound (2^25)."""
    m = 1.0
    for rings in (rings_a, rings_b):
        for xs, ys in rings:
            if len(xs):
                m = max(m, float(np.abs(xs).max()), float(np.abs(ys).max()))
    return 2.0 ** (math.ceil(math.log2(m)) - 23)


def snap_rings(rings, grid: float):
    """ST_SetPrecision over a ring soup: quantize every vertex to the
    grid (round-half-away, exact for power-of-two grids), drop repeated
    consecutive vertices and collapsed rings, restore orientation
    (shells CCW / holes CW survive by sign of the snapped area)."""
    out = []
    for xs, ys in rings:
        qx = np.rint(np.asarray(xs, dtype=np.float64) / grid)
        qy = np.rint(np.asarray(ys, dtype=np.float64) / grid)
        if np.abs(qx).max(initial=0) >= _MAX_LATTICE or \
                np.abs(qy).max(initial=0) >= _MAX_LATTICE:
            raise ValueError(
                f"snap grid {grid} too fine for coordinate magnitude "
                f"(lattice extent >= 2^25); pick a coarser grid"
            )
        keep = np.ones(len(qx), dtype=bool)
        if len(qx) > 1:
            keep[1:] = (qx[1:] != qx[:-1]) | (qy[1:] != qy[:-1])
            if qx[0] == qx[-1] and qy[0] == qy[-1]:
                keep[-1] = False
        qx, qy = qx[keep] * grid, qy[keep] * grid
        if len(qx) < 3 or ring_area(qx, qy) == 0.0:
            continue
        out.append((qx, qy))
    return out


def _lattice_edges(rings, grid: float):
    """Ring soup -> int64 directed edge arrays in lattice units."""
    ex0, ey0, ex1, ey1 = [], [], [], []
    for xs, ys in rings:
        ix = np.rint(np.asarray(xs) / grid).astype(np.int64)
        iy = np.rint(np.asarray(ys) / grid).astype(np.int64)
        ex0.append(ix)
        ey0.append(iy)
        ex1.append(np.roll(ix, -1))
        ey1.append(np.roll(iy, -1))
    if not ex0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    return (np.concatenate(ex0), np.concatenate(ey0),
            np.concatenate(ex1), np.concatenate(ey1))


def _node_edges(ea, eb):
    """Exact noding of edge set ``ea`` against edge set ``eb`` (both
    int64 lattice): returns ``cuts`` — edge index -> list of
    (t_as_float, px, py) split points in LATTICE float coords — covering
    proper crossings, T-contacts (eb endpoints interior to an ea edge)
    and collinear overlaps (projections of eb endpoints onto collinear
    ea edges). Crossing points must be computed by the CALLER once per
    pair and pushed into both sides' cuts; this helper only handles the
    asymmetric endpoint-on-edge family."""
    ax0, ay0, ax1, ay1 = (a.astype(np.float64) for a in ea)
    cuts: dict = {}
    # candidate endpoints of eb: unique lattice points
    pts = np.unique(
        np.stack([np.concatenate([eb[0], eb[2]]),
                  np.concatenate([eb[1], eb[3]])], axis=1), axis=0
    )
    if not len(pts) or not len(ea[0]):
        return cuts
    px = pts[:, 0].astype(np.float64)
    py = pts[:, 1].astype(np.float64)
    rx = (ax1 - ax0)[:, None]
    ry = (ay1 - ay0)[:, None]
    qx = px[None, :] - ax0[:, None]
    qy = py[None, :] - ay0[:, None]
    # exact in float64: all quantities are integers < 2^51
    cross = rx * qy - ry * qx
    dot = rx * qx + ry * qy
    rr = rx * rx + ry * ry
    on = (cross == 0.0) & (dot > 0.0) & (dot < rr)
    ii, jj = np.nonzero(on)
    for i, j in zip(ii.tolist(), jj.tolist()):
        t = float(dot[i, j] / rr[i, 0])
        cuts.setdefault(i, []).append((t, float(px[j]), float(py[j])))
    return cuts


def _self_node(e, cuts):
    """Node an edge set against ITSELF: endpoint-on-edge contacts plus
    proper crossings between DIFFERENT edges (i < j, crossing point
    computed once from i's parameterization and shared). Needed when a
    soup's own rings overlap (legal even-odd input — e.g. two
    overlapping member rects): partially-coincident edges from
    different rings must split at each other's endpoints or the
    sub-segment soup is not a planar subdivision."""
    for i, lst in _node_edges(e, e).items():
        cuts.setdefault(i, []).extend(lst)
    x0, y0, x1, y1 = (a.astype(np.float64) for a in e)
    rx = (x1 - x0)[:, None]
    ry = (y1 - y0)[:, None]
    sx = (x1 - x0)[None, :]
    sy = (y1 - y0)[None, :]
    qpx = x0[None, :] - x0[:, None]
    qpy = y0[None, :] - y0[:, None]
    rxs = rx * sy - ry * sx
    c1 = qpx * sy - qpy * sx
    c2 = qpx * ry - qpy * rx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = c1 / rxs
        u = c2 / rxs
    cross = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    ii, jj = np.nonzero(cross)
    for i, j in zip(ii.tolist(), jj.tolist()):
        if i >= j:
            continue
        tv = float(t[i, j])
        uv = float(u[i, j])
        px = float(x0[i]) + tv * float(x1[i] - x0[i])
        py = float(y0[i]) + tv * float(y1[i] - y0[i])
        cuts.setdefault(i, []).append((tv, px, py))
        cuts.setdefault(j, []).append((uv, px, py))


def _proper_crossings(ea, eb, cuts_a, cuts_b):
    """Exact proper-crossing detection on the lattice; the float
    crossing point is computed once and shared."""
    ax0, ay0, ax1, ay1 = (a.astype(np.float64) for a in ea)
    bx0, by0, bx1, by1 = (b.astype(np.float64) for b in eb)
    rx = (ax1 - ax0)[:, None]
    ry = (ay1 - ay0)[:, None]
    sx = (bx1 - bx0)[None, :]
    sy = (by1 - by0)[None, :]
    qpx = bx0[None, :] - ax0[:, None]
    qpy = by0[None, :] - ay0[:, None]
    rxs = rx * sy - ry * sx          # exact: integer-valued
    c1 = qpx * sy - qpy * sx
    c2 = qpx * ry - qpy * rx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = c1 / rxs
        u = c2 / rxs
    cross = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    ia, ib = np.nonzero(cross)
    for i, j in zip(ia.tolist(), ib.tolist()):
        tv = float(t[i, j])
        uv = float(u[i, j])
        px = float(ax0[i]) + tv * float(ax1[i] - ax0[i])
        py = float(ay0[i]) + tv * float(ay1[i] - ay0[i])
        cuts_a.setdefault(i, []).append((tv, px, py))
        cuts_b.setdefault(j, []).append((uv, px, py))


def _split(ea, cuts):
    """Split lattice edges at their cut points -> float sub-segment
    endpoint lists (lattice units)."""
    x0, y0, x1, y1 = (a.astype(np.float64) for a in ea)
    segs = []
    for i in range(len(x0)):
        pts = [(0.0, float(x0[i]), float(y0[i]))]
        pts += sorted(set(cuts.get(i, ())))
        pts.append((1.0, float(x1[i]), float(y1[i])))
        for (_, ax, ay), (_, bx, by) in zip(pts, pts[1:]):
            if ax == bx and ay == by:
                continue
            segs.append((ax, ay, bx, by))
    return segs


def _side_probes(segs, soups):
    """Vectorized left/right side probes for a list of sub-segments:
    midpoint ± ε·n̂ with per-segment ε halved until BOTH probes are
    strictly off every edge of every soup (the scalar per-segment loop
    was the classification hotspot). Returns (Lx, Ly, Rx, Ry) arrays.
    """
    ax = np.array([s[0] for s in segs])
    ay = np.array([s[1] for s in segs])
    bx = np.array([s[2] for s in segs])
    by = np.array([s[3] for s in segs])
    dx, dy = bx - ax, by - ay
    ln = np.hypot(dx, dy)
    nx, ny = -dy / ln, dx / ln
    mx, my = (ax + bx) / 2.0, (ay + by) / 2.0

    # all edges of all soups, flattened
    e0x, e0y, e1x, e1y = [], [], [], []
    for rings in soups:
        for xs, ys in rings:
            e0x.append(np.asarray(xs))
            e0y.append(np.asarray(ys))
            e1x.append(np.roll(xs, -1))
            e1y.append(np.roll(ys, -1))
    ex0 = np.concatenate(e0x)[None, :]
    ey0 = np.concatenate(e0y)[None, :]
    ex1 = np.concatenate(e1x)[None, :]
    ey1 = np.concatenate(e1y)[None, :]
    rx, ry = ex1 - ex0, ey1 - ey0
    rr = rx * rx + ry * ry

    def on_any(px, py):
        qx = px[:, None] - ex0
        qy = py[:, None] - ey0
        cross = rx * qy - ry * qx
        dot = rx * qx + ry * qy
        return ((cross == 0.0) & (dot >= 0.0) & (dot <= rr)).any(axis=1)

    eps = np.full(len(segs), 0.25)
    for _ in range(40):
        lx, ly = mx + eps * nx, my + eps * ny
        rx2, ry2 = mx - eps * nx, my - eps * ny
        bad = on_any(lx, ly) | on_any(rx2, ry2)
        if not bad.any():
            return lx, ly, rx2, ry2
        eps = np.where(bad, eps * 0.5, eps)
    raise RuntimeError(
        "snapped overlay: side probes could not clear the boundaries")


def _off_boundary(px, py, soups) -> bool:
    """True when (px, py) is strictly off every edge of every soup —
    exact float on-segment test (no tolerance: a probe ON an edge is
    re-probed closer in by the caller)."""
    for rings in soups:
        for xs, ys in rings:
            x1 = np.roll(xs, -1)
            y1 = np.roll(ys, -1)
            cross = (x1 - xs) * (py - ys) - (y1 - ys) * (px - xs)
            dot = (x1 - xs) * (px - xs) + (y1 - ys) * (py - ys)
            rr = (x1 - xs) ** 2 + (y1 - ys) ** 2
            if np.any((cross == 0.0) & (dot >= 0.0) & (dot <= rr)):
                return False
    return True


_OPS = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
}


def _assemble_faces(segs):
    """Walk directed segments into cycles with the planar face-traversal
    successor: at each node take the first outgoing edge CLOCKWISE from
    the reversed incoming direction. Correct at degree-4 nodes (corner
    contacts) where arbitrary-successor walking could braid faces."""
    succ: dict = {}
    for (ax, ay, bx, by) in segs:
        succ.setdefault((ax, ay), []).append((bx, by))
    cycles = []
    while succ:
        start = next(iter(succ))
        outs = succ[start]
        node, prev = outs.pop(), start
        if not outs:
            del succ[start]
        path = [start, node]
        ok = True
        while node != start:
            outs = succ.get(node)
            if not outs:
                ok = False
                break
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                din = math.atan2(node[1] - prev[1], node[0] - prev[0])
                rev = din + math.pi

                def cw_gap(cand):
                    a = math.atan2(cand[1] - node[1], cand[0] - node[0])
                    d = (rev - a) % (2.0 * math.pi)
                    return d if d > 1e-12 else 2.0 * math.pi

                nxt = min(outs, key=cw_gap)
                outs.remove(nxt)
            if not outs:
                del succ[node]
            prev, node = node, nxt
            if node != start:
                path.append(node)
            if len(path) > len(segs) + 1:
                ok = False
                break
        if ok and len(path) >= 3:
            xs = np.array([p[0] for p in path])
            ys = np.array([p[1] for p in path])
            if abs(ring_area(xs, ys)) > 1e-12:
                cycles.append((xs, ys))
    return cycles


def _eo_normalize(soup, grid):
    """Resolve a possibly self-overlapping multi-ring soup to proper
    even-odd faces (two identical member rects XOR to empty, etc.) via
    self-intersection; single-ring soups are proper by construction.
    Used by the disjoint/empty early-exits, whose raw return would
    otherwise leak uncancelled rings into area sums."""
    if len(soup) <= 1:
        return list(soup)
    return overlay_rings_snapped(soup, soup, "intersection", grid)


def _snapped_memberships(rings_a, rings_b, grid):
    """Shared arrangement core for the 2-way overlays: snap, node,
    split, dedup coincident sub-segments and classify both sides —
    returns (a, b, segs_u, ina_l, inb_l, ina_r, inb_r), or a short
    string tag for the degenerate early-exits ('empty' / 'disjoint')."""
    a = snap_rings(rings_a, grid)
    b = snap_rings(rings_b, grid)
    if not a or not b:
        return a, b, "empty", None, None, None, None
    ax0, ay0, ax1, ay1 = rings_envelope(a)
    bx0, by0, bx1, by1 = rings_envelope(b)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return a, b, "disjoint", None, None, None, None

    ea = _lattice_edges(a, grid)
    eb = _lattice_edges(b, grid)
    cuts_a = _node_edges(ea, eb)
    cuts_b = _node_edges(eb, ea)
    _proper_crossings(ea, eb, cuts_a, cuts_b)
    # within-soup noding: a soup's own rings may overlap (even-odd)
    _self_node(ea, cuts_a)
    _self_node(eb, cuts_b)
    segs_a = _split(ea, cuts_a)
    segs_b = _split(eb, cuts_b)

    # lattice-unit ring soups for the probes
    la = [(np.asarray(xs) / grid, np.asarray(ys) / grid) for xs, ys in a]
    lb = [(np.asarray(xs) / grid, np.asarray(ys) / grid) for xs, ys in b]

    # collapse coincident sub-segments (shared edges) to one undirected
    # representative; remember one original direction for orientation
    seen: dict = {}
    for seg in segs_a + segs_b:
        key = (min(seg[:2], seg[2:]), max(seg[:2], seg[2:]))
        seen.setdefault(key, seg)
    segs_u = list(seen.values())
    lx, ly, rx2, ry2 = _side_probes(segs_u, (la, lb))
    ina_l = _points_in_rings(lx, ly, la)
    inb_l = _points_in_rings(lx, ly, lb)
    ina_r = _points_in_rings(rx2, ry2, la)
    inb_r = _points_in_rings(rx2, ry2, lb)
    return a, b, segs_u, ina_l, inb_l, ina_r, inb_r


def _select_and_assemble(segs_u, in_l, in_r, grid):
    kept = []
    for i, (ax, ay, bx, by) in enumerate(segs_u):
        if bool(in_l[i]) == bool(in_r[i]):
            continue
        if in_l[i]:
            kept.append((ax, ay, bx, by))      # interior on left already
        else:
            kept.append((bx, by, ax, ay))
    cycles = _assemble_faces(kept)
    return [(xs * grid, ys * grid) for xs, ys in cycles]


def overlay_rings_snapped(rings_a, rings_b, op: str, grid: float = None):
    """Boolean overlay on snapped inputs — accepts vertex-on-edge and
    shared-edge contacts. op ∈ {intersection, union, difference,
    symdifference}. Returns a ring soup in WORLD coordinates."""
    if op == "symdifference":
        return (overlay_rings_snapped(rings_a, rings_b, "difference", grid)
                + overlay_rings_snapped(rings_b, rings_a, "difference", grid))
    if op not in _OPS:
        raise ValueError(op)
    if grid is None:
        grid = default_grid(rings_a, rings_b)
    a, b, segs_u, ina_l, inb_l, ina_r, inb_r = \
        _snapped_memberships(rings_a, rings_b, grid)
    if isinstance(segs_u, str):        # 'empty' or 'disjoint'
        if op == "intersection":
            return []
        if op == "union":
            return _eo_normalize(a, grid) + _eo_normalize(b, grid)
        return _eo_normalize(a, grid)
    want = _OPS[op]
    return _select_and_assemble(
        segs_u, want(ina_l, inb_l), want(ina_r, inb_r), grid)


def overlay_areas_snapped(rings_a, rings_b, grid: float = None):
    """Intersection / union / A−B / B−A areas in ONE noding +
    classification pass (the per-pair overlay queries and the snapped
    predicates need all of them; running four ops re-nodes four
    times). Returns dict {'i','u','d','db'} of world-unit areas."""
    if grid is None:
        grid = default_grid(rings_a, rings_b)
    a, b, segs_u, ina_l, inb_l, ina_r, inb_r = \
        _snapped_memberships(rings_a, rings_b, grid)
    if isinstance(segs_u, str):
        a_area = rings_area(_eo_normalize(a, grid))
        b_area = rings_area(_eo_normalize(b, grid))
        return {"i": 0.0, "u": a_area + b_area, "d": a_area, "db": b_area}
    out = {}
    for key, want in (("i", _OPS["intersection"]), ("u", _OPS["union"]),
                      ("d", _OPS["difference"]),
                      ("db", lambda x, y: y & ~x)):
        out[key] = rings_area(_select_and_assemble(
            segs_u, want(ina_l, inb_l), want(ina_r, inb_r), grid))
    return out


__all__ = [
    "default_grid",
    "snap_rings",
    "overlay_rings_snapped",
    "geometry_rings",
    "rings_area",
    "rings_to_wkb",
]


def boundaries_touch_snapped(rings_a, rings_b, grid: float = None) -> bool:
    """True when the snapped boundaries of the two soups share at least
    one point — shared lattice vertices, vertex-on-edge contacts,
    proper crossings or collinear overlaps, all decided exactly on the
    int64 lattice. Combined with the areal overlay this derives the
    full boundary-aware predicate set on snapped inputs:
    intersects = touch OR i_area > 0; touches = touch AND i_area == 0.
    """
    if grid is None:
        grid = default_grid(rings_a, rings_b)
    a = snap_rings(rings_a, grid)
    b = snap_rings(rings_b, grid)
    if not a or not b:
        return False
    ea = _lattice_edges(a, grid)
    eb = _lattice_edges(b, grid)
    # shared lattice vertices
    va = set(zip(ea[0].tolist(), ea[1].tolist()))
    vb = set(zip(eb[0].tolist(), eb[1].tolist()))
    if va & vb:
        return True
    # vertex-on-edge (either direction)
    if _node_edges(ea, eb) or _node_edges(eb, ea):
        return True
    # proper crossings
    cuts_a: dict = {}
    cuts_b: dict = {}
    _proper_crossings(ea, eb, cuts_a, cuts_b)
    if cuts_a:
        return True
    # collinear overlap with NO endpoint inside the other edge (exact
    # same-extent segments): covered by the shared-vertex test above,
    # since snapped identical segments share lattice endpoints
    return False


def overlay_rings_snapped_n(rings_a, soups, op: str, grid: float = None):
    """N-way snapped overlay against the UNION of many soups in ONE
    arrangement pass: ``union`` returns A ∪ (∪ soups), ``difference``
    returns A − (∪ soups). This is the buffer fold's engine — a
    sequential per-piece fold re-nodes the growing accumulator per
    piece (O(pieces · E²)); here every edge is noded against every
    other group exactly once (O(E_total²), vectorized), then each
    noded sub-segment is classified by the n-way predicate and
    face-walked as usual."""
    if op not in ("union", "difference"):
        raise ValueError(op)
    if grid is None:
        grid = default_grid(rings_a, [r for s in soups for r in s])
    a = snap_rings(rings_a, grid)
    bs = [s for s in (snap_rings(sp, grid) for sp in soups) if s]
    if not bs:
        return _eo_normalize(a, grid)
    if not a:
        if op == "difference":
            return []
        # union of the soups alone: run with the first soup as A
        a, bs = bs[0], bs[1:]
        if not bs:
            return _eo_normalize(a, grid)

    groups = [a] + bs
    glat = [_lattice_edges(g, grid) for g in groups]
    sizes = [len(e[0]) for e in glat]
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    cuts: dict = {}

    def _merge(dst_off, sub):
        for i, lst in sub.items():
            cuts.setdefault(dst_off + i, []).extend(lst)

    for gi in range(len(groups)):
        sub_self: dict = {}
        _self_node(glat[gi], sub_self)
        _merge(offs[gi], sub_self)
        for gj in range(len(groups)):
            if gi == gj:
                continue
            # endpoint-on-edge of group gj against edges of gi
            _merge(offs[gi], _node_edges(glat[gi], glat[gj]))
        for gj in range(gi + 1, len(groups)):
            ca: dict = {}
            cb: dict = {}
            _proper_crossings(glat[gi], glat[gj], ca, cb)
            _merge(offs[gi], ca)
            _merge(offs[gj], cb)

    segs = []
    for gi, ea in enumerate(glat):
        sub = {i: cuts.get(offs[gi] + i, []) for i in range(sizes[gi])}
        segs.extend(_split(ea, sub))

    lat = [[(np.asarray(xs) / grid, np.asarray(ys) / grid)
            for xs, ys in g] for g in groups]
    la, lbs = lat[0], lat[1:]

    seen: dict = {}
    for seg in segs:
        key = (min(seg[:2], seg[2:]), max(seg[:2], seg[2:]))
        seen.setdefault(key, seg)

    segs_u = list(seen.values())
    all_soups = [la] + lbs
    lx, ly, rx2, ry2 = _side_probes(segs_u, all_soups)
    ia_l = _points_in_rings(lx, ly, la)
    ia_r = _points_in_rings(rx2, ry2, la)
    ib_l = np.zeros(len(segs_u), dtype=bool)
    ib_r = np.zeros(len(segs_u), dtype=bool)
    for lb in lbs:
        ib_l |= _points_in_rings(lx, ly, lb)
        ib_r |= _points_in_rings(rx2, ry2, lb)
    if op == "union":
        in_l, in_r = ia_l | ib_l, ia_r | ib_r
    else:
        in_l, in_r = ia_l & ~ib_l, ia_r & ~ib_r
    kept = []
    for i, (ax, ay, bx, by) in enumerate(segs_u):
        if bool(in_l[i]) == bool(in_r[i]):
            continue
        kept.append((ax, ay, bx, by) if in_l[i] else (bx, by, ax, ay))

    cycles = _assemble_faces(kept)
    return [(xs * grid, ys * grid) for xs, ys in cycles]
