"""Validity repair for self-intersecting polygon rings.

The closed-form core of ``OGRGeometry::MakeValid``
(``/root/reference/ogr/ogrgeometry.cpp:4183``, which delegates to GEOS
MakeValid's "linework" structure method): node the ring at its proper
self-crossings and split it into simple loops — a bowtie quad becomes
two triangles, a figure-eight two loops, each kept as a positive-area
CCW part of a MultiPolygon (GEOS's even-odd interpretation of the noded
linework for these shapes).

Scope (round 4 — every previously named extension is implemented):
proper-crossing rings with disjoint faces split per ring (bowtie,
figure-eight); OVERLAPPING faces (pentagram-style interleaved
crossings) run the full float arrangement (`_arrangement_faces`);
vertex-on-edge and COLLINEAR-OVERLAP self-contacts are detected
exactly on the snap lattice and repaired by the lattice arrangement
(`make_valid_lattice` over kernels/snap.py noding). Repairs that need
no noding are always applied: consecutive duplicate vertices dropped,
unclosed rings closed, degenerate (< 3 distinct vertices / zero-area)
rings removed; structurally valid input passes through unchanged.
"""

from __future__ import annotations

import numpy as np

from .wkb import PackedGeometry


def _proper_crossing(ax, ay, bx, by, cx, cy, dx, dy):
    """Strict-interior intersection of segments AB and CD, or None.
    Near-parallel pairs are rejected with a RELATIVE epsilon: noding
    splits an edge into collinear sub-edges whose cross product is
    ~1e-16 instead of 0, and dividing by that tiny denominator invents
    a mid-segment 'crossing' out of rounding noise."""
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    den = rx * sy - ry * sx
    if den * den <= 1.0e-24 * (rx * rx + ry * ry) * (sx * sx + sy * sy):
        return None
    tx, ty = cx - ax, cy - ay
    t = (tx * sy - ty * sx) / den
    u = (tx * ry - ty * rx) / den
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        return (ax + t * rx, ay + t * ry, t, u)
    return None


def _noded_cycle(xs, ys):
    """Insert every proper self-crossing point into the vertex cycle.
    Each crossing point is computed ONCE and the identical float pair is
    inserted into both edges, so loop extraction can match on exact
    equality."""
    n = len(xs)
    inserts = {i: [] for i in range(n)}
    for i in range(n):
        ax, ay = xs[i], ys[i]
        bx, by = xs[(i + 1) % n], ys[(i + 1) % n]
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent around the wrap
            cx, cy = xs[j], ys[j]
            dxx, dyy = xs[(j + 1) % n], ys[(j + 1) % n]
            hit = _proper_crossing(ax, ay, bx, by, cx, cy, dxx, dyy)
            if hit is not None:
                px, py, t, u = hit
                inserts[i].append((t, (px, py)))
                inserts[j].append((u, (px, py)))
    cyc = []
    for i in range(n):
        cyc.append((xs[i], ys[i]))
        cyc.extend(p for _t, p in sorted(inserts[i], key=lambda e: e[0]))
    return cyc


def _split_loops(cyc):
    """Split a noded vertex cycle into simple loops: walk the cycle,
    and each time a point repeats, pop the enclosed stretch as a loop
    (classic noded-linework ring extraction)."""
    loops = []
    stack = []
    seen = {}
    for p in cyc:
        if p in seen:
            k = seen[p]
            loop = stack[k:]
            for q in loop:
                seen.pop(q, None)
            del stack[k:]
        else:
            loop = None
        if loop and len(loop) >= 3:
            loops.append(loop)
        seen[p] = len(stack)
        stack.append(p)
    if len(stack) >= 3:
        loops.append(stack)
    return loops


def _loop_area(loop):
    xs = np.array([p[0] for p in loop])
    ys = np.array([p[1] for p in loop])
    return 0.5 * float(
        np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
    )


def _has_proper_crossing(loop):
    xs = [p[0] for p in loop]
    ys = [p[1] for p in loop]
    n = len(loop)
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if _proper_crossing(
                xs[i], ys[i], xs[(i + 1) % n], ys[(i + 1) % n],
                xs[j], ys[j], xs[(j + 1) % n], ys[(j + 1) % n],
            ) is not None:
                return True
    return False


def make_valid_rings(xs, ys, _depth=0):
    """One possibly-self-crossing ring -> list of simple CCW loops
    (each an open [(x, y), ...] list), zero-area loops dropped.
    Interleaved crossings (pentagram-style) leave composite loops after
    one noding pass; those re-node recursively until every loop is
    simple (each pass strictly splits, so depth is bounded by the
    crossing count)."""
    pts = list(zip([float(v) for v in xs], [float(v) for v in ys]))
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]
    # drop consecutive duplicates
    ded = [p for k, p in enumerate(pts) if p != pts[k - 1]] if pts else []
    if len(ded) < 3:
        return []
    cyc = _noded_cycle(
        np.array([p[0] for p in ded]), np.array([p[1] for p in ded])
    )
    out = []
    for loop in _split_loops(cyc):
        a = _loop_area(loop)
        if a == 0.0:
            continue
        if _depth < 16 and _has_proper_crossing(loop):
            out.extend(
                make_valid_rings(
                    [p[0] for p in loop], [p[1] for p in loop],
                    _depth + 1,
                )
            )
            continue
        if a < 0.0:
            loop = loop[::-1]
        out.append(loop)
    return out


def _loops_overlap(loops):
    """True if any two loops share interior (proper edge crossing, or
    an edge midpoint of one strictly inside the other). Loops produced
    by noding share at most isolated node points, so midpoint probes
    never sit on the other loop's boundary."""
    from .pip import points_in_ring

    closed = []
    for lp in loops:
        xs = np.array([p[0] for p in lp] + [lp[0][0]])
        ys = np.array([p[1] for p in lp] + [lp[0][1]])
        closed.append((xs, ys))
    for a in range(len(loops)):
        axs, ays = closed[a]
        amx = 0.5 * (axs[:-1] + axs[1:])
        amy = 0.5 * (ays[:-1] + ays[1:])
        for b in range(len(loops)):
            if a == b:
                continue
            bxs, bys = closed[b]
            for i in range(len(axs) - 1):
                for j in range(len(bxs) - 1):
                    hit = _proper_crossing(
                        axs[i], ays[i], axs[i + 1], ays[i + 1],
                        bxs[j], bys[j], bxs[j + 1], bys[j + 1],
                    )
                    # margin: loops legitimately SHARE their crossing
                    # nodes; when a node has non-dyadic coords the
                    # incident-edge intersection parameters wobble to
                    # 1 - 1ulp and would read as proper crossings. A
                    # true overlap this shallow is caught by the
                    # midpoint probe below instead.
                    if hit is not None:
                        _px, _py, t, u = hit
                        eps = 1e-9
                        if eps < t < 1 - eps and eps < u < 1 - eps:
                            return True
            if bool(points_in_ring(amx, amy, bxs, bys).any()):
                return True
    return False


def _winding(px, py, xs, ys):
    """Winding number of (px, py) around the CLOSED cycle xs/ys (open
    vertex list, wrap implied) — standard signed upward/downward
    crossing count."""
    wn = 0
    n = len(xs)
    for i in range(n):
        x0, y0 = xs[i], ys[i]
        x1, y1 = xs[(i + 1) % n], ys[(i + 1) % n]
        cross = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
        if y0 <= py:
            if y1 > py and cross > 0:
                wn += 1
        else:
            if y1 <= py and cross < 0:
                wn -= 1
    return wn


def _off_all_edges(px, py, edges):
    """True when (px, py) is strictly off every segment in ``edges``
    (list of (ax, ay, bx, by)); exact float on-segment test."""
    for (ax, ay, bx, by) in edges:
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        dot = (bx - ax) * (px - ax) + (by - ay) * (py - ay)
        rr = (bx - ax) ** 2 + (by - ay) ** 2
        if cross == 0.0 and 0.0 <= dot <= rr:
            return False
    return True


def _arrangement_faces(rings):
    """Overlapping-face MakeValid (the round-3 extension point):
    enumerate every bounded face of the full noded self-arrangement and
    keep faces with nonzero winding w.r.t. the original ring cycle(s) —
    GEOS's linework/Polygonizer semantics, where a pentagram yields its
    5 point-triangles PLUS the winding-2 core as separate polygons.

    ``rings``: list of (xs, ys) OPEN vertex arrays in original
    orientation. Returns open CCW loops.

    Method: node ALL edges pairwise (proper crossings with the
    crossing point computed once and shared — identical to the
    disjoint-face pass), emit BOTH half-edges of every noded
    sub-segment, and trace faces with the clockwise-successor rule
    (first outgoing edge CW from the reversed incoming direction, the
    planar face-traversal walk also used by kernels/snap.py). Each
    bounded face comes out exactly once, CCW; the unbounded face comes
    out CW and is dropped by its negative area. Face membership is then
    decided by the winding number of an interior witness (edge midpoint
    nudged to the face's left side, halved until off every arrangement
    edge — the face-witness move)."""
    import math

    # all directed original edges, flattened
    E = []
    for xs, ys in rings:
        n = len(xs)
        for i in range(n):
            a = (float(xs[i]), float(ys[i]))
            b = (float(xs[(i + 1) % n]), float(ys[(i + 1) % n]))
            if a != b:
                E.append((a[0], a[1], b[0], b[1]))
    # pairwise noding
    cuts = {i: [] for i in range(len(E))}
    for i in range(len(E)):
        ax, ay, bx, by = E[i]
        for j in range(i + 1, len(E)):
            cx, cy, dx, dy = E[j]
            hit = _proper_crossing(ax, ay, bx, by, cx, cy, dx, dy)
            if hit is not None:
                px, py, t, u = hit
                cuts[i].append((t, (px, py)))
                cuts[j].append((u, (px, py)))
    subs = set()
    for i, (ax, ay, bx, by) in enumerate(E):
        pts = [(0.0, (ax, ay))] + sorted(cuts[i]) + [(1.0, (bx, by))]
        for (_, p), (_, q) in zip(pts, pts[1:]):
            if p != q:
                subs.add((min(p, q), max(p, q)))

    return _walk_and_filter(subs, rings)


def _walk_and_filter(subs, rings):
    """Shared arrangement core: walk BOTH half-edges of every noded
    sub-segment into faces (clockwise-successor rule), drop non-positive
    areas, keep faces whose interior witness has nonzero winding w.r.t.
    the original ring cycles."""
    import math

    succ: dict = {}
    for p, q in subs:
        succ.setdefault(p, []).append(q)
        succ.setdefault(q, []).append(p)

    faces = []
    used = set()
    for start_p, outs0 in list(succ.items()):
        for start_q in list(outs0):
            if (start_p, start_q) in used:
                continue
            path = [start_p, start_q]
            used.add((start_p, start_q))
            prev, node = start_p, start_q
            guard = 0
            while True:
                outs = succ[node]
                rev = math.atan2(prev[1] - node[1], prev[0] - node[0])

                def cw_gap(c):
                    a = math.atan2(c[1] - node[1], c[0] - node[0])
                    d = (rev - a) % (2.0 * math.pi)
                    return d if d > 1e-12 else 2.0 * math.pi

                nxt = min(outs, key=cw_gap)
                if (node, nxt) == (start_p, start_q):
                    break
                used.add((node, nxt))
                prev, node = node, nxt
                path.append(node)
                guard += 1
                if guard > 4 * len(subs) + 8:
                    raise RuntimeError("arrangement face walk diverged")
            path = path[:-1] if path[-1] == start_p else path
            if len(path) >= 3:
                fx = np.array([p[0] for p in path])
                fy = np.array([p[1] for p in path])
                area = _loop_area(list(zip(fx, fy)))
                if area > 1e-12:
                    faces.append(list(zip(fx.tolist(), fy.tolist())))

    # winding-based membership
    edges_flat = [(p[0], p[1], q[0], q[1]) for p, q in subs]
    kept = []
    for face in faces:
        (ax, ay), (bx, by) = face[0], face[1]
        mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
        dx, dy = bx - ax, by - ay
        ln = math.hypot(dx, dy)
        nx, ny = -dy / ln, dx / ln      # left normal = face interior
        eps = 0.25 * ln
        while True:
            wxp, wyp = mx + eps * nx, my + eps * ny
            if _off_all_edges(wxp, wyp, edges_flat):
                break
            eps *= 0.5
            if eps < 1e-12 * (1.0 + ln):
                raise RuntimeError("arrangement face witness degenerate")
        wn = sum(_winding(wxp, wyp, np.asarray(xs), np.asarray(ys))
                 for xs, ys in rings)
        if wn != 0:
            kept.append(face)
    return kept


def _open_rings(pg: PackedGeometry):
    rings = []
    for r in range(len(pg.ring_offsets) - 1):
        s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
        xs, ys = pg.xs[s:e], pg.ys[s:e]
        if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
        rings.append((xs, ys))
    return rings


def _rings_cross(rings) -> bool:
    """Any proper crossing between edges of DIFFERENT rings."""
    for a in range(len(rings)):
        axs, ays = rings[a]
        na = len(axs)
        for b in range(a + 1, len(rings)):
            bxs, bys = rings[b]
            nb = len(bxs)
            for i in range(na):
                for j in range(nb):
                    if _proper_crossing(
                        axs[i], ays[i],
                        axs[(i + 1) % na], ays[(i + 1) % na],
                        bxs[j], bys[j],
                        bxs[(j + 1) % nb], bys[(j + 1) % nb],
                    ) is not None:
                        return True
    return False


def make_valid(pg: PackedGeometry):
    """PackedGeometry polygon -> validity repair, four tiers:

    1. Vertex-on-edge or COLLINEAR-OVERLAP self-contacts (exact lattice
       detection): the snap-lattice arrangement pass
       (``make_valid_lattice`` — retraced edges collapse, spikes drop,
       winding keeps the real faces).
    2. STRUCTURALLY INTACT input (every ring simple, no cross-ring
       crossings — includes valid polygons with holes and
       multipolygons): returns None, meaning "pass through unchanged"
       (GEOS MakeValid returns valid input as-is).
    3. Self-crossing rings whose noded faces are DISJOINT (bowtie,
       figure-eight): per-ring noding, one simple CCW loop per face.
    4. OVERLAPPING noded faces (pentagram-style interleaved
       crossings): the full-arrangement pass — every bounded face of
       the noded linework with nonzero winding becomes its own polygon
       (GEOS linework/Polygonizer semantics: 5 point-triangles + the
       winding-2 core for a pentagram)."""
    from . import snap as SN

    rings = _open_rings(pg)
    grid = SN.default_grid(rings, [])
    if _lattice_self_contacts(rings, grid):
        return make_valid_lattice(rings, grid)
    per_ring = [make_valid_rings(xs, ys) for xs, ys in rings]
    intact = all(len(lp) == 1 for lp in per_ring) and not _rings_cross(rings)
    if intact and len(rings) > 1:
        # pass through ONLY when the per-ring repair was a no-op for
        # every ring; otherwise emit the repaired rings —
        # duplicate-vertex drops and unclosed-ring closing apply to
        # multi-ring input too (ADVICE r4: the unconditional None
        # skipped them). Ring ORIENTATION is polygon structure in this
        # tier (holes are CW), not a defect: make_valid_rings
        # canonicalizes to CCW, so restore each input ring's winding
        # before comparing or emitting.
        from .clip import ring_area as _ra

        restored = []
        unchanged = True
        for lp, (xs, ys) in zip(per_ring, rings):
            loop = lp[0]
            if _ra(np.asarray(xs, dtype=np.float64),
                   np.asarray(ys, dtype=np.float64)) < 0.0:
                loop = loop[::-1]
            restored.append(loop)
            orig = list(zip([float(v) for v in xs], [float(v) for v in ys]))
            if orig and orig[0] == orig[-1]:
                orig = orig[:-1]
            if len(loop) != len(orig) or loop[0] not in orig:
                unchanged = False
            else:
                k = orig.index(loop[0])
                if loop != orig[k:] + orig[:k]:
                    unchanged = False
        if unchanged:
            return None
        return restored
    if intact and len(rings) == 1:
        # single simple ring: emit the CCW repair (covers unclosed /
        # duplicate-vertex input that needed no noding)
        return per_ring[0]
    loops = [lp for lps in per_ring for lp in lps]
    if len(loops) > 1 and _loops_overlap(loops):
        loops = _arrangement_faces(rings)
    return loops


def _lattice_self_contacts(rings, grid) -> bool:
    """Exact test for vertex-on-edge / collinear-overlap SELF-contacts
    on the snap lattice (an edge's own endpoints and shared endpoints
    of adjacent edges are excluded by the strict interior test)."""
    from . import snap as SN

    snapped = SN.snap_rings(rings, grid)
    if not snapped:
        return False
    ea = SN._lattice_edges(snapped, grid)
    if SN._node_edges(ea, ea):
        return True
    # EXACT retraces (a ring traversing the same segment twice with
    # equal endpoints) produce duplicate undirected lattice edges but
    # no endpoint-interior contact — round 5: the symmetric-spike gap
    seen = set()
    for x0, y0, x1, y1 in zip(*(a.tolist() for a in ea)):
        key = ((x0, y0), (x1, y1)) if (x0, y0) <= (x1, y1) \
            else ((x1, y1), (x0, y0))
        if key in seen:
            return True
        seen.add(key)
    return False


def make_valid_lattice(rings, grid=None):
    """MakeValid for COLLINEAR-OVERLAP and vertex-on-edge self-contacts
    — the last named extension after round 4's overlapping-face tier:
    route the arrangement through the exact int64 snap lattice
    (kernels/snap.py), where T-contacts and retraced (overlapping)
    edges node with zero epsilons; duplicate sub-segments from a
    retrace collapse in the undirected dedup, the resulting zero-area
    spike faces drop, and winding membership keeps the real faces.

    Returns open CCW loops in world coordinates."""
    from . import snap as SN

    if grid is None:
        grid = SN.default_grid(rings, [])
    snapped = SN.snap_rings(rings, grid)
    if not snapped:
        return []
    ea = SN._lattice_edges(snapped, grid)
    cuts = SN._node_edges(ea, ea)       # T-contacts + overlap endpoints
    ax0, ay0, ax1, ay1 = (a.astype(np.float64) for a in ea)
    n = len(ax0)
    for i in range(n):
        for j in range(i + 1, n):
            hit = _proper_crossing(
                ax0[i], ay0[i], ax1[i], ay1[i],
                ax0[j], ay0[j], ax1[j], ay1[j],
            )
            if hit is not None:
                px, py, t, u = hit
                cuts.setdefault(i, []).append((t, px, py))
                cuts.setdefault(j, []).append((u, px, py))
    segs = SN._split(ea, cuts)
    subs = set()
    for (sx, sy, ex, ey) in segs:
        p, q = (sx, sy), (ex, ey)
        if p != q:
            subs.add((min(p, q), max(p, q)))
    lat_rings = [(np.asarray(xs) / grid, np.asarray(ys) / grid)
                 for xs, ys in snapped]
    kept = _walk_and_filter(subs, lat_rings)
    return [[(x * grid, y * grid) for (x, y) in face] for face in kept]


def validity_reason(pg) -> str:
    """``gdal vector check-geometry`` / ST_IsValid classification (the
    detection half of the make_valid dispatch, reference
    ogrgeometry.cpp:4183 and apps/gdalalg_vector_check_geometry.cpp):
    returns 'valid', 'self-intersection' (proper ring crossings —
    bowtie/pentagram tier) or 'self-contact' (vertex-on-edge /
    collinear-overlap lattice contacts)."""
    from . import snap as SN

    rings = _open_rings(pg)
    if not rings:
        return "valid"
    grid = SN.default_grid(rings, [])
    if _lattice_self_contacts(rings, grid):
        return "self-contact"
    if _rings_cross(rings):
        return "self-intersection"
    for xs, ys in rings:
        if _has_proper_crossing(list(zip(
                [float(v) for v in xs], [float(v) for v in ys]))):
            return "self-intersection"
    return "valid"
