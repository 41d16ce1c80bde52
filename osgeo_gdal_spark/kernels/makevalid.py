"""Validity repair for self-intersecting polygon rings.

The closed-form core of ``OGRGeometry::MakeValid``
(``/root/reference/ogr/ogrgeometry.cpp:4183``, which delegates to GEOS
MakeValid's "linework" structure method): node the ring at its proper
self-crossings and split it into simple loops — a bowtie quad becomes
two triangles, a figure-eight two loops, each kept as a positive-area
CCW part of a MultiPolygon (GEOS's even-odd interpretation of the noded
linework for these shapes).

v1 scope (documented, tested): rings whose self-contacts are PROPER
segment crossings AND whose noded faces are disjoint (bowties,
figure-eight chains — the overwhelmingly common invalid shapes).
Interleaved crossings whose faces overlap (pentagram-style: the core
face has winding 2), collinear-overlap contacts, and nested
self-touching loops raise the documented shapely extension error —
those need even-odd face classification over a full arrangement. Repairs that need no noding are always applied: consecutive
duplicate vertices dropped, unclosed rings closed, degenerate (< 3
distinct vertices / zero-area) rings removed.
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


def make_valid(pg: PackedGeometry):
    """PackedGeometry polygon -> list of simple CCW loops across all its
    rings (holes are noded independently — matching the linework
    method's per-ring treatment; nested-loop reassembly is the named
    GEOS extension)."""
    loops = []
    for r in range(len(pg.ring_offsets) - 1):
        s, e = pg.ring_offsets[r], pg.ring_offsets[r + 1]
        loops.extend(make_valid_rings(pg.xs[s:e], pg.ys[s:e]))
    if len(loops) > 1 and _loops_overlap(loops):
        raise NotImplementedError(
            "MakeValid: interleaved self-crossings (pentagram-style) "
            "yield overlapping faces; even-odd face classification is "
            "the shapely.make_valid extension point"
        )
    return loops
