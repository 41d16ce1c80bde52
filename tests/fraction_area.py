"""Exact rational reference for qs=1 buffer areas (test oracle).

With quadrant-segments = 1 the buffer disk is the L1 diamond
{(±d,0),(0,±d)} — every capsule/diamond vertex is RATIONAL, so the
dilation A ⊕ D = A ∪ (∪ edge-capsules) and the erosion
A ⊖ D = A − (∪ edge-capsules) have exact rational areas. This module
computes them with Fractions by an algorithm INDEPENDENT of the
production kernel (kernels/snap.py face-walk): vertical slab
decomposition at every pairwise edge-crossing x, exact even-odd
y-interval extraction per polygon at the slab midpoint, interval
union/difference, and trapezoid integration (coverage length is
linear within a slab, so width × midpoint-length is exact).

Used by tests/test_property_makevalid_winnow.py to pin the concave
dart fixtures of the gated ``st_buffer`` query (entry_queries) — the
family the round-4 float-noded kernel got wrong.
"""

from __future__ import annotations

from fractions import Fraction


def _ring_edges(ring):
    n = len(ring)
    return [(ring[i], ring[(i + 1) % n]) for i in range(n)]


def _x_breakpoints(polys):
    """All vertex x's plus all pairwise edge-crossing x's (exact)."""
    xs = set()
    edges = []
    for ring in polys:
        for (a, b) in _ring_edges(ring):
            edges.append((a, b))
            xs.add(a[0])
    for i in range(len(edges)):
        (p1, p2) = edges[i]
        r = (p2[0] - p1[0], p2[1] - p1[1])
        for j in range(i + 1, len(edges)):
            (q1, q2) = edges[j]
            s = (q2[0] - q1[0], q2[1] - q1[1])
            den = r[0] * s[1] - r[1] * s[0]
            if den == 0:
                continue
            qp = (q1[0] - p1[0], q1[1] - p1[1])
            t = Fraction(qp[0] * s[1] - qp[1] * s[0], den)
            u = Fraction(qp[0] * r[1] - qp[1] * r[0], den)
            if 0 <= t <= 1 and 0 <= u <= 1:
                xs.add(p1[0] + t * r[0])
    return sorted(xs)


def _intervals_at(ring, x):
    """Even-odd covered y-intervals of one simple ring at vertical
    line x (x strictly between breakpoints -> no edge endpoint lies
    on the line, every crossing is proper)."""
    ys = []
    for (a, b) in _ring_edges(ring):
        if (a[0] < x < b[0]) or (b[0] < x < a[0]):
            t = Fraction(x - a[0], b[0] - a[0])
            ys.append(a[1] + t * (b[1] - a[1]))
    ys.sort()
    return list(zip(ys[0::2], ys[1::2]))


def _union_len(intervals):
    total = Fraction(0)
    last_end = None
    for lo, hi in sorted(intervals):
        if last_end is None or lo > last_end:
            total += hi - lo
            last_end = hi
        elif hi > last_end:
            total += hi - last_end
            last_end = hi
    return total


def _diff_len(base, cut):
    """Total length of (∪ base) − (∪ cut), exact."""
    events = []
    for lo, hi in base:
        events.append((lo, 0, 1))
        events.append((hi, 0, -1))
    for lo, hi in cut:
        events.append((lo, 1, 1))
        events.append((hi, 1, -1))
    events.sort()
    nb = nc = 0
    total = Fraction(0)
    prev = None
    for pos, kind, delta in events:
        if prev is not None and nb > 0 and nc == 0:
            total += pos - prev
        if kind == 0:
            nb += delta
        else:
            nc += delta
        prev = pos
    return total


def union_area(polys):
    """Exact area of the union of simple rational rings."""
    return _slab_integral(polys, lambda ivs: _union_len(
        [iv for ring_ivs in ivs for iv in ring_ivs]))


def difference_area(base_polys, cut_polys):
    """Exact area of (∪ base) − (∪ cut)."""
    nb = len(base_polys)

    def measure(ivs):
        base = [iv for r in ivs[:nb] for iv in r]
        cut = [iv for r in ivs[nb:] for iv in r]
        return _diff_len(base, cut)

    return _slab_integral(base_polys + cut_polys, measure)


def _slab_integral(polys, measure):
    xs = _x_breakpoints(polys)
    area = Fraction(0)
    for x0, x1 in zip(xs, xs[1:]):
        if x1 == x0:
            continue
        mid = Fraction(x0 + x1, 2)
        ivs = [_intervals_at(ring, mid) for ring in polys]
        area += (x1 - x0) * measure(ivs)
    return area


def diamond(cx, cy, d):
    return [(cx + d, cy), (cx, cy + d), (cx - d, cy), (cx, cy - d)]


def capsule(a, b, d):
    """Convex hull of the two end diamonds (segment ⊕ diamond) —
    rational convex hull via monotone chain."""
    pts = sorted(set(diamond(a[0], a[1], d) + diamond(b[0], b[1], d)))

    def half(points):
        chain = []
        for p in points:
            while len(chain) >= 2:
                o, q = chain[-2], chain[-1]
                cr = (q[0] - o[0]) * (p[1] - o[1]) \
                    - (q[1] - o[1]) * (p[0] - o[0])
                if cr <= 0:
                    chain.pop()
                else:
                    break
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def buffer_areas_exact(ring, d):
    """(dilation_area, erosion_area) of a simple rational ring by the
    qs=1 diamond of radius d — the independent oracle."""
    d = Fraction(d)
    ring = [(Fraction(x), Fraction(y)) for (x, y) in ring]
    caps = [capsule(a, b, d) for (a, b) in _ring_edges(ring)]
    return (union_area([ring] + caps),
            difference_area([ring], caps))
