"""Douglas-Peucker line/ring simplification.

The numpy-implementable member of OGR's simplify family
(``OGRGeometry::Simplify``, /root/reference/ogr/ogrgeometry.cpp:6778 —
GEOS-delegating in the reference; classic DP here). Iterative stack
implementation (no recursion limits) over packed coordinate arrays;
``simplify_ring`` keeps rings closed and >= 4 points (the OGR validity
floor for rings).
"""

from __future__ import annotations

import numpy as np


def _seg_dist(px, py, ax, ay, bx, by):
    """Perpendicular distance of points to segment AB (degenerate AB ->
    distance to A)."""
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0.0:
        return np.hypot(px - ax, py - ay)
    t = ((px - ax) * dx + (py - ay) * dy) / L2
    t = np.clip(t, 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def simplify_line(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for an open polyline (endpoints always kept)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = slice(i + 1, j)
        d = _seg_dist(xs[seg], ys[seg], xs[i], ys[i], xs[j], ys[j])
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_ring(xs: np.ndarray, ys: np.ndarray, tol: float):
    """Simplify a closed ring (first == last point). Anchors the split at
    the ring start and the farthest vertex from it, then DP's both halves.
    Returns (xs', ys') closed; degenerate results collapse to the original
    ring (minimum 4 points incl. closure)."""
    n = len(xs)
    if n <= 4:
        return xs, ys
    body_x, body_y = xs[:-1], ys[:-1]
    d0 = np.hypot(body_x - body_x[0], body_y - body_y[0])
    far = int(np.argmax(d0))
    if far == 0:
        return xs, ys
    keep = np.zeros(n - 1, dtype=bool)
    k1 = simplify_line(body_x[: far + 1], body_y[: far + 1], tol)
    keep[: far + 1] |= k1
    wrap_x = np.concatenate([body_x[far:], body_x[:1]])
    wrap_y = np.concatenate([body_y[far:], body_y[:1]])
    k2 = simplify_line(wrap_x, wrap_y, tol)
    keep[far:] |= k2[:-1]
    keep[0] = True
    if keep.sum() < 3:
        return xs, ys
    out_x = np.concatenate([body_x[keep], body_x[:1]])
    out_y = np.concatenate([body_y[keep], body_y[:1]])
    return out_x, out_y
