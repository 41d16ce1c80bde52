"""Delaunay triangulation (Bowyer-Watson) + linear TIN interpolation.

The kernel behind gdal_grid's ``linear`` method (``alg/gdalgrid.cpp``
GDALGridLinear + ``alg/delaunay.c`` — the reference vendors libqhull;
this is a self-contained incremental Bowyer-Watson over numpy arrays,
adequate for the vector-layer point counts gdal_grid sees).

Robustness envelope: float64 determinant predicates with ties broken
toward "outside" (a point exactly ON a circumcircle does not invalidate
the triangle — any tie-broken triangulation is still a valid
triangulation, and the downstream LINEAR interpolation is independent
of which Delaunay variant is produced: a TIN reproduces any affine
field exactly regardless of the diagonal choices). Degenerate inputs
(all points collinear) raise.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(P, tri, i) -> bool:
    """Strict in-circumcircle predicate (ties -> outside)."""
    a, b, c = (P[t] for t in tri)
    # orient CCW first so the determinant sign is canonical
    if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
        b, c = c, b
    p = P[i]
    ax, ay = a[0] - p[0], a[1] - p[1]
    bx, by = b[0] - p[0], b[1] - p[1]
    cx, cy = c[0] - p[0], c[1] - p[1]
    det = (
        (ax * ax + ay * ay) * (bx * cy - by * cx)
        - (bx * bx + by * by) * (ax * cy - ay * cx)
        + (cx * cx + cy * cy) * (ax * by - ay * bx)
    )
    return det > 0.0


def delaunay(px, py):
    """Bowyer-Watson: returns a list of (i, j, k) index triangles over
    the input points (super-triangle scaffolding removed; zero-area
    output triangles dropped)."""
    pts = np.stack(
        [np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64)],
        axis=1,
    )
    n = len(pts)
    if n < 3:
        raise ValueError("need >= 3 points")
    cx, cy = pts.mean(axis=0)
    span = float(max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0)) * 64.0
    P = np.vstack([
        pts,
        [[cx - span, cy - span / 2.0],
         [cx + span, cy - span / 2.0],
         [cx, cy + span]],
    ])
    tris = [(n, n + 1, n + 2)]
    for i in range(n):
        bad = [t for t in tris if _circumcircle_contains(P, t, i)]
        if not bad:
            # exactly-cocircular tie left the point in no cavity; retry
            # with the weak predicate against the nearest triangle edge
            # is unnecessary for generic inputs — treat as degenerate
            # duplicate and skip (duplicates interpolate identically)
            continue
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (e0, e1), cnt in edge_count.items():
            if cnt == 1:
                tris.append((e0, e1, i))
    out = []
    for t in tris:
        if any(v >= n for v in t):
            continue
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        area2 = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if area2 != 0.0:
            out.append(tuple(int(v) for v in t))
    if not out:
        raise ValueError("degenerate input (collinear points)")
    return out


def tin_planes(px, py, pz, tris):
    """Per-triangle affine coefficients (A, B, C) with z = A·x + B·y + C,
    plus the CCW-oriented vertex arrays for containment tests. Returns
    dict of numpy arrays keyed ax/ay/bx/by/cx/cy/A/B/C."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pz = np.asarray(pz, dtype=np.float64)
    rows = {k: [] for k in ("ax", "ay", "bx", "by", "cx", "cy", "A", "B", "C")}
    for i, j, k in tris:
        ax, ay, az = px[i], py[i], pz[i]
        bx, by, bz = px[j], py[j], pz[j]
        cx, cy, cz = px[k], py[k], pz[k]
        d = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if d < 0:  # orient CCW
            bx, by, bz, cx, cy, cz = cx, cy, cz, bx, by, bz
            d = -d
        A = ((bz - az) * (cy - ay) - (cz - az) * (by - ay)) / d
        B = ((cz - az) * (bx - ax) - (bz - az) * (cx - ax)) / d
        C = az - A * ax - B * ay
        for key, v in zip(("ax", "ay", "bx", "by", "cx", "cy", "A", "B", "C"),
                          (ax, ay, bx, by, cx, cy, A, B, C)):
            rows[key].append(float(v))
    return {k: np.array(v) for k, v in rows.items()}


def tin_interpolate(planes, qx, qy, nodata=0.0):
    """Evaluate the TIN at query points: first containing triangle in
    index order wins (points on shared edges get the same value from
    either side by TIN continuity); outside the hull -> nodata."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    out = np.full(qx.shape, float(nodata))
    done = np.zeros(qx.shape, dtype=bool)
    for t in range(len(planes["A"])):
        ax, ay = planes["ax"][t], planes["ay"][t]
        bx, by = planes["bx"][t], planes["by"][t]
        cx, cy = planes["cx"][t], planes["cy"][t]
        s1 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        s2 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
        s3 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
        inside = (s1 >= 0) & (s2 >= 0) & (s3 >= 0) & ~done
        if inside.any():
            out[inside] = (planes["A"][t] * qx[inside]
                           + planes["B"][t] * qy[inside] + planes["C"][t])
            done |= inside
    return out


def concave_hull(px, py, alpha: float):
    """Alpha-shape concave hull (OGRGeometry::ConcaveHull,
    ogrgeometry.cpp:4569 delegates to GEOS ConcaveHull; this is the
    classic Edelsbrunner alpha-shape over the Bowyer-Watson
    triangulation): keep triangles whose circumradius <= alpha, then
    the boundary = edges used by exactly ONE kept triangle, chained
    into a ring. Returns (xs, ys) of the boundary ring (open), or the
    convex-hull degenerate cases as-is. alpha = inf reproduces the
    convex hull exactly."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    tris = delaunay(px, py)
    kept = []
    for (i, j, k) in tris:
        ax, ay, bx, by, cx, cy = px[i], py[i], px[j], py[j], px[k], py[k]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0.0:
            continue
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        if r2 <= alpha * alpha:
            kept.append((i, j, k))
    # boundary edges: used by exactly one kept triangle
    from collections import Counter

    cnt = Counter()
    for (i, j, k) in kept:
        for e in ((i, j), (j, k), (k, i)):
            cnt[tuple(sorted(e))] += 1
    boundary = [e for e, c in cnt.items() if c == 1]
    if not boundary:
        return np.array([]), np.array([])
    # chain edges into a ring (the alpha shape of a connected point set
    # with one component; multi-component shapes return the component
    # containing the first edge)
    adj = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = boundary[0][0]
    ring = [start]
    prev, node = None, start
    while True:
        nbrs = [n for n in adj[node] if n != prev]
        if not nbrs:
            break
        prev, node = node, nbrs[0]
        if node == start:
            break
        ring.append(node)
    return px[ring], py[ring]


def circumcircle(ax, ay, bx, by, cx, cy):
    """Circumcenter and radius of a triangle. Returns (ux, uy, r);
    r = inf for (near-)degenerate triangles."""
    import math

    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return 0.0, 0.0, float("inf")
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    return ux, uy, math.hypot(ax - ux, ay - uy)


def delaunay_certified(px, py, region, extent):
    """Local Bowyer-Watson + the block-merge certification of the
    distributed build (operators/grid.delaunay_tin_distributed):

    a local triangle is a triangle of the GLOBAL Delaunay triangulation
    whenever its circumcircle — clipped to the global point EXTENT
    (points cannot exist outside it, so the part of the circle beyond
    the extent is vacuously empty) — lies inside this block's gather
    ``region``: every global point that could invalidate it was in the
    local set. region=None certifies everything (the gather was the
    whole point set).

    Returns [(i, j, k), ...] certified triangles (local indices)."""
    tris = delaunay(px, py)
    if region is None:
        return tris
    rx0, ry0, rx1, ry1 = region
    ex0, ey0, ex1, ey1 = extent
    out = []
    for (i, j, k) in tris:
        ux, uy, r = circumcircle(px[i], py[i], px[j], py[j], px[k], py[k])
        cx0 = max(ux - r, ex0)
        cx1 = min(ux + r, ex1)
        cy0 = max(uy - r, ey0)
        cy1 = min(uy + r, ey1)
        if cx0 >= rx0 and cx1 <= rx1 and cy0 >= ry0 and cy1 <= ry1:
            out.append((i, j, k))
    return out
