"""Polygonal-coverage operations: clean-coverage and simplify-coverage.

Re-expresses ``gdal vector clean-coverage`` / ``simplify-coverage``
(``/root/reference/apps/gdalalg_vector_clean_coverage.cpp``,
``gdalalg_vector_simplify_coverage.cpp``), which the reference delegates
to GEOS CoverageCleaner / CoverageSimplifier. The container has no GEOS,
so both are built on this repo's integer snap-rounded arrangement
(kernels/snap._rounded_core):

- **clean**: snap-rounding at the grid IS the node-snapping step (the
  ``snapping-distance`` option); the joint arrangement's faces are
  classified by polygon membership, then OVERLAP faces (owned by 2+
  polygons) merge into one owner by the reference's strategies
  (``longest-border`` / ``max-area`` / ``min-area`` / ``min-index``,
  clean_coverage.cpp:112-133) and bounded GAP faces (owned by none)
  merge into the neighbor with the longest shared border when their
  area is within ``max_gap_area`` (the ``maximum-gap-width`` analog —
  area-based here since the face decomposition gives exact areas).
  Polygons rebuild from the owner map by boundary-segment selection,
  so the result is an exact partition: no gaps below threshold, no
  overlaps, total area == covered area (the conservation oracle).

- **simplify**: the arrangement's ARCS (maximal chains through
  degree-2 nodes) are Douglas-Peucker-simplified ONCE each in a
  canonical orientation, then every polygon rebuilds from the shared
  simplified arcs — neighbors keep identical borders, so the coverage
  stays gap- and overlap-free by construction (the CoverageSimplifier
  contract). ``preserve_boundary`` keeps arcs on the exterior (outer
  face) unsimplified (simplify_coverage.cpp:41-43).

Multi-component faces (nested containment — a polygon inside another
polygon's face, the annulus case) are handled by merging each negative
boundary cycle into the face of the smallest positive cycle containing
its witness (the DCEL hole-assignment rule; the round-5 Hypothesis
suite over random rect coverages found the original single-cycle
assumption). Caveat: Douglas-Peucker can in principle self-intersect
at extreme tolerances (GEOS guards; callers keep tolerance below
feature size).
"""

from __future__ import annotations

import math

import numpy as np

from .clip import ring_area
from .overlay_kernel import _points_in_rings
from .simplify import simplify_line
from . import snap as SN


def _face_walk(segs_u):
    """Planar face traversal over ALL directed sub-segments: at vertex
    v reached from u, the successor is the neighbor CLOCKWISE-next
    from the reversed direction (v->u) — every face traced once with
    its interior on the LEFT (bounded faces come out CCW, outer faces
    CW / negative area). Returns (faces, seg_face): vertex cycles and
    the directed-segment -> face-index map."""
    nbrs: dict = {}
    for (ax, ay, bx, by) in segs_u:
        a, b = (ax, ay), (bx, by)
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    ang = {
        n: sorted(ns, key=lambda p: math.atan2(p[1] - n[1], p[0] - n[0]))
        for n, ns in nbrs.items()
    }
    faces = []
    seg_face: dict = {}
    for (ax, ay, bx, by) in segs_u:
        for a, b in (((ax, ay), (bx, by)), ((bx, by), (ax, ay))):
            if (a, b) in seg_face:
                continue
            fid = len(faces)
            cycle = []
            u, v = a, b
            while (u, v) not in seg_face:
                seg_face[(u, v)] = fid
                cycle.append(u)
                order = ang[v]
                i = order.index(u)
                w = order[(i - 1) % len(order)]
                u, v = v, w
            faces.append(cycle)
    return faces, seg_face


def _face_areas(faces):
    out = []
    for cycle in faces:
        xs = np.array([p[0] for p in cycle])
        ys = np.array([p[1] for p in cycle])
        out.append(float(ring_area(xs, ys)))
    return out


def _arrangement(polys, grid):
    """Common core: snap each polygon's ring soup, build the joint
    rounded arrangement, walk all faces, MERGE hole cycles into their
    containing faces (a face may have several boundary components —
    the annulus case the round-5 Hypothesis suite caught: a nested
    polygon's outer ring is also the inner boundary of the container's
    face) and classify memberships. Returns (pids, lat_groups, segs_u,
    faces, seg_face, areas, owners_sets); areas/owners are meaningful
    for faces with area > 0 after merging."""
    pids = [p for p, _ in polys]
    groups = [SN.snap_rings(r, grid) for _, r in polys]
    lat_groups, segs_u, seg_groups = SN._rounded_core(groups, grid)
    faces, seg_face = _face_walk(segs_u)
    areas = _face_areas(faces)

    # one interior witness per cycle (left probe of its first segment)
    first_seg = [None] * len(faces)
    for (ax, ay, bx, by) in segs_u:
        for a, b in (((ax, ay), (bx, by)), ((bx, by), (ax, ay))):
            fid = seg_face[(a, b)]
            if first_seg[fid] is None:
                first_seg[fid] = (a[0], a[1], b[0], b[1])
    wx, wy, _rx, _ry = SN._side_probes(first_seg, lat_groups)

    # merge each NEGATIVE cycle into the face of the smallest positive
    # cycle strictly containing its witness (immediate parent); global
    # outer cycles contain no parent and stay unmerged
    pos = [f for f in range(len(faces)) if areas[f] > 0]
    pos_rings = {
        p: [(np.array([v[0] for v in faces[p]], dtype=np.float64),
             np.array([v[1] for v in faces[p]], dtype=np.float64))]
        for p in pos
    }
    remap = {}
    for f in range(len(faces)):
        if areas[f] > 0:
            continue
        cands = [
            (areas[p], p) for p in pos
            if p != f and bool(_points_in_rings(
                np.array([wx[f]]), np.array([wy[f]]), pos_rings[p])[0])
        ]
        if cands:
            remap[f] = min(cands)[1]
    if remap:
        for k in seg_face:
            seg_face[k] = remap.get(seg_face[k], seg_face[k])
        for f, p in remap.items():
            areas[p] += areas[f]
            areas[f] = 0.0

    members = [
        _points_in_rings(wx, wy, g) for g in lat_groups
    ]
    owners = [
        {pids[g] for g in range(len(pids)) if members[g][fid]}
        for fid in range(len(faces))
    ]
    return (pids, lat_groups, segs_u, seg_groups, faces, seg_face,
            areas, owners)


def _border_scores(fid, faces, seg_face, segs_u, owner_of, candidates):
    """Shared-border length of face ``fid`` with each candidate owner's
    exclusively-owned neighbor faces (the longest-border metric)."""
    score = {c: 0.0 for c in candidates}
    for (ax, ay, bx, by) in segs_u:
        for a, b in (((ax, ay), (bx, by)), ((bx, by), (ax, ay))):
            if seg_face[(a, b)] != fid:
                continue
            other = seg_face[(b, a)]
            o = owner_of.get(other)
            if o in score:
                score[o] += math.hypot(b[0] - a[0], b[1] - a[1])
    return score


def clean_coverage(polys, grid: float = None,
                   merge_strategy: str = "longest-border",
                   max_gap_area: float = None):
    """Clean a polygonal coverage: returns {pid: ring soup} in WORLD
    coordinates forming an exact partition (see module docstring).
    ``polys`` is a list of (pid, ring_soup); ``max_gap_area`` in world
    units (None = close every bounded gap)."""
    if merge_strategy not in ("longest-border", "max-area", "min-area",
                              "min-index"):
        raise ValueError(f"unknown merge strategy {merge_strategy!r}")
    if grid is None:
        grid = SN.default_grid([r for _, rs in polys for r in rs], [])
    pids, lat_groups, segs_u, _sg, faces, seg_face, areas, owners = \
        _arrangement(polys, grid)
    poly_area = {
        p: SN.rings_area(g) for p, g in zip(pids, lat_groups)
    }

    owner_of: dict = {}
    # pass 1: uniquely-owned faces + overlap resolution
    for fid, own in enumerate(owners):
        if areas[fid] <= 0:
            continue                     # outer face(s)
        if len(own) == 1:
            owner_of[fid] = next(iter(own))
        elif len(own) > 1:
            if merge_strategy == "min-index":
                owner_of[fid] = min(own)
            elif merge_strategy == "max-area":
                # ties break to the smallest pid, deterministically
                owner_of[fid] = min(own, key=lambda p: (-poly_area[p], p))
            elif merge_strategy == "min-area":
                owner_of[fid] = min(own, key=lambda p: (poly_area[p], p))
    # longest-border for overlaps needs pass-1 owners of the neighbors
    if merge_strategy == "longest-border":
        for fid, own in enumerate(owners):
            if areas[fid] > 0 and len(own) > 1:
                sc = _border_scores(fid, faces, seg_face, segs_u,
                                    owner_of, own)
                best = max(sc.values())
                owner_of[fid] = min(p for p, s in sc.items() if s == best)
    # pass 2: gaps merge into the longest-border neighbor
    gap_limit = None if max_gap_area is None else \
        float(max_gap_area) / (grid * grid)
    for fid, own in enumerate(owners):
        if areas[fid] <= 0 or own:
            continue
        if gap_limit is not None and areas[fid] > gap_limit:
            continue
        nbr = set()
        for (ax, ay, bx, by) in segs_u:
            for a, b in (((ax, ay), (bx, by)), ((bx, by), (ax, ay))):
                if seg_face[(a, b)] == fid:
                    o = owner_of.get(seg_face[(b, a)])
                    if o is not None:
                        nbr.add(o)
        if not nbr:
            continue
        sc = _border_scores(fid, faces, seg_face, segs_u, owner_of, nbr)
        best = max(sc.values())
        owner_of[fid] = min(p for p, s in sc.items() if s == best)

    # rebuild: per pid, keep segments whose two adjacent faces differ
    # in pid-ownership, directed interior-on-left
    out = {}
    for pid in pids:
        kept = []
        for (ax, ay, bx, by) in segs_u:
            fl = owner_of.get(seg_face[((ax, ay), (bx, by))]) == pid
            fr = owner_of.get(seg_face[((bx, by), (ax, ay))]) == pid
            if fl == fr:
                continue
            kept.append((ax, ay, bx, by) if fl else (bx, by, ax, ay))
        cycles = SN._assemble_faces(kept)
        out[pid] = [(xs * grid, ys * grid) for xs, ys in cycles]
    return out


def simplify_coverage(polys, tolerance: float, grid: float = None,
                      preserve_boundary: bool = False):
    """Coverage-consistent simplification: returns {pid: ring soup} in
    WORLD coordinates with every shared arc Douglas-Peucker-simplified
    exactly once (see module docstring). Assumes a valid coverage
    (clean first if needed)."""
    if grid is None:
        grid = SN.default_grid([r for _, rs in polys for r in rs], [])
    pids, lat_groups, segs_u, _sg, faces, seg_face, areas, owners = \
        _arrangement(polys, grid)
    owner_of = {
        fid: next(iter(own))
        for fid, own in enumerate(owners) if areas[fid] > 0 and len(own) == 1
    }

    # node degrees -> arc split points
    deg: dict = {}
    adj: dict = {}
    for (ax, ay, bx, by) in segs_u:
        a, b = (ax, ay), (bx, by)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    # trace maximal arcs through degree-2 nodes
    used = set()
    arcs = []

    def _key(a, b):
        return (a, b) if a <= b else (b, a)

    def _trace(a, b):
        path = [a, b]
        while deg[path[-1]] == 2 and path[-1] != path[0]:
            n1, n2 = adj[path[-1]]
            nxt = n2 if n1 == path[-2] else n1
            path.append(nxt)
        return path

    for n in sorted(deg):
        if deg[n] == 2:
            continue
        for m in sorted(adj[n]):
            if _key(n, m) in used:
                continue
            path = _trace(n, m)
            for u, v in zip(path, path[1:]):
                used.add(_key(u, v))
            arcs.append(path)
    # pure cycles (no degree!=2 node on them)
    for (ax, ay, bx, by) in segs_u:
        a, b = (ax, ay), (bx, by)
        if _key(a, b) in used:
            continue
        path = _trace(a, b)
        for u, v in zip(path, path[1:]):
            used.add(_key(u, v))
        arcs.append(path)

    # simplify each arc ONCE in canonical orientation
    simp = []
    for path in arcs:
        canon = path if path[0] <= path[-1] else path[::-1]
        first = seg_face[(canon[0], canon[1])]
        second = seg_face[(canon[1], canon[0])]
        exterior = (owner_of.get(first) is None
                    or owner_of.get(second) is None)
        if (preserve_boundary and exterior) or len(canon) <= 2:
            simp.append((path, canon))
            continue
        xs = np.array([p[0] for p in canon])
        ys = np.array([p[1] for p in canon])
        keepm = simplify_line(xs, ys, float(tolerance) / grid)
        sc = [canon[i] for i in range(len(canon)) if keepm[i]]
        simp.append((path, sc))     # sc stored in CANONICAL orientation

    # per-arc owner pair (constant along the arc: faces change only at
    # degree>=3 nodes)
    out = {}
    for pid in pids:
        kept = []
        for path, canon_s in simp:
            canon = path if path[0] <= path[-1] else path[::-1]
            left = owner_of.get(seg_face[(canon[0], canon[1])])
            right = owner_of.get(seg_face[(canon[1], canon[0])])
            if (left == pid) == (right == pid):
                continue
            pts = canon_s if left == pid else canon_s[::-1]
            for u, v in zip(pts, pts[1:]):
                kept.append((u[0], u[1], v[0], v[1]))
        cycles = SN._assemble_faces(kept)
        out[pid] = [(xs * grid, ys * grid) for xs, ys in cycles]
    return out


def check_coverage(polys, grid: float = None, max_gap_area: float = None):
    """``gdal vector check-coverage``
    (apps/gdalalg_vector_check_coverage.cpp; GEOS CoverageValidator
    "invalid_edge" output): report each polygon's INVALID boundary —
    sub-segments adjacent to an overlap face (owned by 2+ polygons) or
    to an enclosed gap face within the ``max_gap_area`` threshold
    (None = every bounded gap is a defect; wider gaps count as
    legitimate holes, the maximum-gap-width semantics). Returns
    {pid: (n_invalid_segs, invalid_len)} in WORLD units; lengths use
    sqrt(dx^2+dy^2) (IEEE-exact cross-engine, unlike hypot)."""
    if grid is None:
        grid = SN.default_grid([r for _, rs in polys for r in rs], [])
    pids, lat_groups, segs_u, seg_groups, faces, seg_face, areas, owners =         _arrangement(polys, grid)
    gap_limit = None if max_gap_area is None else         float(max_gap_area) / (grid * grid)
    bad = set()
    for fid, own in enumerate(owners):
        if areas[fid] <= 0:
            continue
        if len(own) >= 2:
            bad.add(fid)
        elif not own and (gap_limit is None or areas[fid] <= gap_limit):
            bad.add(fid)
    gidx = {p: i for i, p in enumerate(pids)}
    out = {p: [0, 0.0] for p in pids}
    for i, (ax, ay, bx, by) in enumerate(segs_u):
        fl = seg_face[((ax, ay), (bx, by))]
        fr = seg_face[((bx, by), (ax, ay))]
        if fl not in bad and fr not in bad:
            continue
        dx, dy = bx - ax, by - ay
        ln = float(np.sqrt(dx * dx + dy * dy)) * grid
        for g in seg_groups[i]:
            p = pids[g]
            out[p][0] += 1
            out[p][1] += ln
    return {p: (n, l) for p, (n, l) in out.items()}
