"""Viewshed: exact line-of-sight visibility over a DEM window.

The reference's viewshed (``/root/reference/alg/viewshed/``) implements
the Wang-Robinson approximation (each cell's blocking value interpolates
from two PREVIOUSLY-computed cells, enabling a single sweep). This
kernel instead computes the EXACT per-pixel profile — bilinear DEM
samples at every step along the ray — which is (a) the ground truth the
approximation aims at and (b) cross-engine reproducible: every float
operation below is written in the same order as the DuckDB oracle
(left-associated bilinear sum, (k * d) / n parameterization), so the
visibility booleans hash-match even on exact ties.

Model (per observer at integer pixel (ox, oy), eye height H above the
terrain): target at chebyshev distance n = max(|dx|, |dy|) is VISIBLE
iff its elevation angle (dem[target] - h_obs) / n is >= the maximum
over steps k = 1..n-1 of (bilinear(dem, ox + (k*dx)/n, oy + (k*dy)/n)
- h_obs) / k. Targets with n <= 1 are always visible; ties resolve
visible on both engines identically.
"""

from __future__ import annotations

import numpy as np


def _bilinear(dem: np.ndarray, fx: np.ndarray, fy: np.ndarray) -> np.ndarray:
    """Left-associated bilinear sample — term order matches the oracle:
    ((t00 + t10) + t01) + t11."""
    x0 = np.floor(fx)
    y0 = np.floor(fy)
    ax = fx - x0
    ay = fy - y0
    xi = x0.astype(np.int64)
    yi = y0.astype(np.int64)
    h, w = dem.shape
    xi1 = np.minimum(xi + 1, w - 1)
    yi1 = np.minimum(yi + 1, h - 1)
    v00 = dem[yi, xi]
    v10 = dem[yi, xi1]
    v01 = dem[yi1, xi]
    v11 = dem[yi1, xi1]
    t00 = (1.0 - ax) * (1.0 - ay) * v00
    t10 = ax * (1.0 - ay) * v10
    t01 = (1.0 - ax) * ay * v01
    t11 = ax * ay * v11
    return ((t00 + t10) + t01) + t11


def viewshed_window(dem: np.ndarray, ox: int, oy: int, radius: int,
                    obs_height: float) -> np.ndarray:
    """Visibility booleans for the (2R+1)^2 chebyshev window around the
    observer. ``dem`` is the full gathered window in LOCAL coords with
    the observer at (ox, oy); pixels whose window leaves the dem bounds
    must not occur (caller gathers radius+1 of halo).

    Vectorized by chebyshev ring: all pixels at distance n share the
    step count, so each ring is one (P_n, n-1) bilinear batch.
    """
    size = 2 * radius + 1
    vis = np.zeros((size, size), dtype=bool)
    h_obs = float(dem[oy, ox]) + float(obs_height)

    for n in range(0, radius + 1):
        if n == 0:
            vis[radius, radius] = True
            continue
        # ring pixels at chebyshev distance n (local window coords)
        dxs, dys = [], []
        for d in range(-n, n + 1):
            dxs += [d, d]
            dys += [-n, n]
        for d in range(-n + 1, n):
            dxs += [-n, n]
            dys += [d, d]
        dx = np.array(dxs, dtype=np.float64)
        dy = np.array(dys, dtype=np.float64)
        tx = (ox + dx).astype(np.int64)
        ty = (oy + dy).astype(np.int64)
        tgt_angle = (dem[ty, tx] - h_obs) / float(n)
        if n == 1:
            ok = np.ones(len(dx), dtype=bool)
        else:
            ks = np.arange(1, n, dtype=np.float64)
            fx = ox + (ks[None, :] * dx[:, None]) / float(n)
            fy = oy + (ks[None, :] * dy[:, None]) / float(n)
            prof = _bilinear(dem, fx, fy)
            angles = (prof - h_obs) / ks[None, :]
            ok = tgt_angle >= angles.max(axis=1)
        vis[(ty - oy + radius), (tx - ox + radius)] = ok
    return vis
