"""Distance kernels for kNN scoring.

- ``haversine_m``: great-circle distance on the GDAL sphere (a=6378137,
  the WebMercator sphere — consistent with the engine's mercator math).
- ``planar_deg2``: squared planar lon/lat distance. Pure multiply/add, so
  it is bit-identical between numpy, Spark SQL and DuckDB — the metric the
  oracle-checked kNN query pins (tie-break: url asc). The candidate-gather
  pattern mirrors ``/root/reference/alg/gdalgrid.cpp:242-277`` (invdistnn
  per-cell radius search).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle meters on the sphere; vectorized."""
    lat1, lon1, lat2, lon2 = (
        np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2)
    )
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS * np.arcsin(np.sqrt(h))


def planar_deg2(lat1, lon1, lat2, lon2):
    """Squared planar degree distance (exact-arithmetic kNN metric)."""
    dx = np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)
    dy = np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)
    return dx * dx + dy * dy
