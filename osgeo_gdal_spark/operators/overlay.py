"""Overlay operators emitting geometries.

v1 scope: CLIP against an axis rect (the ogr2ogr ``-clipsrc xmin ymin
xmax ymax`` path, ``apps/ogr2ogr_lib.cpp:2460-2545``; layer-algebra Clip
``ogrlayer.cpp:7537``), Sutherland-Hodgman per ring — no GEOS needed.
General polygon∩polygon clipping stays a named extension point (the
container has no shapely; the kernel slot is ``kernels/clip.py``).

Distributed shape: a mapInPandas over the feature rows (features are the
SMALL side of every workload here; each clip is O(ring vertices)). A
native bbox prefilter drops features entirely outside the window before
any Python runs, and — the GeoParquet covering-column pattern — lets
Catalyst prune files on the flat bbox struct.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import clip as CL, wkb as W

_CLIP_SCHEMA_EXTRA = [
    T.StructField("clip_wkb", T.BinaryType()),
    T.StructField("clip_area", T.DoubleType()),
    T.StructField("clip_npts", T.IntegerType()),
]


def clip_features_rect(feats: DataFrame, rect, geom_col="geometry",
                       keep_cols=("fid", "eas_id")) -> DataFrame:
    """Clip every feature's polygon rings to ``rect`` = (x0, y0, x1, y1).

    Returns keep_cols + (clip_wkb, clip_area, clip_npts); features whose
    clipped geometry is empty are DROPPED (ogr2ogr -clipsrc drops
    fully-outside features). clip_area is |shoelace| summed signed over
    rings, so holes subtract.
    """
    x0, y0, x1, y1 = (float(v) for v in rect)
    cols = list(keep_cols)

    # native bbox prefilter: no Python for features fully outside
    pre = feats.filter(
        (F.col("bbox.xmin") <= x1) & (F.col("bbox.xmax") >= x0)
        & (F.col("bbox.ymin") <= y1) & (F.col("bbox.ymax") >= y0)
    ) if "bbox" in feats.columns else feats

    out_schema = T.StructType(
        [feats.schema[c] for c in cols] + _CLIP_SCHEMA_EXTRA
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                g = W.parse_wkb(bytes(row[geom_col]))
                rings = []
                area = 0.0
                ring_i = 0
                for nrings in g.part_rings:
                    for j in range(int(nrings)):
                        s, e = (g.ring_offsets[ring_i],
                                g.ring_offsets[ring_i + 1])
                        cx, cy = CL.sh_clip_ring(
                            g.xs[s:e], g.ys[s:e], x0, y0, x1, y1)
                        ring_i += 1
                        if len(cx) < 3:
                            continue
                        a = CL.ring_area(cx, cy)
                        # ring orientation encodes shell vs hole; the
                        # signed sum is the clipped area
                        if j == 0:
                            area += abs(a)
                        else:
                            area -= abs(a)
                        rings.append(list(zip(cx.tolist(), cy.tolist())))
                if not rings or area <= 0:
                    continue
                rows.append(
                    {**{c: row[c] for c in cols},
                     "clip_wkb": W.polygon_wkb(rings),
                     "clip_area": float(area),
                     "clip_npts": int(sum(len(r) for r in rings))}
                )
            if rows:
                yield pd.DataFrame(rows)

    return pre.mapInPandas(kernel, out_schema)
