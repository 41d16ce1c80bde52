"""Overlay operators emitting geometries.

- CLIP against an axis rect (the ogr2ogr ``-clipsrc xmin ymin xmax ymax``
  path, ``apps/ogr2ogr_lib.cpp:2460-2545``; layer-algebra Clip
  ``ogrlayer.cpp:7537``), Sutherland-Hodgman per ring;
- general layer-algebra Intersection / Union / Erase emitting geometries
  (``ogrlayer.cpp:5385`` Intersection, ``:5803`` Union, ``:6158`` Erase)
  via the GEOS-free edge-classification kernel in
  ``kernels/overlay_kernel.py``.

Distributed shape: candidate (feature, polygon) pairs come from the
broadcast cell-cover machinery of ``operators/spatial_join.py`` (the
big feature side never shuffles; the polygon layer broadcasts), then an
Arrow batch runs the per-pair boolean kernel. A native bbox prefilter
drops features entirely outside the window before any Python runs, and
— the GeoParquet covering-column pattern — lets Catalyst prune files on
the flat bbox struct.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import clip as CL, overlay_kernel as OVK, wkb as W
from ..session import local_df

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


# --- general layer algebra (Intersection / Union / Erase) ----------------

_PIECE_FIELDS = [
    T.StructField("piece_wkb", T.BinaryType()),
    T.StructField("piece_area", T.DoubleType()),
    T.StructField("piece_npts", T.IntegerType()),
]

_RINGS_CACHE: dict = {}


def _prepared_rings(payload, key):
    """Per-executor cache: polygon fid -> ring soup (parse WKB once per
    payload, not once per Arrow batch). Keeps the last few payloads so
    two overlay jobs interleaving Arrow batches in one Python worker
    don't evict each other every batch."""
    got = _RINGS_CACHE.get(key)
    if got is None:
        got = {
            fid: OVK.geometry_rings(W.parse_wkb(bytes(buf)))
            for fid, buf in payload
        }
        while len(_RINGS_CACHE) >= 4:
            _RINGS_CACHE.pop(next(iter(_RINGS_CACHE)))
        _RINGS_CACHE[key] = got
    return got


def overlay_features(spark, feats: DataFrame, polys, op: str,
                     keep_cols=("fid", "a_id"), geom_col="geometry",
                     zoom=None) -> DataFrame:
    """Pairwise layer-algebra overlay: for every intersecting
    (feature, polygon) pair, emit the boolean-op geometry.

    op='intersection' is OGRLayer::Intersection (ogrlayer.cpp:5385): one
    output row per intersecting pair with both sides' attributes.
    op='union' emits the PAIRWISE union piece (the A∪B geometry per
    matched pair — area oracle: |A| + |B| − |A∩B|).

    Plan shape: spatial_join_polygons provides the matched pairs (cell
    cover broadcast + native bbox prefilter + exact intersects refine);
    this adds one Arrow pass running the edge-classification kernel with
    the polygon payload broadcast — features never shuffle.
    """
    from . import spatial_join as SJ

    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(spark, feats, polys, **kw)

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    opv = str(op)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType())]
        + _PIECE_FIELDS
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                res = OVK.overlay_rings(ra, rb, opv)
                area = OVK.rings_area(res)
                if not res or area <= 0:
                    continue
                rows.append(
                    {**{c: row[c] for c in cols},
                     "eas_id": int(row["eas_id"]),
                     "piece_wkb": OVK.rings_to_wkb(res),
                     "piece_area": float(area),
                     "piece_npts": int(sum(len(xs) for xs, _ in res))}
                )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def erase_features(spark, feats: DataFrame, polys,
                   keep_cols=("fid", "a_id"), geom_col="geometry",
                   zoom=None) -> DataFrame:
    """Layer-algebra Erase (ogrlayer.cpp:6158): each feature minus the
    union of every polygon it intersects; features intersecting nothing
    pass through whole. Output: keep_cols + (piece_wkb, piece_area,
    piece_npts); features fully erased are dropped.

    Plan shape: matched pairs -> groupBy(feature) -> applyInPandas
    difference fold (the method layer broadcasts; each feature's fold is
    O(matched polys) kernel calls), then a left-anti union for the
    untouched features — two jobs total, no feature payload shuffle
    beyond the matched subset.
    """
    from . import spatial_join as SJ

    kw = {} if zoom is None else {"zoom": zoom}
    # pin the matched-pair table: both the piece fold and the untouched
    # left-anti read it — unmaterialized, the whole cell-cover join +
    # PIP refine chain evaluates twice (measured ~0.3s/query at sf0.1);
    # the standard materialize-reused-intermediate move (guide §3.3),
    # bounded by the join's matched subset
    matched = SJ.spatial_join_polygons(spark, feats, polys, **kw) \
        .localCheckpoint()

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols] + _PIECE_FIELDS
    )

    def fold(pdf):
        import pandas as pd

        rings_by_fid = _prepared_rings(bc.value, key)
        row0 = pdf.iloc[0]
        acc = OVK.geometry_rings(W.parse_wkb(bytes(row0[geom_col])))
        # sorted fold order: difference results are order-independent in
        # exact arithmetic but not in floats — keep runs reproducible
        for bf in sorted(int(v) for v in pdf["b_fid"]):
            if not acc:
                break
            acc = OVK.overlay_rings(acc, rings_by_fid[bf], "difference")
        area = OVK.rings_area(acc)
        if not acc or area <= 0:
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in out_schema}
            )
        return pd.DataFrame(
            [{**{c: row0[c] for c in cols},
              "piece_wkb": OVK.rings_to_wkb(acc),
              "piece_area": float(area),
              "piece_npts": int(sum(len(xs) for xs, _ in acc))}]
        )

    erased = matched.groupBy("fid").applyInPandas(fold, out_schema)

    untouched = feats.join(
        matched.select("fid").distinct(), "fid", "left_anti"
    )

    def whole(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rings = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rows.append(
                    {**{c: row[c] for c in cols},
                     "piece_wkb": OVK.rings_to_wkb(rings),
                     "piece_area": float(OVK.rings_area(rings)),
                     "piece_npts": int(sum(len(xs) for xs, _ in rings))}
                )
            if rows:
                yield pd.DataFrame(rows)

    return erased.unionByName(untouched.mapInPandas(whole, out_schema))


def identity_features(spark, feats: DataFrame, polys,
                      keep_cols=("fid", "a_id"), geom_col="geometry",
                      zoom=None) -> DataFrame:
    """Layer-algebra Identity (``ogrlayer.cpp:6770``): every input
    feature split by the method layer — one A∩B piece per intersecting
    method polygon (method attributes set) plus the A − ∪B residual
    piece with method attributes NULL; features touching nothing pass
    through whole (also NULL method attrs, via the erase pass-through).

    SINGLE-PASS shape (not Intersection ∪ Erase, which would scan and
    join the 100 TB feature side twice): one broadcast cell-cover join
    produces the matched pairs, one groupBy(feature) fold emits every
    intersection piece AND the running-difference residual together,
    then the untouched features pass through whole via a left-anti —
    exactly the Erase plan's cost plus the per-pair intersection kernel
    calls inside the same Arrow batch.
    """
    from . import spatial_join as SJ

    kw = {} if zoom is None else {"zoom": zoom}
    # pin the matched-pair table: both the piece fold and the untouched
    # left-anti read it — unmaterialized, the whole cell-cover join +
    # PIP refine chain evaluates twice (measured ~0.3s/query at sf0.1);
    # the standard materialize-reused-intermediate move (guide §3.3),
    # bounded by the join's matched subset
    matched = SJ.spatial_join_polygons(spark, feats, polys, **kw) \
        .localCheckpoint()

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType())]
        + _PIECE_FIELDS
    )

    def _piece_row(row0, eas, rings):
        return {**{c: row0[c] for c in cols},
                "eas_id": eas,
                "piece_wkb": OVK.rings_to_wkb(rings),
                "piece_area": float(OVK.rings_area(rings)),
                "piece_npts": int(sum(len(xs) for xs, _ in rings))}

    def fold(pdf):
        import pandas as pd

        rings_by_fid = _prepared_rings(bc.value, key)
        row0 = pdf.iloc[0]
        ra = OVK.geometry_rings(W.parse_wkb(bytes(row0[geom_col])))
        eas_by_bfid = {int(b): int(e)
                       for b, e in zip(pdf["b_fid"], pdf["eas_id"])}
        acc = ra
        rows = []
        # sorted fold order: reproducible float difference chain (same
        # contract as erase_features)
        for bf in sorted(eas_by_bfid):
            rb = rings_by_fid[bf]
            piece = OVK.overlay_rings(ra, rb, "intersection")
            if piece and OVK.rings_area(piece) > 0:
                rows.append(_piece_row(row0, eas_by_bfid[bf], piece))
            if acc:
                acc = OVK.overlay_rings(acc, rb, "difference")
        if acc and OVK.rings_area(acc) > 0:
            rows.append(_piece_row(row0, None, acc))
        if not rows:
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in out_schema}
            )
        return pd.DataFrame(rows)

    split = matched.groupBy("fid").applyInPandas(fold, out_schema)

    untouched = feats.join(
        matched.select("fid").distinct(), "fid", "left_anti"
    )

    def whole(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rings = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rows.append(_piece_row(row, None, rings))
            if rows:
                yield pd.DataFrame(rows)

    return split.unionByName(untouched.mapInPandas(whole, out_schema))


def update_features(spark, feats: DataFrame, polys,
                    keep_cols=("fid", "a_id"), geom_col="geometry",
                    zoom=None) -> DataFrame:
    """Layer-algebra Update (``ogrlayer.cpp:7188``): the input layer
    with the method-layer footprints replaced by the method features —
    A − ∪B pieces carrying the input attributes, plus every method
    feature whole (input attributes NULL; OGR keeps only the A schema,
    so like OGR we surface no method fields beyond the identifying
    ``eas_id``).

    The method layer is the broadcast-scale dim side (it already ships
    to every executor as the overlay payload), so its whole-feature
    rows are built driver-side — no extra job.
    """
    er = erase_features(spark, feats, polys, keep_cols=keep_cols,
                        geom_col=geom_col, zoom=zoom)
    er = er.withColumn("eas_id", F.lit(None).cast("long"))

    cols = list(keep_cols)
    brows = []
    for pf in polys:
        rings = OVK.geometry_rings(W.parse_wkb(pf.wkb()))
        brows.append(
            {**{c: None for c in cols},
             "eas_id": int(pf.eas_id),
             "piece_wkb": bytearray(OVK.rings_to_wkb(rings)),
             "piece_area": float(OVK.rings_area(rings)),
             "piece_npts": int(sum(len(xs) for xs, _ in rings))}
        )
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in er.schema]
    )
    bdf = local_df(spark, 
        [tuple(r[f.name] for f in out_schema) for r in brows], out_schema
    )
    return er.select(*[f.name for f in out_schema]).unionByName(bdf)


def overlay_features_snapped(spark, feats: DataFrame, polys, op: str,
                             grid: float = None,
                             keep_cols=("fid", "a_id"),
                             geom_col="geometry", zoom=None) -> DataFrame:
    """Layer-algebra overlay WITHOUT the general-position contract: both
    sides pass through the snap-rounding kernel (kernels/snap.py), so
    vertex-on-edge contacts, shared collinear edges and near-coincident
    boundaries — the cases overlay_features refuses — are handled.  The
    GEOS analog is ST_SetPrecision + snap-rounded overlay; the reference
    reaches the same semantics via the layer-algebra SNAP options
    (ogr/ogrsf_frmts/generic/ogrlayer.cpp:5402).

    Plan shape matches overlay_features (broadcast cell cover + bbox
    prefilter + one Arrow pass, features never shuffle) with one
    difference: candidates use the CLOSED envelope comparison and skip
    the strict-interior refine — boundary-only contacts must reach the
    kernel, and pairs whose op result is empty simply emit nothing.

    ``grid`` is the snap resolution in world units (power of two;
    defaults per pair from coordinate magnitude). Output rows carry the
    AREAL result only (boundary-only contacts yield no row for
    op='intersection').
    """
    from ..kernels import snap as SN
    from . import spatial_join as SJ

    if grid is None:
        # derive one layer-wide grid from the polygon payload magnitude
        # so the candidate dilation below matches the kernel's default
        grid = SN.default_grid(
            [], [(_g.xs, _g.ys) for pf in polys
                 for _g in [W.parse_wkb(pf.wkb())]]
        )
    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(
        spark, feats, polys, predicate="candidates_closed",
        dilate=float(grid), **kw
    )

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    opv = str(op)
    gridv = grid
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType())]
        + _PIECE_FIELDS
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                res = SN.overlay_rings_snapped(ra, rb, opv, gridv)
                area = SN.rings_area(res)
                if not res or area <= 0:
                    continue
                rows.append(
                    {**{c: row[c] for c in cols},
                     "eas_id": int(row["eas_id"]),
                     "piece_wkb": OVK.rings_to_wkb(res),
                     "piece_area": float(area),
                     "piece_npts": int(sum(len(xs) for xs, _ in res))}
                )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def overlay_areas_features_snapped(spark, feats: DataFrame, polys,
                                   grid: float = None,
                                   keep_cols=("fid", "a_id"),
                                   geom_col="geometry",
                                   zoom=None) -> DataFrame:
    """Per-pair snapped overlay AREAS — intersection, union and A−B in
    ONE noding+classification pass per pair (kernels/snap.
    overlay_areas_snapped), over the same closed-envelope candidate
    plan as overlay_features_snapped. The shape for per-pair area
    reports where the geometries themselves aren't needed."""
    from ..kernels import snap as SN
    from . import spatial_join as SJ

    if grid is None:
        grid = SN.default_grid(
            [], [(_g.xs, _g.ys) for pf in polys
                 for _g in [W.parse_wkb(pf.wkb())]]
        )
    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(
        spark, feats, polys, predicate="candidates_closed",
        dilate=float(grid), **kw
    )
    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    gridv = float(grid)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType()),
           T.StructField("i_area", T.DoubleType()),
           T.StructField("u_area", T.DoubleType()),
           T.StructField("d_area", T.DoubleType())]
    )

    def kernel(batches):
        import pandas as pd

        from ..kernels import snap as SN2

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                ar = SN2.overlay_areas_snapped(ra, rb, gridv)
                rows.append(
                    {**{c: row[c] for c in cols},
                     "eas_id": int(row["eas_id"]),
                     "i_area": float(ar["i"]),
                     "u_area": float(ar["u"]),
                     "d_area": float(ar["d"])}
                )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def overlay_lines_features_snapped(spark, feats: DataFrame, polys,
                                   grid: float = None,
                                   keep_cols=("fid", "a_id"),
                                   geom_col="geometry",
                                   zoom=None) -> DataFrame:
    """Per-pair LOWER-DIMENSIONAL overlay component — the LINESTRING
    rows GDAL's layer algebra emits for boundary-only intersections
    (KEEP_LOWER_DIMENSION_GEOMETRIES, ogrlayer.cpp:5402-5411; GEOS
    returns the shared edge when two polygons touch along a border).
    kernels/snap.overlay_lines_snapped classifies snap-rounded
    sub-segments by boundary provenance + side membership and
    stitches shared polylines; rows report count and exact total
    length per pair (pairs with an empty line component emit no row,
    mirroring the areal queries' >0 filters)."""
    from ..kernels import snap as SN
    from . import spatial_join as SJ

    if grid is None:
        grid = SN.default_grid(
            [], [(_g.xs, _g.ys) for pf in polys
                 for _g in [W.parse_wkb(pf.wkb())]]
        )
    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(
        spark, feats, polys, predicate="candidates_closed",
        dilate=float(grid), **kw
    )
    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    gridv = float(grid)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType()),
           T.StructField("n_lines", T.IntegerType()),
           T.StructField("total_len", T.DoubleType())]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from ..kernels import snap as SN2

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                lines = SN2.overlay_lines_snapped(ra, rb, gridv)
                if not lines:
                    continue
                tl = float(sum(
                    float(np.hypot(np.diff(xs), np.diff(ys)).sum())
                    for xs, ys in lines))
                rows.append(
                    {**{c: row[c] for c in cols},
                     "eas_id": int(row["eas_id"]),
                     "n_lines": len(lines),
                     "total_len": tl}
                )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def overlay_points_features_snapped(spark, feats: DataFrame, polys,
                                    grid: float = None,
                                    keep_cols=("fid", "a_id"),
                                    geom_col="geometry",
                                    zoom=None) -> DataFrame:
    """Per-pair dimension-0 overlay component — the POINT rows of
    KEEP_LOWER_DIMENSION_GEOMETRIES (corner touches, T-contact
    apexes); kernels/snap.overlay_points_snapped. Pairs with an empty
    point component emit no row."""
    from ..kernels import snap as SN
    from . import spatial_join as SJ

    if grid is None:
        grid = SN.default_grid(
            [], [(_g.xs, _g.ys) for pf in polys
                 for _g in [W.parse_wkb(pf.wkb())]]
        )
    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(
        spark, feats, polys, predicate="candidates_closed",
        dilate=float(grid), **kw
    )
    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    gridv = float(grid)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType()),
           T.StructField("px", T.DoubleType()),
           T.StructField("py", T.DoubleType())]
    )

    def kernel(batches):
        import pandas as pd

        from ..kernels import snap as SN2

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                for (px, py) in SN2.overlay_points_snapped(ra, rb, gridv):
                    rows.append(
                        {**{c: row[c] for c in cols},
                         "eas_id": int(row["eas_id"]),
                         "px": float(px), "py": float(py)}
                    )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def predicates_snapped(spark, feats: DataFrame, polys, grid: float = None,
                       keep_cols=("fid", "a_id"), geom_col="geometry",
                       zoom=None) -> DataFrame:
    """Boundary-aware OGC predicates on SNAPPED inputs — the predicate
    half of the snap-rounding tier (ogrlayer.cpp SetSpatialFilter +
    OGRGeometry::Touches :6082 / Overlaps :6409 / Equals :1239, GEOS
    replaced by the exact-lattice kernel): vertex-on-edge and
    shared-edge contacts that the general-position polypoly predicates
    refuse are first made exact by the snap, then every predicate
    derives from two exact quantities — the areal overlay areas and the
    lattice boundary-contact test (kernels/snap.
    boundaries_touch_snapped):

      intersects = touch OR i > 0          touches = touch AND i == 0
      equals     = i == |A| == |B|         covers  = |B − A| == 0
      overlaps   = 0 < i < min(|A|, |B|)

    Same candidate plan as overlay_features_snapped (closed envelopes +
    grid dilation, no refine UDF)."""
    from ..kernels import snap as SN
    from . import spatial_join as SJ

    if grid is None:
        grid = SN.default_grid(
            [], [(_g.xs, _g.ys) for pf in polys
                 for _g in [W.parse_wkb(pf.wkb())]]
        )
    kw = {} if zoom is None else {"zoom": zoom}
    matched = SJ.spatial_join_polygons(
        spark, feats, polys, predicate="candidates_closed",
        dilate=float(grid), **kw
    )

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = SJ.payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    gridv = float(grid)
    cols = list(keep_cols)

    out_schema = T.StructType(
        [feats.schema[c] for c in cols]
        + [T.StructField("eas_id", T.LongType()),
           T.StructField("intersects", T.BooleanType()),
           T.StructField("touches", T.BooleanType()),
           T.StructField("equals", T.BooleanType()),
           T.StructField("covers", T.BooleanType()),
           T.StructField("overlaps", T.BooleanType())]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rings_by_fid = _prepared_rings(bc.value, key)
            rows = []
            for _, row in pdf.iterrows():
                ra = OVK.geometry_rings(W.parse_wkb(bytes(row[geom_col])))
                rb = rings_by_fid[int(row["b_fid"])]
                from ..kernels import snap as SN2

                a_area = SN2.rings_area(SN2.snap_rings(ra, gridv))
                b_area = SN2.rings_area(SN2.snap_rings(rb, gridv))
                # one arrangement pass yields every needed area
                ar = SN2.overlay_areas_snapped(ra, rb, gridv)
                i_area, bma = ar["i"], ar["db"]
                touch = SN2.boundaries_touch_snapped(ra, rb, gridv)
                rows.append(
                    {**{c: row[c] for c in cols},
                     "eas_id": int(row["eas_id"]),
                     "intersects": bool(touch or i_area > 0),
                     "touches": bool(touch and i_area == 0),
                     "equals": bool(i_area == a_area == b_area),
                     "covers": bool(bma == 0.0),
                     "overlaps": bool(0 < i_area < min(a_area, b_area))}
                )
            if rows:
                yield pd.DataFrame(rows)

    return matched.mapInPandas(kernel, out_schema)


def dissolve(spark, feats: DataFrame, group_col: str = "gid",
             geom_col: str = "geometry", fanin: int = 8,
             snap_grid: float = None) -> DataFrame:
    """Dissolve / UnaryUnion per attribute value
    (``apps/gdalalg_vector_dissolve.cpp:120``; per-group set op =
    ``ogrgeometry.cpp:5437`` UnionCascaded, GEOS replaced by the
    edge-classification union fold of kernels/overlay_kernel.py).

    Distributed shape — the partial-aggregation (map-side combine)
    pattern, NOT one giant per-group fold: stage 1 unions each
    (group, salt) slice independently (salt = xxhash64(geometry) mod
    fanin, deterministic), stage 2 folds the ≤fanin partials per group.
    A group 1000× larger only widens stage 1; stage 2 stays O(fanin)
    per group. Disjoint-envelope pairs short-circuit inside the kernel,
    so mostly-disjoint groups cost envelope tests, not overlays.

    Returns (group_col, n_parts, u_area, union_wkb): number of connected
    parts (CCW shells of the union), even-odd union area, union WKB.

    ``snap_grid`` (round 4): union through the SNAP-ROUNDING n-way
    kernel instead of the general-position fold — members sharing
    borders (the standard admin-layer dissolve: every internal boundary
    is a shared edge) are outside the general-position contract; the
    snapped path handles them exactly (one arrangement pass per
    partial, kernels/snap.overlay_rings_snapped_n).
    """
    import pandas as pd

    from ..kernels import overlay_kernel as OVK
    from ..kernels import snap as SN

    def _union(soups):
        if snap_grid is not None:
            if not soups:
                return []
            return SN.overlay_rings_snapped_n(
                soups[0], [[r] for sp in soups[1:] for r in sp],
                "union", snap_grid)
        return OVK.union_all_rings(soups)

    gfield = feats.schema[group_col]

    partial_schema = T.StructType(
        [gfield, T.StructField("partial_wkb", T.BinaryType())]
    )

    def partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
        soups = [
            OVK.geometry_rings(W.parse_wkb(bytes(b)))
            for b in sorted(pdf[geom_col], key=bytes)
        ]
        u = _union(soups)
        return pd.DataFrame(
            [{group_col: pdf[group_col].iloc[0],
              "partial_wkb": OVK.rings_to_wkb(u)}]
        )

    out_schema = T.StructType(
        [
            gfield,
            T.StructField("n_parts", T.IntegerType()),
            T.StructField("u_area", T.DoubleType()),
            T.StructField("union_wkb", T.BinaryType()),
        ]
    )

    def final(pdf: "pd.DataFrame") -> "pd.DataFrame":
        soups = [
            OVK.geometry_rings(W.parse_wkb(bytes(b)))
            for b in sorted(pdf["partial_wkb"], key=bytes)
        ]
        u = _union(soups)
        n_parts = sum(1 for xs, ys in u if CL.ring_area(xs, ys) > 0)
        return pd.DataFrame(
            [{group_col: pdf[group_col].iloc[0],
              "n_parts": int(n_parts),
              "u_area": float(OVK.rings_area(u)),
              "union_wkb": OVK.rings_to_wkb(u)}]
        )

    staged = (
        feats.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(geom_col)), F.lit(int(fanin)))
        )
        .groupBy(group_col, "_salt")
        .applyInPandas(partial, partial_schema)
    )
    return staged.groupBy(group_col).applyInPandas(final, out_schema)
