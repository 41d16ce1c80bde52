"""Cell-prefix broadcast spatial join with exact PIP refinement.

The engine's core operator — the Spark-native re-expression of OGR's
filter-and-refine spatial predicate (``ogrlayer.cpp:4004-4076``: envelope
reject -> envelope accept -> exact refine) and of the layer-algebra
nested-loop joins (``ogrlayer.cpp:5385+``), restructured for 10^12 rows:

1. driver-side: each polygon -> covering cell set at a fixed join zoom
   (per *part* envelope, so antimeridian-split multipolygons don't cover
   the world), with its envelope attached -> a small (cells x polys) table;
2. ``broadcast()`` that table and equi-join pages on the flat cell key —
   a map-side broadcast hash join: the pages side NEVER shuffles, which is
   what survives a 100 TB scan (hot cells skew the *match count*, not a
   shuffle partition);
3. native strict-envelope prefilter (Catalyst, codegen) discards most
   false cell candidates before Python is involved;
4. exact ray-cast PIP refine in an Arrow-batched pandas UDF over packed
   coordinate arrays (kernels/pip.py) — the only Python stage, applied to
   the small candidate remainder.

The prepared polygon set (parsed WKB -> packed arrays) is built once per
executor from the broadcast payload and reused across batches — the
analog of GDAL's prepared-geometry reuse (``ogrlayer.cpp:3925``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import sqlgen as G
from ..kernels import cells as C, wkb as W

DEFAULT_JOIN_ZOOM = 7

# per-worker cache of parsed polygon sets, keyed by a CONTENT digest of the
# payload computed driver-side. id(payload) is unsafe here: CPython reuses
# addresses after GC, so a later job's broadcast landing at the same address
# would silently join against the previous job's polygons.
_PREPARED_CACHE: dict = {}


def payload_key(payload) -> str:
    """Stable content key for a [(fid, wkb_bytes), ...] payload."""
    import hashlib

    h = hashlib.md5()
    for fid, buf in payload:
        h.update(str(fid).encode())
        h.update(bytes(buf))
    return h.hexdigest()


def _prepared(payload, key):
    got = _PREPARED_CACHE.get(key)
    if got is None:
        got = {fid: W.parse_wkb(bytes(buf)) for fid, buf in payload}
        _PREPARED_CACHE.clear()  # one payload per job; don't leak old ones
        _PREPARED_CACHE[key] = got
    return got


def is_axis_rect(g: W.PackedGeometry) -> bool:
    """True when the polygon IS its envelope (single 5-point axis-aligned
    ring) — then the native strict-envelope filter is the exact predicate
    and no Python refine is needed. The distributed analog of OGR's
    rectangle-filter fast path (InstallFilter detects the rectangle case,
    ogrlayer.cpp:3887-3925; FilterGeometry's envelope-accept,
    ogrlayer.cpp:4004-4076)."""
    if len(g.part_rings) != 1 or int(g.part_rings[0]) != 1:
        return False
    if len(g.xs) != 5:
        return False
    xs, ys = set(g.xs.tolist()), set(g.ys.tolist())
    return len(xs) == 2 and len(ys) == 2


def polygon_cover_df(spark, polys, zoom=DEFAULT_JOIN_ZOOM):
    """Small driver-side table: one row per (cell_key, polygon) with the
    polygon attributes + envelope for the native prefilter + a
    ``refine_needed`` flag (False for axis-rect polygons -> fully native).

    polys: list of PolyFeature (sources/polygons.py) or any object with
    .fid/.eas_id/.wkb()/.envelope().
    """
    n = 1 << zoom
    rows = []
    for pf in polys:
        g = W.parse_wkb(pf.wkb())
        refine = not is_axis_rect(g)
        ring_i = 0
        part_cells = []
        for nrings in g.part_rings:
            s, e = g.ring_offsets[ring_i], g.ring_offsets[ring_i + 1]
            xs, ys = g.xs[s:e], g.ys[s:e]
            cover = C.cover_bbox(
                float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()), zoom
            )
            part_cells.append(cover)
            ring_i += int(nrings)
        import numpy as np

        allcells = np.unique(np.concatenate(part_cells))
        gx, gy, _ = C.decode(allcells)
        keys = (gx * n + gy).tolist()
        xmin, ymin, xmax, ymax = g.envelope()
        for k in keys:
            rows.append((int(k), pf.fid, pf.eas_id, xmin, ymin, xmax, ymax, refine))
    schema = T.StructType(
        [
            T.StructField("cell_key", T.LongType()),
            T.StructField("poly_fid", T.LongType()),
            T.StructField("eas_id", T.LongType()),
            T.StructField("p_xmin", T.DoubleType()),
            T.StructField("p_ymin", T.DoubleType()),
            T.StructField("p_xmax", T.DoubleType()),
            T.StructField("p_ymax", T.DoubleType()),
            T.StructField("refine_needed", T.BooleanType()),
        ]
    )
    from ..session import local_df

    return local_df(spark, rows, schema)


def with_cell_key(df: DataFrame, zoom=DEFAULT_JOIN_ZOOM,
                  lon="lon", lat="lat") -> DataFrame:
    """Attach the flat cell join key — native Spark SQL, codegen'd."""
    return df.withColumn("cell_key", F.expr(G.cell_key_sql(lon, lat, zoom)))


def _contains_udf(spark, polys):
    """Arrow-batched exact-PIP refine: (poly_fid, lon, lat) -> bool."""
    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)

    @F.pandas_udf(T.BooleanType())
    def contains(poly_fid, lon, lat):
        import numpy as np
        import pandas as pd

        from osgeo_gdal_spark.kernels import pip as P

        geoms = _prepared(bc.value, key)
        out = np.zeros(len(poly_fid), dtype=bool)
        px = lon.to_numpy(dtype="float64")
        py = lat.to_numpy(dtype="float64")
        fids = poly_fid.to_numpy()
        for fid in pd.unique(fids):
            m = fids == fid
            if fid == -1:
                # rect fast-accept sentinel: envelope filter already decided
                out[m] = True
            else:
                out[m] = P.points_in_polygon(px[m], py[m], geoms[int(fid)])
        return pd.Series(out)

    return contains


def spatial_join(spark, pages: DataFrame, polys, zoom=DEFAULT_JOIN_ZOOM,
                 how: str = "inner", strategy: str = "branch") -> DataFrame:
    """pages x polygons containment join.

    how: 'inner' (pairs), 'semi' (clip — pages inside any polygon),
    'anti' (erase — pages inside none). Mirrors OGR layer algebra
    Clip/Erase (ogrlayer.cpp:7537/:7846) for point inputs.

    strategy — the rect-fast-path plan shape (both measured at 200M
    pages on this sandbox; results identical, only the plan differs):
    - 'branch' (default): rect candidates never enter Python; the union
      re-scans the column-pruned source once per branch. Best scaling
      efficiency at low core counts (0.99 on the N=2->4N=8 proxy) because
      the Python stage never competes with the JVM for scarce cores.
    - 'single_pass': ONE source scan; rect candidates flow through the
      refine UDF masked to a vectorized no-op. The shape to pick when the
      source scan is the bottleneck (wide rows / remote object store —
      a 100 TB table read twice is 100 TB of extra I/O).
    """
    cover = polygon_cover_df(spark, polys, zoom)
    keyed = with_cell_key(pages, zoom)
    cand = keyed.join(F.broadcast(cover), "cell_key")
    # native strict-envelope prefilter before any Python
    cand = cand.filter(
        (F.col("lon") > F.col("p_xmin")) & (F.col("lon") < F.col("p_xmax"))
        & (F.col("lat") > F.col("p_ymin")) & (F.col("lat") < F.col("p_ymax"))
    )
    aux = ["p_xmin", "p_ymin", "p_xmax", "p_ymax", "cell_key", "refine_needed"]
    contains = _contains_udf(spark, [pf for pf in polys
                                     if not is_axis_rect(W.parse_wkb(pf.wkb()))])
    if strategy == "single_pass":
        # one scan: rect candidates are already decided by the envelope
        # filter, so their poly_fid is masked to the -1 sentinel and the
        # kernel skips them (vectorized no-op)
        masked_fid = F.when(F.col("refine_needed"), F.col("poly_fid")).otherwise(
            F.lit(-1).cast("long")
        )
        matched = cand.filter(
            contains(masked_fid, F.col("lon"), F.col("lat"))
        ).drop(*aux)
    elif strategy == "branch":
        # rect candidates never enter Python; the union re-scans the
        # column-pruned source once per branch
        native_ok = cand.filter(~F.col("refine_needed")).drop(*aux)
        need = cand.filter(F.col("refine_needed"))
        refined = need.filter(contains("poly_fid", "lon", "lat")).drop(*aux)
        matched = native_ok.unionByName(refined)
    else:
        raise ValueError(strategy)
    if how == "inner":
        return matched
    pairs = matched.select("url").distinct()
    if how == "semi":
        return pages.join(pairs, "url", "left_semi")
    if how == "anti":
        return pages.join(pairs, "url", "left_anti")
    raise ValueError(how)


def zonal_stats(spark, pages: DataFrame, polys, value_col: str,
                zoom=DEFAULT_JOIN_ZOOM) -> DataFrame:
    """Per-polygon stats of a page attribute — the vector-side analog of
    GDAL zonal statistics (alg/zonal.cpp stat set: count/min/max/mean/
    stdev/sum). One broadcast join + one partial-aggregating groupBy."""
    j = spatial_join(spark, pages, polys, zoom)
    return j.groupBy("eas_id").agg(
        F.count("*").alias("zn_count"),
        F.min(value_col).alias("zn_min"),
        F.max(value_col).alias("zn_max"),
        F.sum(value_col).alias("zn_sum"),
        F.avg(value_col).alias("zn_mean"),
    )


def spatial_join_polygons(spark, feats: DataFrame, polys,
                          zoom=DEFAULT_JOIN_ZOOM,
                          predicate: str = "intersects",
                          dilate: float = 0.0) -> DataFrame:
    """Polygon x polygon containment/intersection join — the moment a
    second VECTOR layer shows up (the reference's envelope + prepared-
    geometry pattern, ogrlayer.cpp:4004-4076, with GEOS replaced by the
    closed-form kernels in kernels/polypoly.py):

    1. the small layer's per-part cell cover broadcasts (polygon_cover_df);
    2. each feature row explodes NATIVELY to the cells its bbox touches
       (mercator tile ranges from the flat bbox struct — no Python);
    3. cell equi-join + native strict bbox-overlap prefilter;
    4. distinct (feature, polygon) candidates refine in an Arrow batch
       with the prepared-polygon cache.

    feats needs (fid, geometry WKB, bbox struct). Returns feats columns +
    eas_id of each matching polygon.
    """
    from ..kernels import polypoly as PP

    n = 1 << zoom
    cover = polygon_cover_df(spark, polys, zoom)

    # dilate > 0 (the snapped-overlay path): widen the feature's cell
    # range and the envelope comparison by the snap grid, so boundaries
    # within one grid step of each other — which snapping will make
    # coincident — still produce a candidate pair
    d = float(dilate)
    xlo = f"(bbox.xmin - {d!r})" if d else "bbox.xmin"
    xhi = f"(bbox.xmax + {d!r})" if d else "bbox.xmax"
    ylo = f"(bbox.ymin - {d!r})" if d else "bbox.ymin"
    yhi = f"(bbox.ymax + {d!r})" if d else "bbox.ymax"
    tx = G.tile_x_sql(xlo, zoom), G.tile_x_sql(xhi, zoom)
    # mercator y grows downward: ymax -> smaller ty
    ty = G.tile_y_sql(yhi, zoom), G.tile_y_sql(ylo, zoom)
    keyed = feats.select(
        "*",
        F.explode(F.expr(f"sequence({tx[0]}, {tx[1]})")).alias("_cx"),
        F.expr(f"sequence({ty[0]}, {ty[1]})").alias("_cys"),
    ).select(
        "*", F.explode("_cys").alias("_cy")
    ).withColumn("cell_key", F.col("_cx") * n + F.col("_cy")).drop("_cx", "_cys", "_cy")

    cand = keyed.join(F.broadcast(cover), "cell_key")
    # envelope-overlap prefilter, fully native. Boundary-aware predicates
    # (touches/equals/covers/disjoint-complement) must keep edge-aligned
    # envelopes -> closed comparison; the strict-interior tier uses the
    # strict one (a shared envelope edge can't make interiors intersect).
    closed_pred = predicate in ("touches", "overlaps", "equals", "covers",
                                "candidates_closed")
    lt = (lambda a, b: a <= b) if closed_pred else (lambda a, b: a < b)
    fxlo, fxhi = F.col("bbox.xmin"), F.col("bbox.xmax")
    fylo, fyhi = F.col("bbox.ymin"), F.col("bbox.ymax")
    if d:
        fxlo, fxhi = fxlo - d, fxhi + d
        fylo, fyhi = fylo - d, fyhi + d
    cand = cand.filter(
        lt(fxlo, F.col("p_xmax")) & lt(F.col("p_xmin"), fxhi)
        & lt(fylo, F.col("p_ymax")) & lt(F.col("p_ymin"), fyhi)
    ).dropDuplicates(["fid", "poly_fid"])

    payload = [(pf.fid, pf.wkb()) for pf in polys]
    key = payload_key(payload)
    bc = spark.sparkContext.broadcast(payload)
    pred = str(predicate)

    @F.pandas_udf(T.BooleanType())
    def matches(poly_fid, geom):
        import pandas as pd

        from osgeo_gdal_spark.kernels import polypoly as _PP, wkb as _W

        geoms = _prepared(bc.value, key)
        out = []
        for pf_, buf in zip(poly_fid, geom):
            ga = _W.parse_wkb(bytes(buf))
            gb = geoms[int(pf_)]
            if pred == "intersects":
                out.append(_PP.polygons_intersect(ga, gb))
            elif pred == "within":
                out.append(_PP.polygon_contains_polygon(gb, ga))
            elif pred == "contains":
                out.append(_PP.polygon_contains_polygon(ga, gb))
            elif pred == "touches":
                out.append(_PP.polygons_touch(ga, gb))
            elif pred == "overlaps":
                out.append(_PP.polygons_overlap(ga, gb))
            elif pred == "equals":
                out.append(_PP.polygons_equal(ga, gb))
            elif pred == "covers":
                out.append(_PP.polygons_covers(gb, ga))  # polygon covers feat
            else:
                raise ValueError(pred)
        return pd.Series(out)

    aux = ["p_xmin", "p_ymin", "p_xmax", "p_ymax", "cell_key",
           "refine_needed", "poly_fid"]
    if predicate == "candidates_closed":
        # closed-envelope candidates WITHOUT the exact refine: the
        # snapped overlay consumes these directly (its kernel decides
        # emptiness itself, and must see boundary-only contacts that the
        # strict-interior refine would drop)
        matched = cand
    else:
        matched = cand.filter(matches("poly_fid", "geometry"))
    return matched.drop(*[c for c in aux if c != "poly_fid"]).withColumnRenamed(
        "poly_fid", "b_fid")
