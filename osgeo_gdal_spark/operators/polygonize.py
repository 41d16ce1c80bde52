"""Distributed polygonize: category raster -> connected regions.

The re-expression of GDAL's polygonize (``/root/reference/alg/
polygonize.cpp`` two-scan run-merging enumerator +
``alg/gdalrasterpolygonenumerator.cpp``) for a tiled table — SURVEY §7
hard part (a), the genuinely distributed piece:

1. **per-tile CC labeling** (vectorized row-run RLE + union-find over
   runs, 4-connectivity, same-value connectivity like GDAL's enumerator
   — the same run-merging idea as the reference's two-scan enumerator,
   done in numpy): each component gets a *globally unique provisional
   id* = min global flat pixel index ``gpy * world + gpx`` it contains —
   deterministic, collision-free, and independently computable by the
   SQL oracle for block-structured rasters;
2. **border-run extraction**: for each tile edge, (position, value,
   component id) runs — the only cross-tile information needed;
3. **edge table**: self-join of borders between adjacent tiles where
   values match -> (id_a, id_b) merge edges;
4. **iterative min-label propagation** (DataFrame union-find): each round
   every id adopts the smallest id in its neighborhood; rounds ~
   log2(region diameter in tiles), each a small join over the edge table —
   NOT over pixels;
5. final aggregation: per-region pixel_count / value / bbox.

Regions, borders AND the different-value adjacency table are all emitted
from ONE labeling pass per tile (a union-schema mapInPandas) — the tile
pixels are decoded and labeled exactly once however many of the three
consumers run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..sources.raster import TILE, parse_tile


def _label_tile(grid: np.ndarray) -> np.ndarray:
    """4-connected same-value labeling, fully vectorized: row-run RLE ->
    union-find over runs (Python touches only the merge PAIRS, never
    pixels). Returns dense int64 label ids 0..k-1 per pixel, numbered in
    first-appearance (row-major) order."""
    h, w = grid.shape
    starts = np.ones((h, w), dtype=bool)
    if w > 1:
        starts[:, 1:] = grid[:, 1:] != grid[:, :-1]
    run_id = np.cumsum(starts.ravel()).reshape(h, w) - 1
    nruns = int(run_id[-1, -1]) + 1
    parent = np.arange(nruns, dtype=np.int64)

    if h > 1:
        vm = grid[1:, :] == grid[:-1, :]
        ra = run_id[:-1, :][vm]
        rb = run_id[1:, :][vm]
        # unique merge pairs only (a run pair repeats across its overlap)
        pairs = np.unique(ra * np.int64(nruns) + rb)
        pa = (pairs // nruns).tolist()
        pb = (pairs % nruns).tolist()

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(pa, pb):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)

    # full resolve by vectorized pointer jumping, then dense relabel in
    # first-appearance order (roots are min run ids, already row-major)
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    _, dense = np.unique(parent, return_inverse=True)
    return dense[parent[run_id]]


# one union schema so regions + borders + adjacency come from a single
# labeling pass (kind: 'r' region, 'b' border run, 'a' adjacency edge)
_PIECE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("rid", T.LongType()),        # r/b: provisional region id; a: rid_a
        T.StructField("value", T.DoubleType()),    # r/b
        T.StructField("n_pixels", T.LongType()),   # r
        T.StructField("xmin", T.LongType()),
        T.StructField("ymin", T.LongType()),
        T.StructField("xmax", T.LongType()),
        T.StructField("ymax", T.LongType()),
        T.StructField("edge_key", T.StringType()),  # b
        T.StructField("side", T.IntegerType()),     # b
        T.StructField("pos", T.LongType()),         # b
        T.StructField("rid_b", T.LongType()),       # a
        T.StructField("npx", T.LongType()),         # a
    ]
)


def _tile_all(row, zoom):
    """Label one tile ONCE; return (regions, borders, adjacency) as
    column-dicts of numpy arrays (no per-pixel Python)."""
    world = (1 << zoom) * TILE
    grid = parse_tile(row).astype(np.float64)
    lab = _label_tile(grid)
    gx, gy = int(row["gx"]), int(row["gy"])
    ox, oy = gx * TILE, gy * TILE
    h, w = grid.shape
    xs = ox + np.broadcast_to(np.arange(w, dtype=np.int64)[None, :], (h, w))
    ys = oy + np.broadcast_to(np.arange(h, dtype=np.int64)[:, None], (h, w))
    flat = (ys * world + xs).ravel()
    linv = lab.ravel()
    k = int(linv.max()) + 1

    # provisional id per dense label = min global flat index (vectorized)
    big = np.iinfo(np.int64).max
    rid_of = np.full(k, big, dtype=np.int64)
    np.minimum.at(rid_of, linv, flat)
    rid = rid_of[lab]

    # per-region stats — labels are dense so every slot is populated
    counts = np.bincount(linv, minlength=k).astype(np.int64)
    first = np.full(k, big, dtype=np.int64)
    np.minimum.at(first, linv, np.arange(linv.size, dtype=np.int64))
    values = grid.ravel()[first]
    xmin = np.full(k, big, dtype=np.int64)
    ymin = np.full(k, big, dtype=np.int64)
    xmax = np.full(k, -1, dtype=np.int64)
    ymax = np.full(k, -1, dtype=np.int64)
    np.minimum.at(xmin, linv, xs.ravel())
    np.minimum.at(ymin, linv, ys.ravel())
    np.maximum.at(xmax, linv, xs.ravel())
    np.maximum.at(ymax, linv, ys.ravel())
    regions = {
        "rid": rid_of, "value": values, "n_pixels": counts,
        "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
    }

    # border runs (arrays, not per-pixel Python)
    n = 1 << zoom
    b_key, b_side, b_pos, b_val, b_rid = [], [], [], [], []
    if gx + 1 < n:
        b_key.append(np.full(h, f"v:{ox + w}:{gy}", dtype=object))
        b_side.append(np.zeros(h, dtype=np.int32))
        b_pos.append(oy + np.arange(h, dtype=np.int64))
        b_val.append(grid[:, -1])
        b_rid.append(rid[:, -1])
    if gx > 0:
        b_key.append(np.full(h, f"v:{ox}:{gy}", dtype=object))
        b_side.append(np.ones(h, dtype=np.int32))
        b_pos.append(oy + np.arange(h, dtype=np.int64))
        b_val.append(grid[:, 0])
        b_rid.append(rid[:, 0])
    if gy + 1 < n:
        b_key.append(np.full(w, f"h:{oy + h}:{gx}", dtype=object))
        b_side.append(np.zeros(w, dtype=np.int32))
        b_pos.append(ox + np.arange(w, dtype=np.int64))
        b_val.append(grid[-1, :])
        b_rid.append(rid[-1, :])
    if gy > 0:
        b_key.append(np.full(w, f"h:{oy}:{gx}", dtype=object))
        b_side.append(np.ones(w, dtype=np.int32))
        b_pos.append(ox + np.arange(w, dtype=np.int64))
        b_val.append(grid[0, :])
        b_rid.append(rid[0, :])
    borders = {
        "edge_key": np.concatenate(b_key) if b_key else np.array([], dtype=object),
        "side": np.concatenate(b_side) if b_side else np.array([], dtype=np.int32),
        "pos": np.concatenate(b_pos) if b_pos else np.array([], dtype=np.int64),
        "value": np.concatenate(b_val) if b_val else np.array([], dtype=np.float64),
        "rid": np.concatenate(b_rid) if b_rid else np.array([], dtype=np.int64),
    }

    # in-tile different-value adjacency (for sieve), vectorized
    pair_rows = []
    for a, b in ((rid[:, :-1], rid[:, 1:]), (rid[:-1, :], rid[1:, :])):
        diff = a != b
        if diff.any():
            lo = np.minimum(a[diff], b[diff])
            hi = np.maximum(a[diff], b[diff])
            pair_rows.append(np.stack([lo, hi], axis=1))
    if pair_rows:
        allp = np.concatenate(pair_rows)
        u, c = np.unique(allp, axis=0, return_counts=True)
        adjacency = {"rid_a": u[:, 0], "rid_b": u[:, 1], "npx": c.astype(np.int64)}
    else:
        z = np.array([], dtype=np.int64)
        adjacency = {"rid_a": z, "rid_b": z, "npx": z}
    return regions, borders, adjacency


def _pieces_df(tiles: DataFrame, zoom: int) -> DataFrame:
    """ONE mapInPandas pass emitting the union piece table (cached by the
    callers); each tile is decoded + labeled exactly once."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                regions, borders, adjacency = _tile_all(row, zoom)
                nr = len(regions["rid"])
                frames.append(pd.DataFrame({
                    "kind": np.full(nr, "r", dtype=object),
                    "rid": regions["rid"], "value": regions["value"],
                    "n_pixels": regions["n_pixels"],
                    "xmin": regions["xmin"], "ymin": regions["ymin"],
                    "xmax": regions["xmax"], "ymax": regions["ymax"],
                }))
                nb = len(borders["rid"])
                if nb:
                    frames.append(pd.DataFrame({
                        "kind": np.full(nb, "b", dtype=object),
                        "rid": borders["rid"], "value": borders["value"],
                        "edge_key": borders["edge_key"],
                        "side": borders["side"], "pos": borders["pos"],
                    }))
                na = len(adjacency["rid_a"])
                if na:
                    frames.append(pd.DataFrame({
                        "kind": np.full(na, "a", dtype=object),
                        "rid": adjacency["rid_a"], "rid_b": adjacency["rid_b"],
                        "npx": adjacency["npx"],
                    }))
            if frames:
                out = pd.concat(frames)
                for c in ["rid", "n_pixels", "xmin", "ymin", "xmax", "ymax",
                          "pos", "rid_b", "npx"]:
                    if c not in out:
                        out[c] = np.nan
                    out[c] = out[c].astype("Int64")
                for c in ["value"]:
                    if c not in out:
                        out[c] = np.nan
                for c in ["edge_key"]:
                    if c not in out:
                        out[c] = None
                if "side" not in out:
                    out["side"] = np.nan
                out["side"] = out["side"].astype("Int32")
                yield out[[f.name for f in _PIECE_SCHEMA.fields]]

    return tiles.mapInPandas(gen, _PIECE_SCHEMA)


def _polygonize_parts(tiles: DataFrame, zoom: int, max_rounds=32):
    """Shared machinery: returns (regions, final_labels, borders, adjacency)
    where labels maps every provisional rid to its merged component label.
    All four views come from one cached single-pass piece table."""
    pieces = _pieces_df(tiles, zoom).cache()
    regions = pieces.filter(F.col("kind") == "r").select(
        "rid", "value", "n_pixels", "xmin", "ymin", "xmax", "ymax"
    )
    borders = pieces.filter(F.col("kind") == "b").select(
        "edge_key", "side", "pos", "value", "rid"
    )
    adjacency = pieces.filter(F.col("kind") == "a").select(
        F.col("rid").alias("rid_a"), "rid_b", "npx"
    )

    a = borders.filter(F.col("side") == 0).select(
        "edge_key", "pos", F.col("value").alias("va"), F.col("rid").alias("ra")
    )
    b = borders.filter(F.col("side") == 1).select(
        "edge_key", "pos", F.col("value").alias("vb"), F.col("rid").alias("rb")
    )
    edges = (
        a.join(b, ["edge_key", "pos"])
        .filter(F.col("va") == F.col("vb"))
        .select(F.col("ra").alias("src"), F.col("rb").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )

    # symmetric closure once; then iterative min-label propagation
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()

    labels = regions.select(F.col("rid"), F.col("rid").alias("label")).cache()
    for _ in range(max_rounds):
        neigh = (
            sym.join(labels, sym.dst == labels.rid)
            .groupBy("src").agg(F.min("label").alias("nmin"))
        )
        # localCheckpoint: materialize AND truncate lineage — the iterative
        # plan otherwise grows multiplicatively (and sieve stacks a second
        # loop on top of this one, overflowing the plan string at 2 GB)
        new_labels = (
            labels.join(neigh, labels.rid == neigh.src, "left")
            .select(
                "rid",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "rid")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        # propagate labels transitively: label <- label-of-label until stable
        labels = new_labels
        if changed == 0:
            break
        # pointer jumping: rid -> label -> label(label): halves rounds
        l2 = labels.alias("x").join(
            labels.select(F.col("rid").alias("label"),
                          F.col("label").alias("label2")).alias("y"),
            "label",
        ).select(F.col("rid"), F.col("label2").alias("label")).localCheckpoint()
        labels = l2

    return regions, labels, borders, adjacency


def polygonize(tiles: DataFrame, zoom: int, max_rounds=32):
    """Region table for a tiled category raster.

    Returns DataFrame (region_id, value, n_pixels, xmin, ymin, xmax, ymax)
    where region_id = min global flat pixel index in the region.
    """
    regions, labels, _borders, _adj = _polygonize_parts(tiles, zoom, max_rounds)
    merged = (
        regions.join(labels, "rid")
        .groupBy(F.col("label").alias("region_id"))
        .agg(
            F.first("value").alias("value"),
            F.sum("n_pixels").alias("n_pixels"),
            F.min("xmin").alias("xmin"),
            F.min("ymin").alias("ymin"),
            F.max("xmax").alias("xmax"),
            F.max("ymax").alias("ymax"),
        )
    )
    return merged


def sieve(tiles: DataFrame, zoom: int, threshold: int, max_rounds=32):
    """Remove small connected regions by merging each region below
    `threshold` pixels into its largest neighbor — GDAL sieve semantics
    (``/root/reference/alg/gdalsievefilter.cpp``: small polygons merged
    into their largest neighbour). Absorb pointers are resolved through
    CHAINS and CYCLES: the small->largest-neighbor edges are closed into
    connected components (each component holds at most one non-small
    region since every small region emits exactly one edge); the
    component's surviving region is its non-small member when present,
    else its largest member (ties -> smallest id). This replaces the old
    single-hop pass where two mutually-absorbing small regions survived
    with swapped stats, and where chains needed another call.

    Returns the merged region table (region_id, value, n_pixels, bbox) —
    value/id of the absorber; absorbed regions disappear into it.
    """
    regions, labels, borders, in_tile = _polygonize_parts(tiles, zoom, max_rounds)

    # cross-tile diff-value border pairs complete the adjacency graph
    a = borders.filter(F.col("side") == 0).select(
        "edge_key", "pos", F.col("value").alias("va"), F.col("rid").alias("rid_a")
    )
    b = borders.filter(F.col("side") == 1).select(
        "edge_key", "pos", F.col("value").alias("vb"), F.col("rid").alias("rid_b")
    )
    cross = (
        a.join(b, ["edge_key", "pos"])
        .filter(F.col("va") != F.col("vb"))
        .groupBy("rid_a", "rid_b")
        .agg(F.count("*").alias("npx"))
    )
    adj = in_tile.unionByName(cross.select("rid_a", "rid_b", "npx"))

    lab_a = labels.select(F.col("rid").alias("rid_a"), F.col("label").alias("la"))
    lab_b = labels.select(F.col("rid").alias("rid_b"), F.col("label").alias("lb"))
    edges = (
        adj.join(lab_a, "rid_a").join(lab_b, "rid_b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("ra"), F.col("lb").alias("rb"))
        .distinct()
    )
    sym = edges.unionByName(
        edges.select(F.col("rb").alias("ra"), F.col("ra").alias("rb"))
    ).distinct()

    merged = (
        regions.join(labels, "rid")
        .groupBy(F.col("label").alias("region_id"))
        .agg(
            F.first("value").alias("value"),
            F.sum("n_pixels").alias("n_pixels"),
            F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
            F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
        )
    ).localCheckpoint()
    sizes = merged.select("region_id", F.col("n_pixels").alias("nb_size"))
    # each small region -> its largest neighbor (tie: smallest id)
    small = merged.filter(F.col("n_pixels") < threshold).select(
        F.col("region_id").alias("ra")
    )
    cand = (
        small.join(sym, "ra")
        .join(sizes.withColumnRenamed("region_id", "rb"), "rb")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ra").orderBy(F.desc("nb_size"), F.asc("rb"))
    absorb = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(F.col("ra"), F.col("rb"))
    ).localCheckpoint()

    # connected components of the absorb graph (symmetric closure +
    # min-label propagation; components are tiny — trees of smalls rooted
    # at one big, or all-small cycles — so few rounds suffice)
    ab_sym = absorb.unionByName(
        absorb.select(F.col("rb").alias("ra"), F.col("ra").alias("rb"))
    ).distinct().localCheckpoint()
    members = ab_sym.select(F.col("ra").alias("region_id")).distinct()
    comp = members.select(
        "region_id", F.col("region_id").alias("comp")
    ).localCheckpoint()
    for _ in range(max_rounds):
        neigh = (
            ab_sym.join(comp, ab_sym.rb == comp.region_id)
            .groupBy("ra").agg(F.min("comp").alias("nmin"))
        )
        new_comp = (
            comp.join(neigh, comp.region_id == neigh.ra, "left")
            .select(
                "region_id",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
            )
        ).localCheckpoint()
        changed = (
            new_comp.alias("n").join(comp.alias("o"), "region_id")
            .filter(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        )
        comp = new_comp
        if changed == 0:
            break
        comp = comp.alias("x").join(
            comp.select(F.col("region_id").alias("comp"),
                        F.col("comp").alias("comp2")).alias("y"),
            "comp",
        ).select("region_id", F.col("comp2").alias("comp")).localCheckpoint()

    # component root: non-small first, then largest, then smallest id
    with_comp = merged.join(comp, "region_id", "left").withColumn(
        "comp", F.coalesce("comp", "region_id")
    )
    wroot = Window.partitionBy("comp").orderBy(
        F.asc((F.col("n_pixels") < threshold).cast("int")),
        F.desc("n_pixels"), F.asc("region_id"),
    )
    rooted = with_comp.withColumn("_rk", F.row_number().over(wroot))
    roots = rooted.filter(F.col("_rk") == 1).select(
        "comp",
        F.col("region_id").alias("final_id"),
        F.col("value").alias("final_value"),
    )
    return (
        with_comp.join(roots, "comp")
        .groupBy(F.col("final_id").alias("region_id"))
        .agg(
            F.first("final_value").alias("value"),
            F.sum("n_pixels").alias("n_pixels"),
            F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
            F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
        )
    )
