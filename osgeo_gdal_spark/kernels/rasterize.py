"""Vector->raster burn kernels: exact ports of GDAL's low-level rasterizer.

Sources (``/root/reference/alg/llrasterize.cpp``):
- ``GDALdllImageFilledPolygon`` (:58) — scanline even-odd polygon fill,
  pixel-center rule, crossings rounded with ``floor(x + 0.5)``, spans
  ``[c0, c1 - 1]`` inclusive, bottom horizontal segments at exact
  pixel-center height filled separately;
- ``GDALdllImageLine`` (:256) — integer Bresenham on ``floor()`` pixel
  coords, endpoint skipped on all but the last segment;
- ``GDALdllImageLineAllTouched`` (:407) — every pixel touched by the
  segment; vertical/horizontal fast paths (.01 slope threshold), pixel
  stepping in the general case; ``intersect_only`` drops segments aligned
  to pixel edges within 1e-4 (the polygon-boundary mode used when
  ALL_TOUCHED burns a polygon, ``alg/gdalrasterize.cpp:750-768``).

All three emit into a boolean mask, which equals GDAL's
once-per-pixel-per-geometry semantics in both REPLACE (idempotent burns)
and ADD (the poSetVisitedPoints / polyInts2 dedup machinery,
``alg/gdalrasterize.cpp:84-141``) merge modes.

Coordinates are chunk-local continuous pixel coords (the caller shifts by
the chunk offset, mirroring ``gv_rasterize_one_shape``'s nXOff/nYOff
shift, ``alg/gdalrasterize.cpp:684-689``).
"""

from __future__ import annotations

import numpy as np

_EPS_INTERSECT = 1e-4  # llrasterize.cpp EPSILON_INTERSECT_ONLY


def _rings(part_sizes, xs, ys):
    off = 0
    for n in part_sizes:
        yield np.asarray(xs[off:off + n], dtype=np.float64), \
            np.asarray(ys[off:off + n], dtype=np.float64)
        off += n


def polygon_mask(part_sizes, xs, ys, w: int, h: int) -> np.ndarray:
    """Even-odd scanline fill (GDALdllImageFilledPolygon port,
    llrasterize.cpp:58). All rings participate in one even-odd pass, so
    holes un-fill. Vectorized: crossings are computed per-edge over the
    edge's scanline range; spans land in a parity difference array."""
    mask = np.zeros((h, w), dtype=bool)
    exs = np.asarray(xs, dtype=np.float64)
    eys = np.asarray(ys, dtype=np.float64)
    if len(exs) == 0:
        return mask
    dminy, dmaxy = float(eys.min()), float(eys.max())
    miny = int(max(0.0, dminy))
    maxy = int(min(dmaxy, h - 1))
    if maxy < miny:
        return mask

    ys_all, xi_all = [], []
    horiz = []  # (y, x0, x1_exclusive) special bottom-horizontal spans
    off = 0
    for n in part_sizes:
        rx, ry = exs[off:off + n], eys[off:off + n]
        off += n
        # edges (i-1, i) with the ring closed by (last, first) at i == 0
        x1 = np.roll(rx, 1)
        y1 = np.roll(ry, 1)
        x2, y2 = rx, ry
        for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
            if ey1 == ey2:
                # bottom horizontal segments at EXACT pixel-center height
                # fill separately (llrasterize.cpp:150-185); top ones skip
                if ex1 > ex2 and (ey1 - 0.5) == np.floor(ey1 - 0.5):
                    y = int(ey1 - 0.5)
                    if miny <= y <= maxy:
                        hx1 = np.floor(ex2 + 0.5)
                        hx2 = np.floor(ex1 + 0.5)
                        if hx1 <= w - 1 and hx2 > 0:
                            horiz.append(
                                (y, int(max(hx1, 0.0)), int(min(hx2, w)))
                            )
                continue
            dy1, dy2 = (ey1, ey2) if ey1 < ey2 else (ey2, ey1)
            dx1, dx2 = (ex1, ex2) if ey1 < ey2 else (ex2, ex1)
            # scanlines with dy1 <= y + 0.5 < dy2
            y0 = int(np.ceil(dy1 - 0.5))
            y1e = int(np.ceil(dy2 - 0.5)) - 1
            y0 = max(y0, miny)
            y1e = min(y1e, maxy)
            if y1e < y0:
                continue
            yy = np.arange(y0, y1e + 1, dtype=np.int64)
            dy = yy + 0.5
            intersect = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
            ys_all.append(yy)
            xi_all.append(np.floor(intersect + 0.5).astype(np.int64))

    if ys_all:
        yy = np.concatenate(ys_all)
        xi = np.concatenate(xi_all)
        order = np.lexsort((xi, yy))
        yy, xi = yy[order], xi[order]
        # even-odd pairing within each scanline: crossings alternate
        # span-start / span-end(exclusive)
        _, starts = np.unique(yy, return_index=True)
        counts = np.diff(np.append(starts, len(yy)))
        idx = np.arange(len(yy))
        within = idx - np.repeat(starts, counts)
        # drop the unpaired trailing crossing of any odd-count scanline
        # (degenerate ring) BEFORE pairing, so later scanlines stay aligned
        paired = within < np.repeat((counts // 2) * 2, counts)
        s = paired & (within % 2 == 0)
        e = paired & (within % 2 == 1)
        sy, sx0, sx1 = yy[s], xi[s], xi[e]
        keep = (sx0 <= w - 1) & (sx1 > 0)
        delta = np.zeros((h, w + 1), dtype=np.int32)
        np.add.at(delta, (sy[keep], np.clip(sx0[keep], 0, w)), 1)
        np.add.at(delta, (sy[keep], np.clip(sx1[keep], 0, w)), -1)
        mask |= np.cumsum(delta[:, :-1], axis=1) > 0
    for y, hx0, hx1 in horiz:
        mask[y, hx0:hx1] = True
    return mask


def line_pixels(part_sizes, xs, ys, w: int, h: int) -> np.ndarray:
    """Bresenham walk (GDALdllImageLine port, llrasterize.cpp:256) into a
    boolean mask."""
    mask = np.zeros((h, w), dtype=bool)
    for rx, ry in _rings(part_sizes, xs, ys):
        nseg = len(rx) - 1
        for j in range(1, len(rx)):
            dfx, dfy = rx[j - 1], ry[j - 1]
            dfxe, dfye = rx[j], ry[j]
            if ((dfy < 0 and dfye < 0) or (dfy > h and dfye > h)
                    or (dfx < 0 and dfxe < 0) or (dfx > w and dfxe > w)):
                continue
            ix, iy = int(np.floor(dfx)), int(np.floor(dfy))
            ix1, iy1 = int(np.floor(dfxe)), int(np.floor(dfye))
            ndx, ndy = abs(ix1 - ix), abs(iy1 - iy)
            xstep = -1 if ix > ix1 else 1
            ystep = -1 if iy > iy1 else 1
            if ndx >= ndy:
                xerr = ndy << 1
                yerr = xerr - (ndx << 1)
                err = xerr - ndx
                # skip endpoint except on the last segment (llrasterize
                # burns intermediate vertices once)
                if j != nseg:
                    ndx -= 1
                while ndx >= 0:
                    ndx -= 1
                    if 0 <= ix < w and 0 <= iy < h:
                        mask[iy, ix] = True
                    ix += xstep
                    if err > 0:
                        iy += ystep
                        err += yerr
                    else:
                        err += xerr
            else:
                xerr = ndx << 1
                yerr = xerr - (ndy << 1)
                err = xerr - ndy
                if j != nseg:
                    ndy -= 1
                while ndy >= 0:
                    ndy -= 1
                    if 0 <= ix < w and 0 <= iy < h:
                        mask[iy, ix] = True
                    iy += ystep
                    if err > 0:
                        ix += xstep
                        err += yerr
                    else:
                        err += xerr
    return mask


def line_pixels_all_touched(part_sizes, xs, ys, w: int, h: int,
                            intersect_only=False) -> np.ndarray:
    """Every pixel the segments touch (GDALdllImageLineAllTouched port,
    llrasterize.cpp:407). ``intersect_only`` skips axis-aligned segments
    sitting exactly on pixel edges (the polygon-boundary mode)."""
    mask = np.zeros((h, w), dtype=bool)
    for rx, ry in _rings(part_sizes, xs, ys):
        for j in range(1, len(rx)):
            dfx, dfy = float(rx[j - 1]), float(ry[j - 1])
            dfxe, dfye = float(rx[j]), float(ry[j])
            if ((dfy < 0 and dfye < 0) or (dfy > h and dfye > h)
                    or (dfx < 0 and dfxe < 0) or (dfx > w and dfxe > w)):
                continue
            if dfx > dfxe:
                dfx, dfxe = dfxe, dfx
                dfy, dfye = dfye, dfy
            # vertical fast path
            if abs(dfx - dfxe) < 0.01:
                if intersect_only and (
                        abs(dfx - round(dfx)) < _EPS_INTERSECT
                        and abs(dfxe - round(dfxe)) < _EPS_INTERSECT):
                    continue
                if dfye < dfy:
                    dfy, dfye = dfye, dfy
                ix = int(np.floor(dfxe))
                iy = int(np.floor(dfy))
                iye = int(np.floor(dfye - _EPS_INTERSECT))
                if ix < 0 or ix >= w:
                    continue
                iy = max(iy, 0)
                iye = min(iye, h - 1)
                if iy <= iye:
                    mask[iy:iye + 1, ix] = True
                continue
            # horizontal fast path
            if abs(dfy - dfye) < 0.01:
                if intersect_only and (
                        abs(dfy - round(dfy)) < _EPS_INTERSECT
                        and abs(dfye - round(dfye)) < _EPS_INTERSECT):
                    continue
                ix = int(np.floor(dfx))
                iy = int(np.floor(dfy))
                ixe = int(np.floor(dfxe - _EPS_INTERSECT))
                if iy < 0 or iy >= h:
                    continue
                ix = max(ix, 0)
                ixe = min(ixe, w - 1)
                if ix <= ixe:
                    mask[iy, ix:ixe + 1] = True
                continue
            # general sloped case: step pixel to pixel
            slope = (dfye - dfy) / (dfxe - dfx)
            if dfxe > w:
                dfye -= (dfxe - w) * slope
                dfxe = float(w)
            if dfx < 0:
                dfy += (0.0 - dfx) * slope
                dfx = 0.0
            if dfye > dfy:
                if dfy < 0:
                    dfx += (0.0 - dfy) / slope
                    dfy = 0.0
                if dfye >= h:
                    dfxe += (dfye - h) / slope
                    dfxe = min(dfxe, float(w))
            else:
                if dfy >= h:
                    dfx += (h - dfy) / slope
                    dfy = float(h)
                if dfye < 0:
                    dfxe -= (dfye - 0.0) / slope
            while 0.0 <= dfx < dfxe:
                ix = int(np.floor(dfx))
                iy = int(np.floor(dfy))
                if 0 <= iy < h:
                    mask[iy, ix] = True
                stepx = np.floor(dfx + 1.0) - dfx
                stepy = stepx * slope
                if int(np.floor(dfy + stepy)) == iy:
                    dfx += stepx
                    dfy += stepy
                elif slope < 0:
                    stepy = min(iy - dfy, -1e-9)
                    dfx += stepy / slope
                    dfy += stepy
                else:
                    stepy = max((iy + 1) - dfy, 1e-9)
                    dfx += stepy / slope
                    dfy += stepy
    return mask


def shape_mask(kind: str, part_sizes, xs, ys, w: int, h: int,
               all_touched=False) -> np.ndarray:
    """One geometry -> burned-pixel mask, mirroring the shape dispatch of
    ``gv_rasterize_one_shape`` (alg/gdalrasterize.cpp:697-778)."""
    if kind == "polygon":
        m = polygon_mask(part_sizes, xs, ys, w, h)
        if all_touched:
            m |= line_pixels_all_touched(part_sizes, xs, ys, w, h,
                                         intersect_only=True)
        return m
    if kind == "line":
        if all_touched:
            return line_pixels_all_touched(part_sizes, xs, ys, w, h,
                                           intersect_only=False)
        return line_pixels(part_sizes, xs, ys, w, h)
    if kind == "point":
        m = np.zeros((h, w), dtype=bool)
        for rx, ry in _rings(part_sizes, xs, ys):
            for px, py in zip(rx, ry):
                if 0 <= px < w and 0 <= py < h:
                    m[int(py), int(px)] = True
        return m
    raise ValueError(kind)
