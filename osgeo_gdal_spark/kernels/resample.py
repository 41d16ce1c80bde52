"""Resampling kernels — numpy ports of the GDAL warp/overview resamplers.

Weight functions ported from ``/root/reference/alg/gdalresamplingkernels.h``
(CubicKernel = Catmull-Rom a=-0.5; CubicSplineKernel = cubic B-spline) and
``/root/reference/alg/gdalwarpkernel.cpp:102-136`` (bilinear triangle,
Lanczos windowed sinc, radius 3). Aggregating AVERAGE reduction follows
``/root/reference/gcore/overview.cpp`` semantics: arithmetic mean of valid
(non-nodata) contributing pixels; integer outputs round half away from
zero via the GDALCopyWords rule (+0.5 floor for non-negative data).

Coordinate mapping: dst pixel center -> src coords
``sx = (dx + 0.5) * scale - 0.5`` (the standard GDAL warp inverse mapping
for pure rescales). Kernel taps clamp at the image edge and weights are
renormalized by their sum — matching GWK edge behavior.
"""

from __future__ import annotations

import numpy as np

KERNEL_RADIUS = {"near": 0, "bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}


def cubic_kernel(x):
    """Catmull-Rom (a=-0.5) — gdalresamplingkernels.h CubicKernel."""
    ax = np.abs(x)
    x2 = x * x
    r = np.where(
        ax <= 1.0,
        x2 * (1.5 * ax - 2.5) + 1.0,
        np.where(ax <= 2.0, x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0, 0.0),
    )
    return r


def cubic_spline_kernel(x):
    """Cubic B-spline — gdalresamplingkernels.h CubicSplineKernel."""
    v = np.abs(x)
    xm1 = v - 1.0
    xp1 = v + 1.0
    xp2 = v + 2.0
    a = np.where(xp2 <= 0.0, 0.0, xp2**3)
    b = np.where(xp1 <= 0.0, 0.0, xp1**3)
    c = np.where(v <= 0.0, 0.0, v**3)
    d = np.where(xm1 <= 0.0, 0.0, xm1**3)
    return np.where(v > 2.0, 0.0, (a - 4.0 * b + 6.0 * c - 4.0 * d) / 6.0)


def bilinear_kernel(x):
    """Triangle — GWKBilinear."""
    ax = np.abs(x)
    return np.where(ax <= 1.0, 1.0 - ax, 0.0)


def lanczos_kernel(x, radius=3.0):
    """Lanczos windowed sinc — GWKLanczosSinc (radius 3)."""
    ax = np.abs(np.asarray(x, dtype=np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.sinc(ax) * np.sinc(ax / radius)
    return np.where(ax >= radius, 0.0, s)


_KERNELS = {
    "bilinear": (bilinear_kernel, 1),
    "cubic": (cubic_kernel, 2),
    "cubicspline": (cubic_spline_kernel, 2),
    "lanczos": (lanczos_kernel, 3),
}


def _axis_weights(out_size: int, src_size: int, method: str):
    """Per-dst-pixel (tap_indices, tap_weights) along one axis."""
    scale = src_size / float(out_size)
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    if method == "near":
        # GDAL nearest: floor(center + 0.5) clamped
        idx = np.clip(np.floor(centers + 0.5).astype(np.int64), 0, src_size - 1)
        return idx[:, None], np.ones((out_size, 1))
    fn, radius = _KERNELS[method]
    base = np.floor(centers).astype(np.int64)
    offsets = np.arange(-radius + 1, radius + 1)  # 2*radius taps
    taps = base[:, None] + offsets[None, :]
    w = fn(taps - centers[:, None])
    taps = np.clip(taps, 0, src_size - 1)
    wsum = w.sum(axis=1, keepdims=True)
    wsum[wsum == 0] = 1.0
    return taps, w / wsum


def resample_grid(src: np.ndarray, out_h: int, out_w: int, method: str) -> np.ndarray:
    """Separable resample of a 2-D array to (out_h, out_w). Returns float64;
    callers cast/round per output dtype (GDALCopyWords +0.5 floor rule)."""
    src = np.asarray(src, dtype=np.float64)
    ty, wy = _axis_weights(out_h, src.shape[0], method)
    tx, wx = _axis_weights(out_w, src.shape[1], method)
    # rows: (out_h, taps_y, src_w) -> weighted sum over taps
    tmp = np.einsum("ots,ot->os", src[ty, :], wy)
    # cols: (out_h, out_w, taps_x) -> weighted sum over taps
    out = np.einsum("rot,ot->ro", tmp[:, tx], wx)
    return out


def round_to_dtype(arr: np.ndarray, dtype) -> np.ndarray:
    """GDALCopyWords float->int conversion (gcore/gdal_priv_templates.hpp
    sGDALCopyWord<double, Tout>): add 0.5, floor, clamp; NaN -> 0."""
    if np.issubdtype(np.dtype(dtype), np.floating):
        return arr.astype(dtype)
    info = np.iinfo(dtype)
    out = np.clip(np.floor(arr + 0.5), info.min, info.max)
    out = np.where(np.isnan(arr), 0, out)
    return out.astype(dtype)


def average_2x2(src: np.ndarray) -> np.ndarray:
    """One overview AVERAGE pyramid step: mean of each 2x2 block
    (overview.cpp AVERAGE semantics, no-nodata case). Even dims required.
    Returns float64 — exact for integer inputs (sum of 4 ints / 4).
    """
    src = np.asarray(src, dtype=np.float64)
    h, w = src.shape
    if h % 2 or w % 2:
        raise ValueError("average_2x2 requires even dimensions")
    return src.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def average_2x2_nodata(src: np.ndarray, nodata: float) -> np.ndarray:
    """AVERAGE pyramid step with nodata: mean over valid pixels of each 2x2
    block; block entirely nodata -> nodata (overview.cpp masked AVERAGE)."""
    src = np.asarray(src, dtype=np.float64)
    h, w = src.shape
    blocks = src.reshape(h // 2, 2, w // 2, 2)
    valid = blocks != nodata
    cnt = valid.sum(axis=(1, 3))
    s = np.where(valid, blocks, 0.0).sum(axis=(1, 3))
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(cnt > 0, s / np.maximum(cnt, 1), nodata)
    return out


def reduce_2x2(src: np.ndarray, mode: str) -> np.ndarray:
    """One overview pyramid step for the aggregating modes of
    ``overview.cpp`` dispatch (:4758-4800): NEAREST / MODE / RMS / MIN /
    MAX / SUM over each 2x2 block (AVERAGE lives in average_2x2).

    - nearest: top-left child — ``int(0.5 + 2x) == 2x``
      (GDALResampleChunk_Near source offset precompute, overview.cpp:125).
    - mode: the first value to reach the final max count in TL,TR,BL,BR
      scan order (GDALResampleChunk_ModeT strictly-greater update,
      overview.cpp:2526-2537); all-distinct blocks give the top-left.
      (The dedicated GByte histogram path breaks ties toward the smallest
      VALUE instead; this kernel implements the generic-T semantics.)
    - rms: sqrt(mean of squares), fixed left-to-right accumulation so a
      SQL oracle is bit-equal (IEEE sqrt is correctly rounded).
    - min / max / sum: exact.
    """
    src = np.asarray(src, dtype=np.float64)
    h, w = src.shape
    if h % 2 or w % 2:
        raise ValueError("reduce_2x2 requires even dimensions")
    c0 = src[0::2, 0::2]
    c1 = src[0::2, 1::2]
    c2 = src[1::2, 0::2]
    c3 = src[1::2, 1::2]
    if mode == "nearest":
        return c0.copy()
    if mode == "min":
        return np.minimum(np.minimum(c0, c1), np.minimum(c2, c3))
    if mode == "max":
        return np.maximum(np.maximum(c0, c1), np.maximum(c2, c3))
    if mode == "sum":
        return ((c0 + c1) + c2) + c3
    if mode == "rms":
        return np.sqrt((((c0 * c0 + c1 * c1) + c2 * c2) + c3 * c3) / 4.0)
    if mode == "mode":
        # decision tree == first-to-reach-max-count in scan order
        return np.select(
            [
                (c0 == c1) | (c0 == c2),
                c1 == c2,
                c0 == c3,
                c1 == c3,
                c2 == c3,
            ],
            [c0, c1, c0, c1, c2],
            default=c0,
        )
    raise ValueError(mode)


GAUSS_3X3 = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])


def gauss_2x(pad: np.ndarray) -> np.ndarray:
    """GAUSS overview 2x reduction (``GDALResampleChunk_Gauss``,
    ``/root/reference/gcore/overview.cpp:1996``): for dst pixel (X, Y)
    the 3x3 binomial window {1,2,1; 2,4,2; 1,2,1} anchors at src
    (2X, 2Y) — one pixel past the 2x2 block on the right and bottom
    (the reference's nSrcOff = off + size/2 - dim/2 arithmetic at
    ratio 2). ``pad`` is the (T+1, T+1) tile-plus-east/south-halo
    array; NaN pad cells mean "beyond the raster" and their weights are
    dropped, exactly the reference's chunk clamp, with the result
    normalized by the weights actually used."""
    t = pad.shape[0] - 1
    h = t // 2
    acc = np.zeros((h, h))
    cnt = np.zeros((h, h))
    for dy in range(3):
        for dx in range(3):
            v = pad[dy:dy + t:2, :][:h][:, dx:dx + t:2][:, :h]
            m = ~np.isnan(v)
            w = GAUSS_3X3[dy, dx]
            acc += np.where(m, v, 0.0) * w
            cnt += m * w
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(cnt > 0, acc / cnt, 0.0)


# 2x convolution-overview tap weights as small integers (dyadic scale;
# conv_2x normalizes by their sum, so only the ratios matter — every
# product v*w is an exact small integer, so sums are order-independent).
# Taps t are src offsets j = 2X + t; weight = k((t - 0.5) / 2) where k
# is the kernel at radius*2 support (GDALResampleChunk_Convolution,
# /root/reference/gcore/overview.cpp:2593 with dfXRatio = 2).
CONV_2X = {
    # bilinear radius 1 -> taps t in [-1, 2]: [1,3,3,1]/8
    "bilinear": (-1, np.array([64.0, 192.0, 192.0, 64.0])),
    # cubic (Catmull-Rom a=-0.5) radius 2 -> taps t in [-3, 4]
    "cubic": (-3, np.array([-3.0, -9.0, 29.0, 111.0,
                            111.0, 29.0, -9.0, -3.0])),
}


def conv_2x(pad: np.ndarray, method: str) -> np.ndarray:
    """BILINEAR/CUBIC overview 2x reduction over a (T+8, T+8) halo pad
    (tile body at [4:4+T, 4:4+T]; NaN = beyond the raster). Separable
    product weights with edge renormalization by the weights actually
    in range — since clipped taps form full rows/columns, the joint
    renorm equals GDAL's per-axis renorm exactly."""
    o, wts = CONV_2X[method]
    t = pad.shape[0] - 8
    h = t // 2
    acc = np.zeros((h, h))
    cnt = np.zeros((h, h))
    for iy, wy in enumerate(wts):
        for ix, wx in enumerate(wts):
            # src j = 2Y + (o + iy); pad row index = 4 + j
            r0, c0 = 4 + o + iy, 4 + o + ix
            v = pad[r0:r0 + t:2, :][:h][:, c0:c0 + t:2][:, :h]
            m = ~np.isnan(v)
            w = wy * wx
            acc += np.where(m, v, 0.0) * w
            cnt += m * w
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(cnt != 0, acc / cnt, 0.0)
