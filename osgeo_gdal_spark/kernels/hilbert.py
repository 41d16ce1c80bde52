"""Hilbert-curve codes — the spatial-locality sort key.

Vectorized numpy port of ``GDALHilbertCode``
(``/root/reference/alg/hilbert.cpp:19-90``, itself from the public-domain
rawrunprotected/hilbert_curves bit tricks): 16-bit x/y -> 32-bit Hilbert
index. Used by ``gdal vector sort --strategy hilbert``
(``apps/gdalalg_vector_sort.cpp:40,302-375``) to lay features out with
spatial locality — our analog is ``repartitionByRange(hilbert_code)``
(SURVEY §2.H), the layout that makes Iceberg/parquet min-max metrics prune
spatial queries.
"""

from __future__ import annotations

import numpy as np

HILBERT_MAX = (1 << 16) - 2  # reference reserves the max for null geoms


def hilbert_code_xy(x, y):
    """Exact port: uint32 Hilbert index of 16-bit (x, y). Vectorized."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = np.uint32(0xFFFF)

    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)

    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = C ^ (C >> 1)
    b = D ^ (D >> 1)

    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    def spread(v):
        v = (v | (v << 8)) & np.uint32(0x00FF00FF)
        v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint32(0x33333333)
        v = (v | (v << 1)) & np.uint32(0x55555555)
        return v

    return (spread(i1) << 1) | spread(i0)


def hilbert_code(lon, lat, xmin=-180.0, ymin=-90.0, xmax=180.0, ymax=90.0):
    """lon/lat -> Hilbert index over a domain envelope, matching the
    reference's round-to-grid quantization (hilbert.cpp:80-93)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.rint(HILBERT_MAX * (lon - xmin) / (xmax - xmin)).astype(np.uint32)
    y = np.rint(HILBERT_MAX * (lat - ymin) / (ymax - ymin)).astype(np.uint32)
    return hilbert_code_xy(x, y)


def hilbert_code_cols(x, y):
    """NATIVE Spark Column transliteration of ``hilbert_code_xy`` —
    the same GDALHilbertCode bit cascade as pure JVM-side integer
    expressions (whole-stage codegen; zero Python in the sort path).
    ``x``/``y`` must be BIGINT columns holding 16-bit grid coords; all
    intermediates stay < 2^32 so no unsigned emulation is needed."""
    from pyspark.sql import functions as F

    M = F.lit(0xFFFF)

    def sr(v, n):
        return F.shiftright(v, n)

    a = x.bitwiseXOR(y)
    b = M.bitwiseXOR(a)
    c = M.bitwiseXOR(x.bitwiseOR(y))
    d = x.bitwiseAND(y.bitwiseXOR(M))

    A = a.bitwiseOR(sr(b, 1))
    B = sr(a, 1).bitwiseXOR(a)
    C = sr(c, 1).bitwiseXOR(b.bitwiseAND(sr(d, 1))).bitwiseXOR(c)
    D = a.bitwiseAND(sr(c, 1)).bitwiseXOR(sr(d, 1)).bitwiseXOR(d)

    a, b, c, d = A, B, C, D
    A = a.bitwiseAND(sr(a, 2)).bitwiseXOR(b.bitwiseAND(sr(b, 2)))
    B = a.bitwiseAND(sr(b, 2)).bitwiseXOR(
        b.bitwiseAND(sr(a.bitwiseXOR(b), 2)))
    C = C.bitwiseXOR(
        a.bitwiseAND(sr(c, 2)).bitwiseXOR(b.bitwiseAND(sr(d, 2))))
    D = D.bitwiseXOR(
        b.bitwiseAND(sr(c, 2)).bitwiseXOR(
            a.bitwiseXOR(b).bitwiseAND(sr(d, 2))))

    a, b, c, d = A, B, C, D
    A = a.bitwiseAND(sr(a, 4)).bitwiseXOR(b.bitwiseAND(sr(b, 4)))
    B = a.bitwiseAND(sr(b, 4)).bitwiseXOR(
        b.bitwiseAND(sr(a.bitwiseXOR(b), 4)))
    C = C.bitwiseXOR(
        a.bitwiseAND(sr(c, 4)).bitwiseXOR(b.bitwiseAND(sr(d, 4))))
    D = D.bitwiseXOR(
        b.bitwiseAND(sr(c, 4)).bitwiseXOR(
            a.bitwiseXOR(b).bitwiseAND(sr(d, 4))))

    a, b, c, d = A, B, C, D
    C = C.bitwiseXOR(
        a.bitwiseAND(sr(c, 8)).bitwiseXOR(b.bitwiseAND(sr(d, 8))))
    D = D.bitwiseXOR(
        b.bitwiseAND(sr(c, 8)).bitwiseXOR(
            a.bitwiseXOR(b).bitwiseAND(sr(d, 8))))

    a = C.bitwiseXOR(sr(C, 1))
    b = D.bitwiseXOR(sr(D, 1))

    i0 = x.bitwiseXOR(y)
    i1 = b.bitwiseOR(M.bitwiseXOR(i0.bitwiseOR(a)))

    def spread(v):
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
        return v

    return F.shiftleft(spread(i1), 1).bitwiseOR(spread(i0))
