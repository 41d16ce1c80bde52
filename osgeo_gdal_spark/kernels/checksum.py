"""Port of GDALChecksumImage — the 16-bit prime-modulo golden comparator.

Reference: ``/root/reference/alg/gdalchecksum.cpp:48-56`` (primes table)
and the integer accumulation loop (``nChecksum += val % anPrimes[i % 11]``
over row-major flat pixel index, masked to 16 bits). Floating point input
is converted to int32 with the GDALCopyWords rule (add 0.5, floor, clamp to
+-2147483647; non-finite -> INT_MIN) before the modulo.

The canonical fixture value: GDAL's 20x20 ``byte.tif`` checksums to 4672
(``/root/reference/autotest/utilities/test_gdal_translate.py:52``).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _int_from_double(vals: np.ndarray) -> np.ndarray:
    """GDALCopyWords float->Int32 conversion (gdalchecksum.cpp:67-88)."""
    v = np.asarray(vals, dtype=np.float64) + 0.5
    out = np.empty(v.shape, dtype=np.int64)
    finite = np.isfinite(v)
    out[~finite] = np.iinfo(np.int32).min
    clipped = np.clip(v[finite], -2147483647.0, 2147483647.0)
    out[finite] = np.floor(clipped).astype(np.int64)
    return out


def checksum_image(pixels: np.ndarray) -> int:
    """16-bit checksum of a 2-D pixel window, row-major prime cycle.

    Integer dtypes are used as-is (C ``%`` on non-negative values == numpy);
    float dtypes go through the GDALCopyWords conversion first.
    """
    arr = np.asarray(pixels)
    if arr.ndim != 2:
        raise ValueError("checksum_image expects a 2-D array")
    flat = arr.ravel()
    if np.issubdtype(arr.dtype, np.floating):
        vals = _int_from_double(flat)
    else:
        vals = flat.astype(np.int64)
    n = vals.size
    primes_cycled = PRIMES[np.arange(n) % 11]
    # C `%` truncates toward zero (negative dividends give negative
    # remainders); numpy `%` floors. Match C via fmod-style formula.
    rem = vals - (vals / primes_cycled).astype(np.int64) * primes_cycled
    return int(rem.sum() & 0xFFFF)
