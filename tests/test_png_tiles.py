"""PNG tile codec + pyramid sink (gdal raster tile output stage;
reference frmts/png/ + apps/gdalalg_raster_tile.cpp:509 GetFileY)."""

import hashlib
import os
import zlib

import numpy as np
import pytest

from osgeo_gdal_spark.kernels import png as PNG
from osgeo_gdal_spark.sources.raster import synth_pixel_grid

# byte-level determinism contract: pinned zlib level/strategy/wbits/
# memLevel (kernels/png.py) make the encoder's output reproducible —
# any drift in these parameters or the scanline stream breaks the gold
GOLD_GRAY_MD5 = "2424b9665afe1bf75f8ddb8585c31a0a"
GOLD_RGB_MD5 = "069aa413a218761c9e96feaaa066a762"


def test_png_gray_golden_and_roundtrip():
    arr = synth_pixel_grid(0, 0, 1)
    data = PNG.encode_png(arr)
    assert hashlib.md5(data).hexdigest() == GOLD_GRAY_MD5
    assert (PNG.decode_png(data) == arr).all()


def test_png_rgb_rgba_roundtrip():
    rgb = np.dstack([synth_pixel_grid(0, 0, 1, coeffs=c)
                     for c in ((7, 11), (13, 5), (3, 17))])
    data = PNG.encode_png(rgb)
    assert hashlib.md5(data).hexdigest() == GOLD_RGB_MD5
    assert (PNG.decode_png(data) == rgb).all()
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 200, np.uint8)])
    assert (PNG.decode_png(PNG.encode_png(rgba)) == rgba).all()


def test_png_decode_all_filter_types():
    """The decoder must handle externally produced PNGs using Sub/Up/
    Average/Paeth filters, not just our filter-0 output: hand-build a
    stream with one scanline per filter type and check reconstruction
    against a scalar transliteration of the PNG spec."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int16)
    lines = []
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, np.int16)

        def left(x):
            return cur[x - c] if x >= c else 0

        def up_left(x):
            return prior[x - c] if x >= c else 0

        enc = np.zeros(stride, np.int16)
        for x in range(stride):
            if ft == 0:
                enc[x] = cur[x]
            elif ft == 1:
                enc[x] = cur[x] - left(x)
            elif ft == 2:
                enc[x] = cur[x] - prior[x]
            elif ft == 3:
                enc[x] = cur[x] - (left(x) + prior[x]) // 2
            else:
                a, b, cc = left(x), prior[x], up_left(x)
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc)
                enc[x] = cur[x] - pred
        lines.append(bytes([ft]) + (enc % 256).astype(np.uint8).tobytes())
    raw = b"".join(lines)
    import struct
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", zlib.compress(raw))
            + PNG._chunk(b"IEND", b""))
    assert (PNG.decode_png(data) == img).all()


def test_png_decode_rejects_corruption():
    data = bytearray(PNG.encode_png(synth_pixel_grid(0, 0, 1)))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(Exception):
        PNG.decode_png(bytes(data))
    with pytest.raises(ValueError):
        PNG.decode_png(b"nonsense")


def test_encode_png_tiles_and_pyramid_layout(spark, tmp_path):
    """Distributed encode (gray map-only + RGB band co-group) and the
    {z}/{x}/{y}.png pyramid sink in both row conventions."""
    from osgeo_gdal_spark.operators import tiling as TLL
    from osgeo_gdal_spark.sources.raster import synth_tiles

    tiles = synth_tiles(spark, 1)
    png_df = TLL.encode_png_tiles(tiles)
    rows = {(r["gx"], r["gy"]): bytes(r["png"]) for r in png_df.collect()}
    assert len(rows) == 4
    for (gx, gy), data in rows.items():
        assert (PNG.decode_png(data) == synth_pixel_grid(gx, gy, 1)).all()
    assert hashlib.md5(rows[(0, 0)]).hexdigest() == GOLD_GRAY_MD5

    out = str(tmp_path / "pyr")
    TLL.write_png_pyramid(png_df, out)
    for (gx, gy) in rows:
        p = os.path.join(out, "1", str(gx), f"{gy}.png")
        assert os.path.exists(p), p
        with open(p, "rb") as f:
            assert f.read() == rows[(gx, gy)]
    out2 = str(tmp_path / "pyr_tms")
    TLL.write_png_pyramid(png_df, out2, convention="tms")
    assert os.path.exists(os.path.join(out2, "1", "0", "1.png"))
    with open(os.path.join(out2, "1", "0", "1.png"), "rb") as f:
        assert f.read() == rows[(0, 0)]  # tms flips the row index

    # RGB: three band rows per tile co-grouped into one PNG
    b1 = synth_tiles(spark, 1, coeffs=(7, 11))
    import pyspark.sql.functions as SF
    b2 = synth_tiles(spark, 1, coeffs=(13, 5)).withColumn(
        "band", SF.lit(2))
    b3 = synth_tiles(spark, 1, coeffs=(3, 17)).withColumn(
        "band", SF.lit(3))
    rgb_df = TLL.encode_png_tiles(b1.unionByName(b2).unionByName(b3),
                                  rgb=True)
    got = {(r["gx"], r["gy"]): bytes(r["png"]) for r in rgb_df.collect()}
    exp = np.dstack([synth_pixel_grid(1, 0, 1, coeffs=c)
                     for c in ((7, 11), (13, 5), (3, 17))])
    assert (PNG.decode_png(got[(1, 0)]) == exp).all()


def test_pipeline_write_png(spark, tmp_path):
    """Pipeline DSL: `... ! write --of png` emits the z/x/y pyramid."""
    from osgeo_gdal_spark.plans.pipeline import Pipeline
    from osgeo_gdal_spark.sources.raster import synth_tiles

    out = str(tmp_path / "pipe_pyr")
    Pipeline(spark, synth_tiles(spark, 1)).write(out, fmt="png")
    got = sorted(os.path.relpath(os.path.join(d, f), out)
                 for d, _, fs in os.walk(out) for f in fs)
    assert got == ["1/0/0.png", "1/0/1.png", "1/1/0.png", "1/1/1.png"]
    with open(os.path.join(out, "1", "0", "0.png"), "rb") as f:
        assert hashlib.md5(f.read()).hexdigest() == GOLD_GRAY_MD5


def test_paletted_png_roundtrip_with_rgb_to_palette(spark):
    """Full color-table tile chain: RGB synth bands -> median-cut
    rgb_to_palette_tiles -> type-3 paletted PNG (PLTE chunk) -> decode
    -> palette expansion reproduces the exact index assignment."""
    import pyspark.sql.functions as SF

    from osgeo_gdal_spark.operators import raster_ops as RO
    from osgeo_gdal_spark.operators import tiling as TLL
    from osgeo_gdal_spark.sources.raster import synth_tiles

    b1 = synth_tiles(spark, 0, coeffs=(7, 11))
    b2 = synth_tiles(spark, 0, coeffs=(13, 5)).withColumn("band", SF.lit(2))
    b3 = synth_tiles(spark, 0, coeffs=(3, 17)).withColumn("band", SF.lit(3))
    rgb = b1.unionByName(b2).unionByName(b3)
    palette, indexed = RO.rgb_to_palette_tiles(rgb, max_colors=16)
    assert 1 <= len(palette) <= 16
    idx_rows = {(r["gx"], r["gy"]):
                np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
                .reshape(r["height"], r["width"])
                for r in indexed.collect()}
    png_df = TLL.encode_png_tiles(indexed, palette=palette)
    for r in png_df.collect():
        data = bytes(r["png"])
        assert b"PLTE" in data
        got_idx, got_pal = PNG.decode_png_palette(data)
        assert got_pal == [tuple(int(v) for v in p) for p in palette]
        assert (got_idx == idx_rows[(r["gx"], r["gy"])]).all()


def test_png_palette_validation():
    with pytest.raises(ValueError):
        PNG.encode_png_palette(np.zeros((2, 2), np.uint8), [])
    with pytest.raises(ValueError):
        PNG.encode_png_palette(np.full((2, 2), 5, np.uint8),
                               [(0, 0, 0), (1, 1, 1)])


def test_png_roundtrip_property_sweep():
    """Derandomized property sweep: random sizes/channels/content (incl.
    1-pixel and non-square extremes) encode -> decode to identity."""
    rng = np.random.RandomState(20260817)
    for _ in range(60):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        ch = int(rng.choice([0, 3, 4]))
        shape = (h, w) if ch == 0 else (h, w, ch)
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        assert (PNG.decode_png(PNG.encode_png(arr)) == arr).all(), shape
    # paletted: random indices over a random palette
    for _ in range(20):
        n = int(rng.randint(1, 257))
        pal = [tuple(int(v) for v in rng.randint(0, 256, 3))
               for _ in range(n)]
        idx = rng.randint(0, n, (int(rng.randint(1, 30)),
                                 int(rng.randint(1, 30)))).astype(np.uint8)
        data = PNG.encode_png_palette(idx, pal)
        got_idx, got_pal = PNG.decode_png_palette(data)
        assert (got_idx == idx).all() and got_pal == pal


def test_full_tile_pyramid_png_story(spark, tmp_path):
    """The complete `gdal raster tile` user story: base z2 raster ->
    AVERAGE overviews down to z0 -> PNG bytes for EVERY level ->
    {z}/{x}/{y}.png tree with 16 + 4 + 1 files, each decodable and the
    z0 root equal to the reduced chain applied in numpy."""
    from osgeo_gdal_spark.kernels.resample import average_2x2
    from osgeo_gdal_spark.operators import raster_ops as RO
    from osgeo_gdal_spark.operators import tiling as TLL
    from osgeo_gdal_spark.sources.raster import synth_pixel_grid, synth_tiles

    base = synth_tiles(spark, 2)
    z1 = RO.pyramid_reduce(base, "average")
    z0 = RO.pyramid_reduce(z1, "average")
    # encode_png_tiles needs uint8; the average chain stays in [0, 255)
    from osgeo_gdal_spark.operators.raster_ops import set_type_tiles
    all_levels = (base.unionByName(set_type_tiles(z1, "uint8"))
                  .unionByName(set_type_tiles(z0, "uint8")))
    out = str(tmp_path / "full_pyr")
    TLL.write_png_pyramid(TLL.encode_png_tiles(all_levels), out)
    files = [os.path.relpath(os.path.join(d, f), out)
             for d, _, fs in os.walk(out) for f in fs]
    assert len(files) == 16 + 4 + 1
    assert "0/0/0.png" in files and "2/3/3.png" in files

    # the z0 root must equal the numpy reduction chain + GDALCopyWord
    with open(os.path.join(out, "0", "0", "0.png"), "rb") as f:
        got = PNG.decode_png(f.read())
    full = np.zeros((1024, 1024))
    for gy in range(4):
        for gx in range(4):
            full[gy*256:(gy+1)*256, gx*256:(gx+1)*256] = \
                synth_pixel_grid(gx, gy, 2)
    r1 = average_2x2(full)
    r0 = average_2x2(r1)
    exp = np.clip(np.floor(r0 + 0.5), 0, 255).astype(np.uint8)
    assert (got == exp).all()
