"""Hypothesis property tests for the late round-3 kernels (pure-python/
numpy — no Spark session, so they run in milliseconds)."""

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from osgeo_gdal_spark.kernels import makevalid as MV


@st.composite
def bowtie(draw):
    """Random bowtie quad: two corners swapped so diagonals cross."""
    x = draw(st.floats(-50, 50, allow_nan=False))
    y = draw(st.floats(-50, 50, allow_nan=False))
    w = draw(st.floats(0.5, 20, allow_nan=False))
    h = draw(st.floats(0.5, 20, allow_nan=False))
    return [x, x + w, x + w, x], [y, y + h, y, y + h]


@settings(max_examples=200, deadline=None)
@given(bowtie())
def test_makevalid_bowtie_area_conservation(bt):
    """Every bowtie splits into exactly two simple CCW loops whose
    total area equals the analytic w*h/2 (each lobe is a triangle
    of base h and height w/2)."""
    xs, ys = bt
    loops = MV.make_valid_rings(xs, ys)
    assert len(loops) == 2
    areas = [MV._loop_area(l) for l in loops]
    assert all(a > 0 for a in areas)
    w = xs[1] - xs[0]
    h = ys[1] - ys[0]
    assert abs(sum(areas) - w * h / 2) <= 1e-9 * max(1.0, w * h)
    assert not MV._loops_overlap(loops)


def _no_degenerate_contacts(pts):
    """Exact integer check for the documented scope: no vertex lies ON
    a non-incident edge (collinear contacts are the named out-of-scope
    case — kernels/makevalid.py header)."""
    n = len(pts)
    for vi, (px, py) in enumerate(pts):
        for i in range(n):
            j = (i + 1) % n
            if vi in (i, j):
                continue
            ax, ay = pts[i]
            bx, by = pts[j]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            if cross != 0:
                continue
            if min(ax, bx) <= px <= max(ax, bx) \
                    and min(ay, by) <= py <= max(ay, by):
                return False
    return True


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(-15, 15), st.integers(-15, 15)),
                min_size=3, max_size=9, unique=True))
def test_makevalid_never_emits_crossing_loops(pts):
    """Within the documented scope (proper crossings only, no vertex-
    on-edge contacts): every loop that comes out is simple and
    positively oriented — or the input's noded faces overlap and the
    polygon entry raises (checked via _loops_overlap)."""
    from hypothesis import assume

    assume(_no_degenerate_contacts(pts))
    xs = [float(p[0]) for p in pts]
    ys = [float(p[1]) for p in pts]
    loops = MV.make_valid_rings(xs, ys)
    for l in loops:
        assert MV._loop_area(l) > 0
        assert not MV._has_proper_crossing(l)


def _py_winnow(words, k=3, w=4):
    M, WB, GB = 2147483647, 31, 65599
    hs = []
    for word in words:
        acc = 0
        for c in word:
            acc = (acc * WB + ord(c)) % M
        hs.append(acc)
    gs = []
    for i in range(len(hs) - k + 1):
        g = hs[i]
        for j in range(1, k):
            g = (g * GB + hs[i + j]) % M
        gs.append(g)
    if len(gs) >= w:
        return {min(gs[i:i + w]) for i in range(len(gs) - w + 1)}
    return set(gs)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5),
                min_size=0, max_size=30),
       st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5),
                min_size=6, max_size=10),
       st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5),
                min_size=0, max_size=30))
def test_winnowing_shared_run_guarantee(prefix_a, shared, prefix_b):
    """The MOSS guarantee, property-tested: two word sequences sharing
    a contiguous run of >= w + k - 1 words (6 here) ALWAYS share at
    least one fingerprint."""
    doc_a = prefix_a + shared
    doc_b = prefix_b + shared
    fa = _py_winnow(doc_a)
    fb = _py_winnow(doc_b)
    assert fa & fb


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10),
                          st.integers(1, 5), st.integers(1, 5)),
                min_size=1, max_size=2),
       st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10),
                          st.integers(1, 5), st.integers(1, 5)),
                min_size=1, max_size=2))
def test_hypothesis_snapped_overlay_conservation(ra, rb):
    """Property: over EVEN-ODD rect soups (members may overlap, making
    effective holes) with rampant shared edges and corners, the snapped
    overlay satisfies the set-algebra laws |A∩B| + |A\\B| = |A| and
    |A∪B| = |A| + |B| − |A∩B|."""
    import numpy as np

    from osgeo_gdal_spark.kernels import snap as SN

    def soup(rects):
        return [
            (np.array([x, x + w, x + w, x], float),
             np.array([y, y, y + h, y + h], float))
            for (x, y, w, h) in rects
        ]

    g = 2.0 ** -12
    A, B = soup(ra), soup(rb)
    # the signed ring-area sum is NOT the even-odd measure when a
    # soup's own rings overlap (two identical rects XOR to empty);
    # the even-odd area is the self-intersection's area
    aa = SN.rings_area(SN.overlay_rings_snapped(A, A, "intersection", g))
    bb = SN.rings_area(SN.overlay_rings_snapped(B, B, "intersection", g))
    i = SN.rings_area(SN.overlay_rings_snapped(A, B, "intersection", g))
    d = SN.rings_area(SN.overlay_rings_snapped(A, B, "difference", g))
    u = SN.rings_area(SN.overlay_rings_snapped(A, B, "union", g))
    assert abs(i + d - aa) < 1e-9
    assert abs(u - (aa + bb - i)) < 1e-9


@settings(max_examples=1000, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=3, max_size=6, unique=True),
       st.sampled_from([0.25, 0.5, 1.0]))
def test_hypothesis_buffer_contains_and_monotone(pts, d):
    """Buffer properties over random lattice polygons: the dilation
    contains the input's area and grows monotonically with distance;
    dilate-then-erode is at least the original area."""
    from hypothesis import assume

    import numpy as np

    from osgeo_gdal_spark.kernels import buffer as BF, snap as SN
    from osgeo_gdal_spark.kernels.clip import ring_area

    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    a0 = ring_area(xs, ys)
    assume(abs(a0) > 0.5)
    if a0 < 0:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    # self-crossing random rings are MakeValid's domain, not Buffer's
    from osgeo_gdal_spark.kernels import makevalid as MV

    assume(not MV._has_proper_crossing(list(zip(xs, ys))))
    A = [(xs, ys)]
    area0 = SN.rings_area(A)
    big = SN.rings_area(BF.buffer_rings(A, d, quadsegs=1))
    bigger = SN.rings_area(BF.buffer_rings(A, 2 * d, quadsegs=1))
    assert big >= area0 - 1e-9
    assert bigger >= big - 1e-9
    rt = BF.buffer_rings(BF.buffer_rings(A, d, quadsegs=1), -d,
                         quadsegs=1)
    assert SN.rings_area(rt) >= area0 - 1e-9


DARTS = [
    [(3, 3), (0, 3), (6, 1), (3, 2)],
    [(3, 3), (0, 3), (6, 0), (2, 2)],
    [(6, 6), (0, 0), (6, 0), (3, 1)],
]


@pytest.mark.parametrize("di", [0, 1, 2])
@pytest.mark.parametrize("d", [0.25, 0.5])
def test_buffer_darts_match_exact_fraction_oracle(di, d):
    """The round-4 falsifying concave darts, pinned against the
    INDEPENDENT exact-Fraction slab oracle (tests/fraction_area.py —
    vertical slab decomposition, no shared code with the face-walk
    kernel). Kernel error must stay inside the snap-rounding
    perturbation bound AND the 1/1024 quantization used by the gated
    st_buffer query must agree between kernel and oracle."""
    import math
    from fractions import Fraction

    import numpy as np

    from fraction_area import buffer_areas_exact
    from osgeo_gdal_spark.kernels import buffer as BF, snap as SN
    from osgeo_gdal_spark.kernels.clip import ring_area

    pts = DARTS[di]
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    if ring_area(xs, ys) < 0:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
        pts = pts[::-1]
    dil_e, ero_e = buffer_areas_exact(pts, Fraction(d))
    g = 2.0 ** -21
    dil_k = SN.rings_area(BF.buffer_rings([(xs, ys)], d, quadsegs=1,
                                          grid=g))
    ero_k = SN.rings_area(BF.buffer_rings([(xs, ys)], -d, quadsegs=1,
                                          grid=g))
    # snap-rounding perturbation bound: <= #vertices * grid/2 * diam
    assert abs(dil_k - float(dil_e)) < 1e-4
    assert abs(ero_k - float(ero_e)) < 1e-4
    for kern, exact in ((dil_k, dil_e), (ero_k, ero_e)):
        assert math.floor(kern * 1024 + 0.5) == \
            math.floor(float(exact) * 1024 + 0.5)


@given(
    st.lists(
        st.tuples(st.floats(0.05, 0.95), st.floats(0.05, 0.95),
                  st.floats(0.05, 0.95)),
        min_size=1, max_size=5),
    st.floats(0.0, 9.0), st.floats(0.2, 6.0),
    st.floats(-1.0, 1.0), st.floats(0.3, 3.0),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_identity_fold_partitions_input(bands, ax0, aw, ay0, ah):
    """The per-feature Identity fold (operators/overlay.identity_features
    kernel): for pairwise-DISJOINT method polygons B_i, the emitted
    pieces A∩B_i plus the running-difference residual A−∪B partition A —
    areas sum to |A| (float kernel, 1e-9). Method layer built as one
    rect per unit x-band so disjointness holds by construction."""
    from osgeo_gdal_spark.kernels import overlay_kernel as OVK

    def rect(x0, y0, x1, y1):
        return [([x0, x1, x1, x0], [y0, y0, y1, y1])]

    a = rect(ax0, ay0, ax0 + aw, ay0 + ah)
    a_area = OVK.rings_area(a)
    polys = []
    for i, (fx, fy0, fh) in enumerate(bands):
        x0 = 2.0 * i + fx * 0.9
        polys.append(rect(x0, fy0 * 4.0 - 2.0, x0 + 0.9,
                          fy0 * 4.0 - 2.0 + fh * 3.0))
    # the FLOAT kernel's general-position contract (degenerate and
    # NEAR-degenerate contacts route to the snapped tier in
    # production): every A coordinate separated from every method
    # coordinate by more than the kernel's noise scale
    axs = {ax0, ax0 + aw}
    ays = {ay0, ay0 + ah}
    for (xs, ys) in (r[0] for r in polys):
        assume(all(abs(x - axv) > 1e-6 for x in xs for axv in axs))
        assume(all(abs(y - ayv) > 1e-6 for y in ys for ayv in ays))
    total = 0.0
    acc = a
    for rb in polys:
        piece = OVK.overlay_rings(a, rb, "intersection")
        if piece:
            total += OVK.rings_area(piece)
        if acc:
            acc = OVK.overlay_rings(acc, rb, "difference")
    if acc:
        total += OVK.rings_area(acc)
    assert abs(total - a_area) < 1e-9
