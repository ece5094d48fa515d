"""Device-side (JAX) HEALPix geometry for the hot paths.

Only the operations needed inside jitted compute are implemented here:
RING-scheme ang->pix (particle deposit), pix->unit-vector (interpolation
neighbors), and the 4-pixel bilinear ``get_interpol`` (field interpolation to
rays).  Valid for order <= 13 (pixel indices < 2^31, int32).  Host-side code
uses healpix.core (numpy int64) instead.

Numerical care in f32: polar-cap z is computed via 1-z (exact small quantity)
so sin(theta) stays accurate near the poles, and integer sqrt uses a
float-then-correct scheme so ring decoding is exact.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import core as hp


def _isqrt_dev(x):
    """Exact integer sqrt for int32 x (x < 2^31)."""
    r = jnp.sqrt(x.astype(jnp.float32)).astype(jnp.int32)
    r = jnp.where((r + 1) * (r + 1) <= x, r + 1, r)
    r = jnp.where(r * r > x, r - 1, r)
    return r


def ang2pix_ring(theta, phi, order: int):
    """Vectorized RING ang2pix on device (healpix_utils ang2ring parity)."""
    nside = 1 << order
    npix = 12 * nside * nside
    ncap = 2 * nside * (nside - 1)
    z = jnp.cos(theta)
    za = jnp.abs(z)
    tt = jnp.mod(phi, 2.0 * jnp.pi) * (2.0 / jnp.pi)

    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = jnp.floor(temp1 - temp2).astype(jnp.int32)
    jm = jnp.floor(temp1 + temp2).astype(jnp.int32)
    ir = nside + 1 + jp - jm
    kshift = 1 - (ir & 1)
    ipe = (jp + jm - nside + kshift + 1) >> 1
    ipe = jnp.mod(ipe, 4 * nside)
    pix_eq = ncap + (ir - 1) * 4 * nside + ipe

    tp = tt - jnp.floor(tt)
    tmp = nside * jnp.sqrt(jnp.maximum(3.0 * (1.0 - za), 0.0))
    jp_c = jnp.floor(tp * tmp).astype(jnp.int32)
    jm_c = jnp.floor((1.0 - tp) * tmp).astype(jnp.int32)
    ir_c = jp_c + jm_c + 1
    ip_c = jnp.floor(tt * ir_c).astype(jnp.int32)
    ip_c = jnp.mod(ip_c, 4 * ir_c)
    pix_cap = jnp.where(z > 0, 2 * ir_c * (ir_c - 1) + ip_c,
                        npix - 2 * ir_c * (ir_c + 1) + ip_c)
    return jnp.where(za <= 2.0 / 3.0, pix_eq, pix_cap).astype(jnp.int32)


def vec2pix_ring(vec, order: int):
    theta, phi = vec2ang(vec)
    return ang2pix_ring(theta, phi, order)


def vec2ang(vec):
    r = jnp.linalg.norm(vec, axis=-1)
    theta = jnp.arccos(jnp.clip(vec[..., 2] / r, -1.0, 1.0))
    phi = jnp.arctan2(vec[..., 1], vec[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


def pix2vec_ring(pix, order: int, dtype=jnp.float32):
    """RING pix -> unit vector [..., 3], pole-stable."""
    x, y, z = pix2vec_ring_soa(pix, order, dtype)
    return jnp.stack([x, y, z], axis=-1)


def pix2vec_ring_soa(pix, order: int, dtype=jnp.float32):
    """RING pix -> unit vector components (x, y, z), pole-stable (uses
    1-|z| in the caps).  SoA form: no trailing length-3 axis is ever
    materialized (TPU tiling pads small trailing dims; rays/soa.py)."""
    nside = 1 << order
    npix = 12 * nside * nside
    ncap = 2 * nside * (nside - 1)
    pix = pix.astype(jnp.int32)

    north = pix < ncap
    south = pix >= npix - ncap

    # north cap decode
    iring_n = (1 + _isqrt_dev(1 + 2 * pix)) >> 1
    iphi_n = pix + 1 - 2 * iring_n * (iring_n - 1)
    # south cap decode
    ip_s = npix - pix
    iring_s = (1 + _isqrt_dev(2 * ip_s - 1)) >> 1
    iphi_s = 4 * iring_s + 1 - (ip_s - 2 * iring_s * (iring_s - 1))
    # equatorial decode
    ip_e = pix - ncap
    tmp = ip_e >> (order + 2)
    iring_e = tmp + nside
    iphi_e = ip_e - tmp * 4 * nside + 1
    fodd = jnp.where((iring_e + nside) & 1 != 0, 1.0, 0.5).astype(dtype)

    iring_cap = jnp.where(north, iring_n, iring_s)
    iphi_cap = jnp.where(north, iphi_n, iphi_s)

    # cap: 1 - |z| = iring^2/(3 nside^2) computed in the small quantity
    one_minus_az = (iring_cap.astype(dtype) ** 2) * (1.0 / (3.0 * nside * nside))
    z_cap = jnp.where(north, 1.0 - one_minus_az, one_minus_az - 1.0)
    sth_cap = jnp.sqrt(one_minus_az * (2.0 - one_minus_az))
    phi_cap = (iphi_cap.astype(dtype) - 0.5) * (jnp.pi / 2.0) / iring_cap.astype(dtype)

    z_eq = (4.0 / 3.0) - 2.0 * iring_e.astype(dtype) / (3.0 * nside)
    sth_eq = jnp.sqrt(jnp.maximum(1.0 - z_eq * z_eq, 0.0))
    phi_eq = (iphi_e.astype(dtype) - fodd) * (jnp.pi / (2.0 * nside))

    cap = north | south
    z = jnp.where(cap, z_cap, z_eq)
    sth = jnp.where(cap, sth_cap, sth_eq)
    phi = jnp.where(cap, phi_cap, phi_eq)
    return sth * jnp.cos(phi), sth * jnp.sin(phi), z


# ----------------------------------------------------------------------------
# NEST <-> RING on device (int32; valid for order <= 13, npix < 2^31)
# ----------------------------------------------------------------------------

def _spread_bits32(v):
    """Bit i of v -> bit 2i (v < 2^15; int32 device analog of
    core._spread_bits)."""
    x = v & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _compress_bits32(v):
    """Inverse of _spread_bits32: keep even bits, pack them."""
    x = v & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def ring2xyf_dev(pix, order: int):
    """Device RING pixel -> (x, y, face) (port of core.ring2xyf; int32 —
    all intermediates < 2^31 for order <= 13)."""
    nside = 1 << order
    npix = 12 * nside * nside
    ncap = 2 * nside * (nside - 1)
    pix = pix.astype(jnp.int32)

    north = pix < ncap
    south = pix >= npix - ncap

    iring_n = (1 + _isqrt_dev(1 + 2 * pix)) >> 1
    iphi_n = pix + 1 - 2 * iring_n * (iring_n - 1)
    face_n = (iphi_n - 1) // jnp.maximum(iring_n, 1)

    ip = pix - ncap
    tmp = ip >> (order + 2)
    iring_e = tmp + nside
    iphi_e = ip - tmp * 4 * nside + 1
    kshift_e = (iring_e + nside) & 1
    ire = iring_e - nside + 1
    irm = 2 * nside + 2 - ire
    ifm = (iphi_e - ire // 2 + nside - 1) >> order
    ifp = (iphi_e - irm // 2 + nside - 1) >> order
    face_e = jnp.where(ifp == ifm, ifp | 4, jnp.where(ifp < ifm, ifp, ifm + 8))

    ip_s = npix - pix
    iring_sl = (1 + _isqrt_dev(2 * ip_s - 1)) >> 1
    iphi_s = 4 * iring_sl + 1 - (ip_s - 2 * iring_sl * (iring_sl - 1))
    face_s = 8 + (iphi_s - 1) // jnp.maximum(iring_sl, 1)
    iring_s = 4 * nside - iring_sl

    iring = jnp.where(north, iring_n, jnp.where(south, iring_s, iring_e))
    iphi = jnp.where(north, iphi_n, jnp.where(south, iphi_s, iphi_e))
    kshift = jnp.where(north | south, 0, kshift_e)
    nr = jnp.where(north, iring_n, jnp.where(south, iring_sl, nside))
    face = jnp.where(north, face_n, jnp.where(south, face_s, face_e))

    jrll = jnp.asarray(hp.JRLL, jnp.int32)[face]
    jpll = jnp.asarray(hp.JPLL, jnp.int32)[face]
    irt = iring - jrll * nside + 1
    ipt = 2 * iphi - jpll * nr - kshift - 1
    ipt = jnp.where(ipt >= 2 * nside, ipt - 8 * nside, ipt)
    x = (ipt - irt) >> 1
    y = (-ipt - irt) >> 1
    return x, y, face


def xyf2ring_dev(x, y, f, order: int):
    """Device (x, y, face) -> RING pixel (port of core.xyf2ring; int32)."""
    nside = 1 << order
    npix = 12 * nside * nside
    ncap = 2 * nside * (nside - 1)
    jrll = jnp.asarray(hp.JRLL, jnp.int32)[f]
    jpll = jnp.asarray(hp.JPLL, jnp.int32)[f]

    jr = jrll * nside - x - y - 1
    north = jr < nside
    south = jr > 3 * nside

    nr = jnp.where(north, jr, jnp.where(south, 4 * nside - jr, nside))
    n_before = jnp.where(
        north, 2 * nr * (nr - 1),
        jnp.where(south, npix - 2 * (nr + 1) * nr,
                  ncap + (jr - nside) * 4 * nside))
    kshift = jnp.where(north | south, 0, (jr - nside) & 1)

    jp = (jpll * nr + x - y + 1 + kshift) >> 1
    jp = jnp.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = jnp.where(jp < 1, jp + 4 * nr, jp)
    return n_before + jp - 1


def nest2ring_dev(pix, order: int):
    """Device NEST -> RING (order <= 13)."""
    pix = pix.astype(jnp.int32)
    f = pix >> (2 * order)
    p = pix & ((1 << (2 * order)) - 1)
    return xyf2ring_dev(_compress_bits32(p), _compress_bits32(p >> 1), f,
                        order)


def ring2nest_dev(pix, order: int):
    """Device RING -> NEST (order <= 13)."""
    x, y, f = ring2xyf_dev(pix, order)
    return (f << (2 * order)) + _spread_bits32(x) + (_spread_bits32(y) << 1)


def coarse_nest_from_ring(rpix, ray_order: int, map_order: int):
    """RING pixel at ray_order -> NEST pixel of its map_order parent
    (the lens-map NGP pixel, maputils.c:129-165: ray->nest >> 2*dk).
    Shifting (x, y) before the bit spread keeps every value < 2^15."""
    assert map_order <= ray_order <= 13
    k = ray_order - map_order
    x, y, f = ring2xyf_dev(rpix, ray_order)
    return ((f << (2 * map_order)) + _spread_bits32(x >> k)
            + (_spread_bits32(y >> k) << 1))


class InterpTables:
    """Device ring tables for get_interpol at a given order."""

    def __init__(self, order: int, dtype=jnp.float32):
        rt = hp.build_ring_table(order)
        self.order = order
        self.nside = rt.nside
        self.npix = rt.npix
        # host numpy: embedded as jit constants without device round-trips
        self.startpix = np.asarray(rt.startpix, dtype=np.int32)
        self.ringpix = np.asarray(rt.ringpix, dtype=np.int32)
        self.theta = np.asarray(rt.theta, dtype=np.dtype(dtype))
        self.shifted = np.asarray(rt.shifted.astype(np.float64) * 0.5, dtype=np.dtype(dtype))


def _ring_geo_closed(ir, nside: int, npix: int, fdtype):
    """Closed-form per-ring geometry for 1-indexed ring numbers ``ir`` —
    the RingTable formulas (core.py RingTable.__init__) evaluated as pure
    vector arithmetic.  Replaces four 16K-entry table gathers per ring in
    the interp hot path (measured 30x faster on the v5e rayside profile:
    0.027 s vs 0.816 s tap arithmetic at order 12 / 12.6M rays).

    startpix/ringpix are computed in int32 (exact; the f32 path would
    round above 2^24 — npix is 201M at order 12).  The worst int32
    product, 2*ir*(ir-1) at ir = 4*nside-1, stays below 2^31 through
    order 13 (the device-path ceiling, see ring2nest_dev)."""
    north = ir < nside
    south = ir > 3 * nside
    isouth = 4 * nside - ir
    nr = 4 * jnp.where(north, ir, jnp.where(south, isouth, nside))
    ncap = 2 * nside * (nside - 1)
    sp = jnp.where(
        north, 2 * ir * (ir - 1),
        jnp.where(south, npix - 2 * isouth * (isouth + 1),
                  ncap + (ir - nside) * (4 * nside)))
    shift = jnp.where(north | south, True,
                      ((ir + nside) & 1) == 0).astype(fdtype) * 0.5
    irf = ir.astype(fdtype)
    isf = isouth.astype(fdtype)
    # caps: theta = 2 asin(ir sqrt(1/(6 nside^2))) — cancellation-free form
    # of arccos(1 - ir^2/(3 nside^2)); the arccos form loses ~3e-6 rad in
    # f32 near the poles (vs ring spacing ~1e-4 at order 12)
    half = float(np.sqrt(1.0 / 6.0) / float(nside))
    th_n = 2.0 * jnp.arcsin(jnp.clip(irf * half, 0.0, 1.0))
    th_s = float(np.pi) - 2.0 * jnp.arcsin(jnp.clip(isf * half, 0.0, 1.0))
    z_belt = 4.0 / 3.0 - 2.0 * irf / (3.0 * float(nside))
    th_e = jnp.arccos(jnp.clip(z_belt, -1.0, 1.0))
    thr = jnp.where(north, th_n, jnp.where(south, th_s, th_e))
    return sp, nr, shift, thr


def ring_decode_pix(pk, nside: int, npix: int):
    """RING pixel -> (ring number 1..4nside-1, 0-based index in ring) —
    exact int32 arithmetic (order <= 13).  Used to reconstruct a tap's
    geometry from the pixel id that was ACTUALLY gathered (rays/soa.py
    materialized-tap weights)."""
    ncap = 2 * nside * (nside - 1)
    pk = pk.astype(jnp.int32)
    north = pk < ncap
    south = pk >= npix - ncap
    ir_n = (1 + _isqrt_dev(1 + 2 * pk)) >> 1
    i_n = pk - 2 * ir_n * (ir_n - 1)
    ip_s = npix - pk  # 1..ncap for south pixels
    ir_sl = (1 + _isqrt_dev(jnp.maximum(2 * ip_s - 1, 1))) >> 1
    i_s = 2 * ir_sl * (ir_sl + 1) - ip_s
    ip_e = pk - ncap
    tmp = ip_e // (4 * nside)
    ir_e = tmp + nside
    i_e = ip_e - tmp * (4 * nside)
    ring = jnp.where(north, ir_n, jnp.where(south, 4 * nside - ir_sl, ir_e))
    idx = jnp.where(north, i_n, jnp.where(south, i_s, i_e))
    return ring, idx


def get_interpol_soa(tab: InterpTables, theta, phi):
    """Device 4-pixel bilinear taps as separate [N] arrays (SoA).

    Returns ((p0..p3 int32 RING indices), (w0..w3 weights)).
    """
    nside = tab.nside
    z = jnp.cos(theta)
    az = jnp.abs(z)
    ir_cap = (nside * jnp.sqrt(jnp.maximum(3.0 * (1.0 - az), 0.0))).astype(jnp.int32)
    ir_eq = (nside * (2.0 - 1.5 * z)).astype(jnp.int32)
    # KNIFE-EDGE PINNING.  ring_above and tmp (below) sit on floor()/astype
    # knife edges: rays at exact pixel centers (every full-sky ray grid with
    # rayOrder == mapOrder) evaluate them at exact integers.  XLA fusion may
    # DUPLICATE their float producer chains into several consumer fusions
    # whose rewrites (fma, reciprocal strength-reduction) round differently;
    # the duplicated copies then disagree about which side of the edge the
    # ray is on, and downstream quantities derived from different copies mix
    # (a weight paired with the wrong pixel, a gather with the wrong
    # parallel transport) — an O(1) error.  optimization_barrier pins each
    # such quantity to ONE materialized value; everything derived from the
    # pinned tensor is plain IEEE ops with no rewrite freedom.  (Caught by
    # test_sharded_step_matches_single_device at order 5.)
    ring_above = jax.lax.optimization_barrier(
        jnp.where(az <= 2.0 / 3.0, ir_eq,
                  jnp.where(z > 0, ir_cap, 4 * nside - ir_cap - 1)))
    ir1 = ring_above
    ir2 = ring_above + 1
    nrings = 4 * nside - 1

    def ring_interp(ir):
        sp, nr, shift, thr = _ring_geo_closed(
            jnp.clip(ir, 1, nrings), nside, tab.npix, theta.dtype)
        dphi = 2.0 * jnp.pi / nr.astype(theta.dtype)
        tmp = jax.lax.optimization_barrier(phi / dphi - shift)
        # i1 and w MUST both come from the same pinned tmp (see above)
        i1f = jnp.floor(tmp)
        i1 = i1f.astype(jnp.int32)
        w = tmp - i1f
        i2 = i1 + 1
        i1 = jnp.where(i1 < 0, i1 + nr, i1)
        i2 = jnp.where(i2 >= nr, i2 - nr, i2)
        return sp + i1, sp + i2, w, thr

    p11, p12, w1, theta1 = ring_interp(ir1)
    p21, p22, w2, theta2 = ring_interp(ir2)

    north = ir1 == 0
    south = ir2 == 4 * nside
    generic = ~(north | south)

    wt = (theta - theta1) / jnp.where(theta2 != theta1, theta2 - theta1, 1.0)
    wg0 = (1.0 - wt) * (1.0 - w1)
    wg1 = (1.0 - wt) * w1
    wg2 = wt * (1.0 - w2)
    wg3 = wt * w2

    # north pole fold (reference get_interpol ir1==0 branch)
    wtn = theta / theta2
    facn = (1.0 - wtn) * 0.25
    # south pole fold
    wts = (theta - theta1) / (jnp.pi - theta1)
    facs = wts * 0.25

    w0 = jnp.where(north, facn, jnp.where(south, (1.0 - wts) * (1.0 - w1) + facs, wg0))
    w1_ = jnp.where(north, facn, jnp.where(south, (1.0 - wts) * w1 + facs, wg1))
    w2_ = jnp.where(north, wtn * (1.0 - w2) + facn, jnp.where(south, facs, wg2))
    w3_ = jnp.where(north, wtn * w2 + facn, jnp.where(south, facs, wg3))

    npix = tab.npix
    p0 = jnp.where(north, (p21 + 2) % 4, p11)
    p1 = jnp.where(north, (p22 + 2) % 4, p12)
    p2 = jnp.where(south, ((p11 + 2) & 3) + npix - 4, p21)
    p3 = jnp.where(south, ((p12 + 2) & 3) + npix - 4, p22)

    # pin taps+weights as materialized values: XLA fusion may otherwise
    # DUPLICATE this producer chain into several consumer fusions that
    # round the floor() knife edge differently — consumers then disagree
    # about which pixel a tap is (observed: the field gather used taps
    # (k-1, k) while the parallel-transport chain used (k, k+1) for rays
    # at exact pixel centers, an O(1) error caught by the sharded-vs-
    # single step equivalence)
    return jax.lax.optimization_barrier(
        ((p0, p1, p2, p3), (w0, w1_, w2_, w3_)))


def triangles_ring(tab: InterpTables, pix):
    """Device triangulation: RING pixels [...] -> triangle vertex RING
    indices [..., 4, 3] int32, -1-padded (port of the reference's per-pixel
    ring2triangle, healpix_utils.c:1273-1423 / healpix.core.build_triangles;
    equivalence-tested against the host table).
    """
    nside = tab.nside
    npix = tab.npix
    nrings = 4 * nside - 1
    startpix_t = jnp.asarray(tab.startpix)
    ringpix_t = jnp.asarray(tab.ringpix)
    # shifted table stores 0.5 * shifted flag (see InterpTables); recover int
    sh_t = (jnp.asarray(tab.shifted) * 2.0).astype(jnp.int32)

    pix = pix.astype(jnp.int32)
    ringnum = jnp.searchsorted(startpix_t, pix, side="right").astype(jnp.int32)
    row = ringnum - 1
    sp = startpix_t[row]
    Np = ringpix_t[row]
    sh = sh_t[row]
    ip = pix - sp
    ringA = ringnum - 1
    rowA = jnp.clip(ringA, 1, nrings) - 1
    spA = startpix_t[rowA]
    NpA = ringpix_t[rowA]

    right = (ip + 1) % Np + sp
    shape = pix.shape

    neg = jnp.full(shape, -1, jnp.int32)

    # north polar cap rings 2..nside
    rn = jnp.maximum(ringnum, 1)
    ib = ip % rn
    bnum = ip // rn
    interior = ib < ringnum - 1
    X_int = (ib + bnum * ringA) % NpA + spA
    X_cor = (ib + bnum * ringA - 1) % NpA + spA
    Xn = jnp.where(interior, X_int, X_cor)
    X2n = (X_int - spA - 1) % NpA + spA

    # equatorial rings nside+1 .. 3*nside
    ibe = ip % nside
    bne = ip // nside
    above_nr = jnp.where(ringA > nside, nside, ringA)
    Xe = (sh + ibe + bne * above_nr) % NpA + spA
    Xe2 = (Xe - spA - 1) % NpA + spA

    # south polar cap rings 3*nside+1 .. 4*nside-1
    nring = jnp.maximum(4 * nside - ringnum, 1)
    nringA = jnp.maximum(4 * nside - ringA, 1)
    ibs = ip % nring
    bns = ip // nring
    Xs = (sh + ibs + bns * nringA) % NpA + spA
    Xs2 = (Xs - spA - 1) % NpA + spA
    Xs3 = (Xs2 - spA - 1) % NpA + spA

    m_n = (ringnum >= 2) & (ringnum <= nside)
    m_e = (ringnum > nside) & (ringnum <= 3 * nside)
    m_s = ringnum > 3 * nside

    # slot 0: (pix, right, X)
    t0b = right
    t0c = jnp.where(m_n, Xn, jnp.where(m_e, Xe, Xs))
    # slot 1: (pix, X, X2)
    s1_ok = (m_n & interior) | m_e | m_s
    t1b = jnp.where(m_n, X_int, jnp.where(m_e, Xe, Xs))
    t1c = jnp.where(m_n, X2n, jnp.where(m_e, Xe2, Xs2))
    # slot 2: south corner closer
    s2_ok = m_s & (ibs == 0)
    t2b, t2c = Xs2, Xs3

    def tri_row(ok, b, c):
        a = jnp.where(ok, pix, neg)
        return jnp.stack([a, jnp.where(ok, b, neg), jnp.where(ok, c, neg)],
                         axis=-1)

    tri = jnp.stack([
        tri_row(m_n | m_e | m_s, t0b, t0c),
        tri_row(s1_ok, t1b, t1c),
        tri_row(s2_ok, t2b, t2c),
        jnp.broadcast_to(neg[..., None], shape + (3,)),
    ], axis=-2)  # [..., 4, 3]

    # ring-1 cap closers (pixels 0..3): exactly two triangles total
    is_r1 = ringnum == 1
    r1a = jnp.where(pix == 0, 0, jnp.where(pix == 2, 2, -1))
    r1b = jnp.where(pix == 0, 2, jnp.where(pix == 2, 0, -1))
    r1c = jnp.where(pix == 0, 3, jnp.where(pix == 2, 1, -1))
    r1row = jnp.stack([r1a, r1b, r1c], axis=-1)
    tri = jnp.where(is_r1[..., None, None],
                    jnp.concatenate([r1row[..., None, :],
                                     jnp.broadcast_to(neg[..., None, None],
                                                      shape + (3, 3))],
                                    axis=-2),
                    tri)

    # south pole closers appended at slot 3 of the last ring's two pixels
    last1 = pix == npix - 1
    last3 = pix == npix - 3
    close = jnp.stack([
        jnp.where(last1, npix - 1, jnp.where(last3, npix - 3, -1)),
        jnp.where(last1, npix - 3, jnp.where(last3, npix - 2, -1)),
        jnp.where(last1, npix - 4, jnp.where(last3, npix - 1, -1)),
    ], axis=-1)
    tri = tri.at[..., 3, :].set(jnp.where((last1 | last3)[..., None],
                                          close, tri[..., 3, :]))
    return tri


def ring_window(tab: InterpTables, theta, phi, nring_w: int, nphi_w: int):
    """Candidate RING pixels in a (2*nring_w) x (2*nphi_w+2) window around
    (theta, phi): rows are consecutive rings bracketing theta, columns the
    pixels nearest phi in each ring.  Pure index arithmetic on the O(nrings)
    ring tables (the device analog of the grid-search candidate prep).

    Returns (pix [..., R, C] int32, valid [..., R, C] bool).
    """
    nside = tab.nside
    nrings = 4 * nside - 1
    startpix_t = jnp.asarray(tab.startpix)
    ringpix_t = jnp.asarray(tab.ringpix)
    shifted_t = jnp.asarray(tab.shifted)

    z = jnp.cos(theta)
    az = jnp.abs(z)
    ir_cap = (nside * jnp.sqrt(jnp.maximum(3.0 * (1.0 - az), 0.0))
              ).astype(jnp.int32)
    ir_eq = (nside * (2.0 - 1.5 * z)).astype(jnp.int32)
    ring_above = jnp.where(az <= 2.0 / 3.0, ir_eq,
                           jnp.where(z > 0, ir_cap, 4 * nside - ir_cap - 1))

    drs = jnp.arange(-nring_w + 1, nring_w + 1, dtype=jnp.int32)
    ir = ring_above[..., None] + drs  # [..., R] 1-based
    rvalid = (ir >= 1) & (ir <= nrings)
    row = jnp.clip(ir, 1, nrings) - 1
    sp = startpix_t[row]
    nr = ringpix_t[row]
    shift = shifted_t[row]
    dphi = 2.0 * jnp.pi / nr.astype(theta.dtype)
    i0 = jnp.floor(phi[..., None] / dphi - shift).astype(jnp.int32) - nphi_w

    cols = jnp.arange(2 * nphi_w + 2, dtype=jnp.int32)
    ic = i0[..., None] + cols  # [..., R, C]
    ic = jnp.mod(ic, nr[..., None])
    pixw = sp[..., None] + ic
    # mark duplicate columns when the window wraps a tiny polar ring
    cvalid = cols < nr[..., None]
    return pixw, rvalid[..., None] & cvalid


def get_interpol(tab: InterpTables, theta, phi):
    """Device 4-pixel bilinear weights (healpix_utils get_interpol parity).

    Returns (pix [..., 4] int32 RING indices, wgt [..., 4]).  Prefer
    get_interpol_soa in TPU hot paths: the stacked [N, 4] form tiles to
    (8, 128) and allocates 32x its logical size when materialized."""
    (p0, p1, p2, p3), (w0, w1, w2, w3) = get_interpol_soa(tab, theta, phi)
    pix = jnp.stack([p0, p1, p2, p3], axis=-1)
    wgt = jnp.stack([w0, w1, w2, w3], axis=-1)
    return pix, wgt
