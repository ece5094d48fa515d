"""Structure-of-arrays ray-side compute (TPU layout discipline).

TPU tiles the last two axes of every buffer to (8, 128): an [N, 2, 2] matrix
array allocates 64x its logical size and an [N, 3] vector 40x.  The ray
pytree therefore lives PACKED as one f32[21, N] buffer (pads 21 -> 24 only),
and the whole per-plane ray side — field interpolation with parallel
transport (shtpoissonsolve.c:1122-1204) and geodesic propagation
(rayprop.c:18-189) — is computed here componentwise on [N]-shaped lanes,
never materializing small trailing dims.

Row layout: 0-2 n, 3-5 beta, 6-9 A (00,01,10,11), 10-13 Aprev, 14-15 alpha,
16-19 U, 20 phi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..healpix import jaxhp


def _debug_halo():
    """CALCLENS_DEBUG_HALO=1: NaN-poison sharded-interp taps outside the
    halo window (read at trace time; see parallel.halo.required_halo)."""
    import os

    return os.environ.get("CALCLENS_DEBUG_HALO", "0") == "1"

NROWS = 21
ROWS = dict(n=(0, 3), beta=(3, 6), A=(6, 10), Aprev=(10, 14),
            alpha=(14, 16), U=(16, 20), phi=(20, 21))


def pack(rays):
    """Rays NamedTuple (array-of-struct views) -> packed f32[21, N]."""
    N = rays.n.shape[0]
    rows = [rays.n[:, 0], rays.n[:, 1], rays.n[:, 2],
            rays.beta[:, 0], rays.beta[:, 1], rays.beta[:, 2],
            rays.A[:, 0, 0], rays.A[:, 0, 1], rays.A[:, 1, 0], rays.A[:, 1, 1],
            rays.Aprev[:, 0, 0], rays.Aprev[:, 0, 1],
            rays.Aprev[:, 1, 0], rays.Aprev[:, 1, 1],
            rays.alpha[:, 0], rays.alpha[:, 1],
            rays.U[:, 0, 0], rays.U[:, 0, 1], rays.U[:, 1, 0], rays.U[:, 1, 1],
            rays.phi]
    return jnp.stack(rows, axis=0)


def unpack(packed):
    """packed f32[21, N] -> Rays NamedTuple (host-friendly views)."""
    from .propagate import Rays

    r = packed
    n = jnp.stack([r[0], r[1], r[2]], axis=-1)
    beta = jnp.stack([r[3], r[4], r[5]], axis=-1)

    def mat(i):
        return jnp.stack([jnp.stack([r[i], r[i + 1]], -1),
                          jnp.stack([r[i + 2], r[i + 3]], -1)], -2)

    return Rays(n=n, beta=beta, A=mat(6), Aprev=mat(10),
                alpha=jnp.stack([r[14], r[15]], -1), U=mat(16), phi=r[20])


# ----------------------------------------------------------------------------
# componentwise geometry helpers (rot_paratrans.c, branch-free)
# ----------------------------------------------------------------------------

def _transport_psi(vx, vy, vz, rx, ry, rz):
    """cos/sin of the parallel-transport basis angle from unit v to unit r
    (rot_paratrans.c:101-273), componentwise."""
    ax = vy * rz - vz * ry
    ay = vz * rx - vx * rz
    az = vx * ry - vy * rx
    cosang = vx * rx + vy * ry + vz * rz
    sinang = jnp.sqrt(ax * ax + ay * ay + az * az)
    safe = sinang > 0.0
    inv = 1.0 / jnp.where(safe, sinang, 1.0)
    ax = jnp.where(safe, ax * inv, 1.0)
    ay = jnp.where(safe, ay * inv, 0.0)
    az = jnp.where(safe, az * inv, 0.0)

    # rotate e_phi(v) = (-vy, vx, 0) about the axis by (cosang, sinang)
    px, py, pz = -vy, vx, jnp.zeros_like(vx)
    adotp = ax * px + ay * py + az * pz
    cx = ay * pz - az * py
    cy = az * px - ax * pz
    cz = ax * py - ay * px
    one_m_c = 1.0 - cosang
    qx = px * cosang + ax * adotp * one_m_c + cx * sinang
    qy = py * cosang + ay * adotp * one_m_c + cy * sinang
    qz = pz * cosang + az * adotp * one_m_c + cz * sinang

    # r's tangent basis (unnormalized, normalization via `inv2` below)
    ephx, ephy = -ry, rx
    etx = rz * rx
    ety = rz * ry
    etz = -(rx * rx + ry * ry)

    norm = jnp.sqrt((1.0 - rz) * (1.0 + rz) * (1.0 - vz) * (1.0 + vz))
    inv2 = 1.0 / jnp.where(norm > 0.0, norm, 1.0)
    sinpsi = (qx * etx + qy * ety + qz * etz) * inv2
    cospsi = (qx * ephx + qy * ephy) * inv2
    same = sinang == 0.0
    return jnp.where(same, 1.0, cospsi), jnp.where(same, 0.0, sinpsi)


def _rot_tensor(c, s, t00, t01, t10, t11):
    """R^T T R with R = [[c, -s], [s, c]] — componentwise."""
    # T R = [[t00 c + t01 s, -t00 s + t01 c], [t10 c + t11 s, -t10 s + t11 c]]
    a = t00 * c + t01 * s
    b = -t00 * s + t01 * c
    d = t10 * c + t11 * s
    e = -t10 * s + t11 * c
    # R^T (T R)
    return (c * a + s * d, c * b + s * e,
            -s * a + c * d, -s * b + c * e)


def _tangent_basis(nx, ny, nz):
    """Orthonormal (theta_hat, phi_hat) at the unit vector n."""
    npv = jnp.sqrt(nx * nx + ny * ny)
    inv = 1.0 / jnp.maximum(npv, 1e-30)
    phx, phy = -ny * inv, nx * inv
    # theta_hat = (nz nx, nz ny, -(nx^2+ny^2)) / npv
    thx = nz * nx * inv
    thy = nz * ny * inv
    thz = -npv
    return thx, thy, thz, phx, phy


# ----------------------------------------------------------------------------
# field interpolation + propagation (one fused chunk step)
# ----------------------------------------------------------------------------

def interp_and_prop_chunk(tab, maps, chunk, wp, wpm1, wpm2, born: bool,
                          pix_base=None):
    """packed chunk f32[21, c]: interpolate (pot, alpha, U) from the six
    field maps with 4-pixel bilinear + parallel transport, then propagate to
    radius wp.  Returns the updated packed chunk.

    maps: FieldMaps or a stacked [6, npix] array (pot, gt, gp, gtt, gtp,
    gpp rows) — the stacked form fetches all six fields per tap in ONE
    row-gather (3.4x faster than six separate gathers on TPU).

    pix_base: when maps is a WINDOW of the full map (sharded halo-exchange
    path, parallel/halo.py), the global RING index of the window's first
    column; tap indices are translated and clipped into the window.

    MISPAIRING-PROOF TAP STRUCTURE.  The bilinear tap indices come from
    floor()/astype knife edges (rays at exact pixel centers — every
    full-sky ray grid — and every cap ray at theta-nesting ray/map orders
    sits exactly on one).  XLA fusion may duplicate those float chains
    into several consumer fusions whose rewrites round differently, so two
    consumers of "the same" tap index can disagree by one pixel; pairing a
    weight-1 tap with the wrong neighbor's field or transport is an O(1)
    error (jax.lax.optimization_barrier does NOT survive the XLA:CPU
    pipeline, so pinning is impossible).  Defense: a 7th map row carries
    the pixel id (bit-exact), so ONE row-gather atomically returns each
    tap's fields AND its true id; the ring geometry, interpolation weights
    and parallel transport are all reconstructed from that materialized id
    (exact int decode + branch-free position-based weights).  Any knife-
    edge flip then only swaps in a valid neighboring tap set, and the
    position-derived weights keep the interpolation consistent — O(h^2)
    wobble instead of O(1) mispairing.  Caught by
    test_sharded_step_matches_single_device."""
    maps6 = maps if isinstance(maps, jnp.ndarray) else jnp.stack(
        [maps.pot, maps.gt, maps.gp, maps.gtt, maps.gtp, maps.gpp])
    r = chunk
    nx, ny, nz = r[0], r[1], r[2]
    rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    hx, hy, hz = nx / rad, ny / rad, nz / rad
    dt = nx.dtype

    theta = jnp.arccos(jnp.clip(hz, -1.0, 1.0))
    phi = jnp.arctan2(hy, hx)
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    pix4, _ = jaxhp.get_interpol_soa(tab, theta, phi)

    # 7th row: global pixel id of each column, bit-exact in the map dtype.
    # f32 reinterprets the int32 bits with 0x40000000 set (keeps the value
    # a normal float: no denormal-flush hazard; npix < 2^30 through order
    # 13); f64 stores the id as an exact float.
    W = maps6.shape[1]
    glob = jnp.arange(W, dtype=jnp.int32)
    if pix_base is not None:
        glob = glob + pix_base
    if dt == jnp.dtype(jnp.float32):
        iota = jax.lax.bitcast_convert_type(glob | jnp.int32(0x40000000),
                                            jnp.float32)
    else:
        iota = glob.astype(dt)
    maps7 = jnp.concatenate([maps6, iota[None, :]], axis=0)

    fld4 = []
    for k in range(4):
        pk = pix4[k]
        if pix_base is not None:
            pkw = pk - pix_base
            pk = jnp.clip(pkw, 0, W - 1)
        f = maps7[:, pk]  # one row-gather: [7, c]
        if pix_base is not None and _debug_halo():
            # poison out-of-window taps so a truncated halo (see
            # parallel.halo.required_halo) fails loudly instead of
            # interpolating from clamped (wrong) pixels
            f = jnp.where((pkw >= 0) & (pkw < W), f, jnp.nan)
        fld4.append(f)
    return _finish_from_fields(tab, fld4, r, theta, phi, hx, hy, hz,
                               wp, wpm1, wpm2, born)


def _finish_from_fields(tab, fld4, r, theta, phi, hx, hy, hz,
                        wp, wpm1, wpm2, born: bool):
    """Post-gather half of the ray side, shared between the global-gather
    path above and the windowed fast path (rays/interp_fast.py): decode each
    tap's TRUE pixel id from the gathered 7th row, rebuild its ring geometry
    and parallel transport, form position-based weights, accumulate the six
    fields and propagate.  fld4 is [4][7, c] (6 fields + materialized id)."""
    dt = r.dtype
    nside = tab.nside
    npix_map = tab.npix
    nrings = 4 * nside - 1
    two_pi = 2.0 * jnp.pi

    cs4, dl4, th4, rg4 = [], [], [], []
    for k in range(4):
        f = fld4[k]
        if dt == jnp.dtype(jnp.float32):
            pk_true = (jax.lax.bitcast_convert_type(f[6], jnp.int32)
                       & jnp.int32(0x3FFFFFFF))
        else:
            pk_true = f[6].astype(jnp.int32)
        ring, idx = jaxhp.ring_decode_pix(pk_true, nside, npix_map)
        _, nr, shift, thr = jaxhp._ring_geo_closed(ring, nside, npix_map, dt)
        dphi = two_pi / nr.astype(dt)
        phic = (idx.astype(dt) + shift) * dphi
        # signed azimuth offset of the ray from this tap, wrapped to
        # (-pi, pi] (the wrap edge is at the antipode, far from any tap)
        delta = phi - phic
        delta = delta - two_pi * jnp.round(delta / two_pi)
        # tap center vector from the decoded ring geometry
        sthr = jnp.sin(thr)
        cx = sthr * jnp.cos(phic)
        cy = sthr * jnp.sin(phic)
        cz = jnp.cos(thr)
        c_, s_ = _transport_psi(cx, cy, cz, hx, hy, hz)
        cs4.append((c_, s_))
        dl4.append(delta)
        th4.append(thr)
        rg4.append(ring)

    def az_pair(d0, d1):
        """Linear weights for two taps at signed offsets d0, d1 from the
        ray — exact for ANY distinct pair (knife-edge flips just present a
        different valid pair)."""
        span = d1 - d0
        safe = jnp.abs(span) > 1e-30
        inv = 1.0 / jnp.where(safe, span, 1.0)
        a0 = jnp.where(safe, d1 * inv, 0.5)
        return a0, 1.0 - a0

    a0, a1 = az_pair(dl4[0], dl4[1])
    a2, a3 = az_pair(dl4[2], dl4[3])

    ring0, ring2 = rg4[0], rg4[2]
    th0, th2 = th4[0], th4[2]
    span_t = th2 - th0
    safe_t = jnp.abs(span_t) > 1e-30
    wt = (theta - th0) / jnp.where(safe_t, span_t, 1.0)
    wt = jnp.where(safe_t, wt, 0.5)
    wg = ((1.0 - wt) * a0, (1.0 - wt) * a1, wt * a2, wt * a3)

    # pole folds (reference get_interpol ir1==0 / ir2==4nside branches):
    # the remapped slots land on the SAME ring as the real pair, which the
    # materialized ids expose as ring0 == ring2
    same_ring = ring0 == ring2
    north = same_ring & (ring2 == 1)
    south = same_ring & (ring0 == nrings)
    wtn = theta / th2
    facn = (1.0 - wtn) * 0.25
    wts = (theta - th0) / (jnp.pi - th0)
    facs = wts * 0.25
    w0 = jnp.where(north, facn,
                   jnp.where(south, (1.0 - wts) * a0 + facs, wg[0]))
    w1 = jnp.where(north, facn,
                   jnp.where(south, (1.0 - wts) * a1 + facs, wg[1]))
    w2 = jnp.where(north, wtn * a2 + facn, jnp.where(south, facs, wg[2]))
    w3 = jnp.where(north, wtn * a3 + facn, jnp.where(south, facs, wg[3]))
    wgt4 = (w0, w1, w2, w3)

    pot = jnp.zeros_like(theta)
    g0 = jnp.zeros_like(theta)
    g1 = jnp.zeros_like(theta)
    u00 = jnp.zeros_like(theta)
    u01 = jnp.zeros_like(theta)
    u10 = jnp.zeros_like(theta)
    u11 = jnp.zeros_like(theta)
    for k in range(4):
        f = fld4[k]
        wk = wgt4[k].astype(dt)
        c_, s_ = cs4[k]
        pot = pot + f[0] * wk
        gt, gp = f[1], f[2]
        g0 = g0 + (gt * c_ + gp * s_) * wk
        g1 = g1 + (-gt * s_ + gp * c_) * wk
        t00, t01, t10, t11 = _rot_tensor(c_, s_, f[3], f[4], f[4], f[5])
        u00 = u00 + t00 * wk
        u01 = u01 + t01 * wk
        u10 = u10 + t10 * wk
        u11 = u11 + t11 * wk

    # apply: alpha -= grad, U += hess, phi = pot (shtpoissonsolve.c:686-703)
    al0 = r[14] - g0
    al1 = r[15] - g1
    U00 = r[16] + u00
    U01 = r[17] + u01
    U10 = r[18] + u10
    U11 = r[19] + u11

    return _prop_rows(r, al0, al1, U00, U01, U10, U11, pot,
                      wp, wpm1, wpm2, born)


def _prop_rows(r, al0, al1, U00, U01, U10, U11, pot, wp, wpm1, wpm2,
               born: bool, radial_when_straight: bool = False):
    """Componentwise rayprop_sphere on packed rows (rayprop.c:18-189).

    radial_when_straight mirrors the reference's alpha == 0 branch
    (rayprop.c:125-131): unbent rays move RADIALLY (n -> n_hat * wp, beta
    kept) instead of along the beta chord.  The reference takes that branch
    deterministically in its CMB propagation (alpha zeroed by construction,
    propagate_to_cmb_from_restart.c:370-380) and its zero-particle
    NOBACKDENS skip; planes with fields always have |alpha| > 0 in float
    and chord.  Caught by test_reference_binary_cmb_numerical_parity."""
    nx, ny, nz = r[0], r[1], r[2]
    bx, by, bz = r[3], r[4], r[5]
    A00, A01, A10, A11 = r[6], r[7], r[8], r[9]
    P00, P01, P10, P11 = r[10], r[11], r[12], r[13]

    f = wpm1 * (wp - wpm2) / (wp * (wpm1 - wpm2))
    g = (wp - wpm1) / wp
    if born:
        UA00, UA01, UA10, UA11 = U00, U01, U10, U11
    else:
        UA00 = U00 * A00 + U01 * A10
        UA01 = U00 * A01 + U01 * A11
        UA10 = U10 * A00 + U11 * A10
        UA11 = U10 * A01 + U11 * A11
    N00 = (1.0 - f) * P00 + f * A00 - g * UA00
    N01 = (1.0 - f) * P01 + f * A01 - g * UA01
    N10 = (1.0 - f) * P10 + f * A10 - g * UA10
    N11 = (1.0 - f) * P11 + f * A11 - g * UA11

    rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    hx, hy, hz = nx / rad, ny / rad, nz / rad

    if born:
        sc = wp / wpm1
        out = [nx * sc, ny * sc, nz * sc, bx, by, bz,
               N00, N01, N10, N11, A00, A01, A10, A11,
               al0, al1, U00, U01, U10, U11, pot]
        return jnp.stack(out, axis=0)

    # bend beta by |alpha| about n x avec (rayprop.c:64-107)
    amag = jnp.sqrt(al0 * al0 + al1 * al1)
    thx, thy, thz, phx, phy = _tangent_basis(hx, hy, hz)
    avx = al0 * thx + al1 * phx
    avy = al0 * thy + al1 * phy
    avz = al0 * thz
    # axis = normalize(n x avec)
    axx = ny * avz - nz * avy
    axy = nz * avx - nx * avz
    axz = nx * avy - ny * avx
    an = jnp.sqrt(axx * axx + axy * axy + axz * axz)
    inv = 1.0 / jnp.where(an > 0.0, an, 1.0)
    axx, axy, axz = axx * inv, axy * inv, axz * inv
    ca = jnp.cos(amag)
    sa = jnp.sin(amag)
    adotb = axx * bx + axy * by + axz * bz
    cxx = axy * bz - axz * by
    cyy = axz * bx - axx * bz
    czz = axx * by - axy * bx
    omc = 1.0 - ca
    bbx = bx * ca + axx * adotb * omc + cxx * sa
    bby = by * ca + axy * adotb * omc + cyy * sa
    bbz = bz * ca + axz * adotb * omc + czz * sa
    bent = amag > 0.0
    bbx = jnp.where(bent, bbx, bx)
    bby = jnp.where(bent, bby, by)
    bbz = jnp.where(bent, bbz, bz)

    # geodesic chord |n + lam b| = wp (rayprop.c:109-121)
    qb = 2.0 * (nx * bbx + ny * bby + nz * bbz)
    qc = wpm1 * wpm1 - wp * wp
    disc = jnp.sqrt(jnp.maximum(qb * qb - 4.0 * qc, 0.0))
    q = -0.5 * (qb + jnp.sign(qb) * disc)
    lam1 = qc / jnp.where(q != 0.0, q, 1.0)
    lam = jnp.where(lam1 < 0.0, q, lam1)
    if radial_when_straight:
        lam = jnp.where(bent, lam, 0.0)  # m = n: radial rescale below
    mx = nx + bbx * lam
    my = ny + bby * lam
    mz = nz + bbz * lam

    # parallel transport A and Aprev to the new position (rayprop.c:151-170)
    mrad = jnp.sqrt(mx * mx + my * my + mz * mz)
    ux, uy, uz = mx / mrad, my / mrad, mz / mrad
    c_, s_ = _transport_psi(hx, hy, hz, ux, uy, uz)
    P00n, P01n, P10n, P11n = _rot_tensor(c_, s_, A00, A01, A10, A11)
    A00n, A01n, A10n, A11n = _rot_tensor(c_, s_, N00, N01, N10, N11)

    sc = wp / mrad
    out = [mx * sc, my * sc, mz * sc, bbx, bby, bbz,
           A00n, A01n, A10n, A11n, P00n, P01n, P10n, P11n,
           al0, al1, U00, U01, U10, U11, pot]
    return jnp.stack(out, axis=0)


def zero_plane_rows(packed):
    """Reset per-plane alpha/U/phi rows (raytrace.c:213-230)."""
    return packed.at[14:21].set(0.0)


def prop_only_chunk(chunk, wp, wpm1, wpm2, born: bool,
                    radial_when_straight: bool = False):
    """Propagation with this plane's fields already in the rows (used for
    particle-free planes and the CMB propagation step)."""
    r = chunk
    return _prop_rows(r, r[14], r[15], r[16], r[17], r[18], r[19], r[20],
                      wp, wpm1, wpm2, born,
                      radial_when_straight=radial_when_straight)


def chunked(fn, packed, chunk_size):
    """Apply fn over column chunks of packed [21, N] (bounds the transient
    working set).  Chunks are unrolled in the graph — lax.map serializes with
    ~6x overhead on TPU, while the XLA scheduler orders inlined chunks to
    minimize peak memory on its own."""
    N = packed.shape[1]
    if N <= chunk_size or N % chunk_size:
        return fn(packed)
    outs = [fn(packed[:, i: i + chunk_size])
            for i in range(0, N, chunk_size)]
    return jnp.concatenate(outs, axis=1)


NOUT = 10


def output_rows_obs_radec(packed, ring_pix, order: int):
    """Packed [21, N] + observer RING pixel [N] -> f32[10, N] output columns
    (nx, ny, nz, A00, A01, A10, A11, alpha0, alpha1, phi) in the OBSERVER
    frame and (ra, dec) basis (rayio.c:299-347): A parallel-transported from
    the current position back to the initial pixel center, then basis-swapped
    theta-phi -> ra-dec.  Fully componentwise (sharding-preserving,
    elementwise per ray — no cross-shard communication), the device half of
    the shard-parallel ray writer (io/rayio.py:write_rays_sharded)."""
    nx, ny, nz = packed[0], packed[1], packed[2]
    inv = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    ox, oy, oz = jaxhp.pix2vec_ring_soa(ring_pix, order, packed.dtype)
    c, s = _transport_psi(nx * inv, ny * inv, nz * inv, ox, oy, oz)
    a00, a01, a10, a11 = _rot_tensor(c, s, packed[6], packed[7],
                                     packed[8], packed[9])
    # theta-phi -> ra-dec tensor basis swap (rays/frames.py:_basis_swap)
    return jnp.stack([nx, ny, nz, a11, -a10, -a01, a00,
                      packed[15], -packed[14], packed[20]])


def init_packed_fullsky(order: int, wp, npix: int, dtype=jnp.float32):
    """Device-side packed ray init for the full sky in RING pixel order
    (init_rays, raytrace_utils.c:302-349): n = wp * pixel center, beta = n_hat,
    A = Aprev = I.  Componentwise — no [N, 3] buffers, no O(npix) host work
    (host memory bandwidth is the bottleneck at order >= 12)."""
    pix = jnp.arange(npix, dtype=jnp.int32)
    v = jaxhp.pix2vec_ring(pix, order, dtype=dtype)  # transient in-graph
    z = jnp.zeros((npix,), dtype)
    one = jnp.ones((npix,), dtype)
    rows = [v[:, 0] * wp, v[:, 1] * wp, v[:, 2] * wp,
            v[:, 0], v[:, 1], v[:, 2],
            one, z, z, one, one, z, z, one,
            z, z, z, z, z, z, z]
    return jnp.stack(rows, axis=0)
