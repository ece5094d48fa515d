"""Multigrid refinement driver (reference mgpoissonsolve.c:59-297).

Non-SHTONLY mode: the spherical-harmonic solve supplies only the long-range
potential map; each active bundle cell then gets a tangent-patch FAS solve
(mg.py) whose Dirichlet boundary values and initial guess are interpolated
from that map, and the rays take their deflection/shear from finite
differences of the patch potential — the short-range force at resolution far
beyond lmax.

Batched TPU formulation: all C active patches solve together as [C, N, N];
particle deposit scatters each particle into its cell's patch and the 8
neighboring cells' patches (patches overlap, MGPATCH_SIZE_FAC = 4 cell
widths); derivative extraction rotates the patch-basis gradient/Hessian back
to the global (theta, phi) basis with exact 3-vector algebra
(fill_uderivs_rays / rot_tangvectens analog, mgpoissonsolve.c:782-1346).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import mg
from .healpix import core as hp
from .healpix import jaxhp


def cell_rotations(bundle_order):
    """R[c] rotating cell c's center to (theta=pi/2, phi=0):
    R = Ry(pi/2 - theta_c) @ Rz(-phi_c).  Host, [C, 3, 3]."""
    npix = int(hp.order2npix(bundle_order))
    nest = np.arange(npix)
    theta, phi = hp.pix2ang_nest(nest, bundle_order)
    ca, sa = np.cos(-phi), np.sin(-phi)
    Rz = np.zeros((npix, 3, 3))
    Rz[:, 0, 0] = ca
    Rz[:, 0, 1] = -sa
    Rz[:, 1, 0] = sa
    Rz[:, 1, 1] = ca
    Rz[:, 2, 2] = 1.0
    b = np.pi / 2 - theta
    cb, sb = np.cos(b), np.sin(b)
    Ry = np.zeros((npix, 3, 3))
    Ry[:, 0, 0] = cb
    Ry[:, 0, 2] = sb
    Ry[:, 1, 1] = 1.0
    Ry[:, 2, 0] = -sb
    Ry[:, 2, 2] = cb
    return np.einsum("cij,cjk->cik", Ry, Rz)


class MGSetup:
    """Static per-run tables for the batched patch solve."""

    def __init__(self, bundle_order, patch_n, ray_order=None, dtype=jnp.float32):
        self.bundle_order = bundle_order
        self.ray_order = ray_order
        self.C = int(hp.order2npix(bundle_order))
        cell_size = np.sqrt(4.0 * np.pi / self.C)
        self.Lpatch = float(mg.MGPATCH_SIZE_FAC * cell_size)
        self.levels = tuple(mg.build_levels(self.Lpatch, patch_n))
        self.dtype = dtype
        self.R = cell_rotations(bundle_order)              # [C, 3, 3]
        # row-major flattened rows [9, C]: per-ray/particle rotations gather
        # 9 componentwise [*] lanes instead of an [*, 3, 3] AoS buffer —
        # gathers MATERIALIZE on TPU, and small trailing dims pad (8, 128):
        # the [Nr, 3, 3] form allocated 38 GB at rayOrder 11 (measured OOM)
        self.R9 = np.ascontiguousarray(
            self.R.reshape(self.C, 9).T)                   # [9, C]
        self.neighbors = np.concatenate(
            [np.arange(self.C)[:, None],
             hp.neighbors_nest(np.arange(self.C), bundle_order)], axis=1)
        self.neighbors = np.where(self.neighbors < 0,
                                  self.neighbors[:, :1], self.neighbors)
        # static sigma bucket centers for the spline patch deposit (set by
        # the driver when DepositScheme is SPH)
        self.sph_sigmas = None

    def patch_coords(self, R_rows, vec):
        """Rotate unit vectors into each listed patch frame -> fractional
        grid indices (ti, pj) and validity mask."""
        lev = self.levels[0]
        v = jnp.einsum("...ij,...j->...i", R_rows, vec)
        theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(v[..., 1], v[..., 0])
        ti = (theta - lev.thetaLoc) / lev.dL
        pj = (phi - lev.phiLoc) / lev.dL
        ok = (ti >= 0) & (ti < lev.N - 1) & (pj >= 0) & (pj < lev.N - 1)
        return ti, pj, ok

    def patch_coords_soa(self, r9, v0, v1, v2):
        """Componentwise patch_coords: r9 = 9 row-major rotation components
        (each broadcastable against v0/v1/v2).  Returns (ti, pj, ok) plus
        the rotated components (w0, w1, w2) for reuse."""
        lev = self.levels[0]
        w0 = r9[0] * v0 + r9[1] * v1 + r9[2] * v2
        w1 = r9[3] * v0 + r9[4] * v1 + r9[5] * v2
        w2 = r9[6] * v0 + r9[7] * v1 + r9[8] * v2
        theta = jnp.arccos(jnp.clip(w2, -1.0, 1.0))
        phi = jnp.arctan2(w1, w0)
        ti = (theta - lev.thetaLoc) / lev.dL
        pj = (phi - lev.phiLoc) / lev.dL
        ok = (ti >= 0) & (ti < lev.N - 1) & (pj >= 0) & (pj < lev.N - 1)
        return ti, pj, ok, (w0, w1, w2)


def _cic_patch_mass(setup: MGSetup, pos, w):
    """CIC scatter of per-particle weights w [Np] into every particle's own
    and neighboring patches -> mass grid [C, N, N]."""
    lev = setup.levels[0]
    N = lev.N
    theta, phi = jaxhp.vec2ang(pos)
    # cell via device RING ang2pix + a small [12*4^bo] ring->nest table
    ring = jaxhp.ang2pix_ring(theta, phi, setup.bundle_order)
    r2n = jnp.asarray(hp.ring2nest(np.arange(setup.C), setup.bundle_order),
                      jnp.int32)
    cell = r2n[ring]
    cand = jnp.asarray(setup.neighbors, jnp.int32)[cell]      # [Np, 9]
    R9 = jnp.asarray(setup.R9, pos.dtype)
    r9 = [R9[k][cand] for k in range(9)]                      # 9 x [Np, 9]
    nhat = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    ti, pj, ok, _ = setup.patch_coords_soa(
        r9, nhat[:, 0:1], nhat[:, 1:2], nhat[:, 2:3])
    i0 = jnp.clip(jnp.floor(ti).astype(jnp.int32), 0, N - 2)
    j0 = jnp.clip(jnp.floor(pj).astype(jnp.int32), 0, N - 2)
    fx = jnp.clip(ti - i0, 0.0, 1.0)
    fy = jnp.clip(pj - j0, 0.0, 1.0)
    wk = jnp.where(ok, w[:, None], 0.0)
    grid = jnp.zeros((setup.C, N, N), pos.dtype)
    for di in (0, 1):
        wi = (1.0 - fx) if di == 0 else fx
        for dj in (0, 1):
            wj = (1.0 - fy) if dj == 0 else fy
            grid = grid.at[cand, i0 + di, j0 + dj].add(wk * wi * wj)
    return grid


@partial(jax.jit, static_argnums=(0,))
def deposit_patches(setup: MGSetup, pos, mass, densfact, backdens):
    """CIC deposit of every particle into its own and neighboring patches,
    scaled to the kappa source term (fill_rho_mggrid:246-255):
      rho[i,j] = mass_in_cell / (dL * cosfacs_i) * densfact - backdens
    """
    lev = setup.levels[0]
    grid = _cic_patch_mass(setup, pos, mass)
    cosf = jnp.asarray(np.asarray(lev.cosfacs), pos.dtype)[None, :, None]
    return grid / (lev.dL * cosf) * densfact - backdens


def _kernel_stamp(sigma, dL, dtype):
    """Normalized Epanechnikov stamp [K, K] on the patch grid (equatorial
    metric: the patch is rotated so its center sits on the equator, so
    sin(theta) deviates from 1 only by O((L/2)^2) at the edges)."""
    half = max(int(np.ceil(sigma / dL)), 1)
    d = np.arange(-half, half + 1) * dL
    g2 = d[:, None] ** 2 + d[None, :] ** 2
    w = np.maximum(1.0 - g2 / sigma**2, 0.0)
    return jnp.asarray(w / w.sum(), dtype)


@partial(jax.jit, static_argnums=(0, 6))
def deposit_patches_sph(setup: MGSetup, pos, mass, sl, densfact, backdens,
                        sigmas):
    """Spline-kernel patch deposit (fill_rho_mggrid, mgpoissonsolve.c:299-597):
    each particle's mass is spread with the normalized Epanechnikov kernel of
    its smoothing length.  TPU form: the particle set is split between the
    two bracketing sigma buckets (as in ops.deposit.deposit_sph_bucketed),
    each bucket's CIC mass grid is convolved with the bucket's normalized
    kernel stamp — mass is conserved per particle exactly as the reference's
    discrete per-particle normalization does, with the kernel shape quantized
    to the bucket grid (first-order interpolated) instead of per-particle."""
    lev = setup.levels[0]
    B = len(sigmas)
    logsig = jnp.log(jnp.asarray(sigmas, sl.dtype))
    hi = jnp.clip(jnp.searchsorted(logsig, jnp.log(sl)), 1, B - 1)
    lo = hi - 1
    t = jnp.clip((jnp.log(sl) - logsig[lo]) / (logsig[hi] - logsig[lo]),
                 0.0, 1.0)
    grid = 0.0
    for b, sig in enumerate(sigmas):
        wb = mass * jnp.where(lo == b, 1.0 - t, 0.0) + \
            mass * jnp.where(hi == b, t, 0.0)
        gb = _cic_patch_mass(setup, pos, wb)
        stamp = _kernel_stamp(float(sig), lev.dL, pos.dtype)
        grid = grid + jax.lax.conv_general_dilated(
            gb[:, None], stamp[None, None], (1, 1), "SAME")[:, 0]
    cosf = jnp.asarray(np.asarray(lev.cosfacs), pos.dtype)[None, :, None]
    return grid / (lev.dL * cosf) * densfact - backdens


@partial(jax.jit, static_argnums=(0, 1))
def patch_centers_global(setup: MGSetup, li: int):
    """Global unit vectors of every patch cell center [C, N, N, 3]."""
    vx, vy, vz = _patch_centers_soa(setup, li)
    return jnp.stack([vx, vy, vz], axis=-1)


def _patch_centers_soa(setup: MGSetup, li: int):
    """Componentwise patch cell centers (vx, vy, vz), each [C, N, N] — no
    small trailing dim (the [C, N, N, 3] form pads 3 -> 128 lanes)."""
    lev = setup.levels[li]
    i = jnp.arange(lev.N)
    th = i * lev.dL + lev.thetaLoc
    ph = i * lev.dL + lev.phiLoc
    sth, cth = jnp.sin(th), jnp.cos(th)
    sph, cph = jnp.sin(ph), jnp.cos(ph)
    px = jnp.outer(sth, cph)
    py = jnp.outer(sth, sph)
    pz = jnp.broadcast_to(cth[:, None], (lev.N, lev.N))
    R = jnp.asarray(setup.R)                                  # [C, 3, 3]
    # global = R^T v_patch, componentwise over the 9 rotation entries
    def comp(col):
        return (R[:, 0, col][:, None, None] * px
                + R[:, 1, col][:, None, None] * py
                + R[:, 2, col][:, None, None] * pz)
    return comp(0), comp(1), comp(2)


@partial(jax.jit, static_argnums=(0, 1))
def fill_u_from_map(setup: MGSetup, tab, potmap):
    """Initial guess + Dirichlet BCs: interpolate the SHT potential map at
    every patch cell center (fill_u_mggrid / fill_bcs_mggrid).

    SoA taps: the [C, N, N, 4] potmap[pix] gather of the AoS form
    MATERIALIZES with its trailing dim padded 4 -> 128 on TPU (103 GB at
    bundleOrder 6) — four [C, N, N] gathers instead."""
    vx, vy, vz = _patch_centers_soa(setup, 0)
    theta = jnp.arccos(jnp.clip(vz, -1.0, 1.0))
    phi = jnp.arctan2(vy, vx)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    pix4, wgt4 = jaxhp.get_interpol_soa(tab, theta, phi)
    u = 0.0
    for k in range(4):
        u = u + potmap[pix4[k]] * wgt4[k]
    return u.astype(potmap.dtype)


def solve_patches(setup: MGSetup, u0, rho, conv_fact=-1.0, max_cycles=20):
    """Batched patch solve; conv_fact > 0 enables the reference's
    truncation-error-relative stopping rule (MGConvFact, README.md:215-221,
    default 0.1), else a fixed 10-cycle solve."""
    if isinstance(conv_fact, float) and conv_fact <= 0:
        return mg.solve_fas(u0, rho, setup.levels, 10, 2, 2)
    return mg.solve_fas_adaptive(u0, rho, setup.levels, conv_fact,
                                 max_cycles, 2, 2)


@partial(jax.jit, static_argnums=(0,))
def interp_derivs_to_rays(setup: MGSetup, u, ray_vec, cell):
    """Finite-difference derivatives of the patch potential at the rays,
    rotated to the global (theta, phi) basis.  cell is the ray's NEST bundle
    cell.  Returns (pot, grad [.,2], hess [.,2,2]) with the same conventions
    as the SHT interpolation (alpha -= grad, U += hess)."""
    lev = setup.levels[0]
    N = lev.N
    dL = lev.dL
    # componentwise rotation rows (9 x [Nr] gathers): the [Nr, 3, 3] AoS
    # gather materialized with (8, 128) trailing-dim padding — 38 GB at
    # rayOrder 11 on TPU
    R9 = jnp.asarray(setup.R9, ray_vec.dtype)
    r9 = [R9[k][cell] for k in range(9)]
    inv = 1.0 / jnp.linalg.norm(ray_vec, axis=-1)
    n0 = ray_vec[:, 0] * inv
    n1 = ray_vec[:, 1] * inv
    n2 = ray_vec[:, 2] * inv
    ti, pj, ok, (v0, v1, v2) = setup.patch_coords_soa(r9, n0, n1, n2)

    i0 = jnp.clip(jnp.floor(ti).astype(jnp.int32), 1, N - 3)
    j0 = jnp.clip(jnp.floor(pj).astype(jnp.int32), 1, N - 3)
    fx = ti - i0
    fy = pj - j0

    sc = jnp.asarray(np.asarray(lev.sin_c), ray_vec.dtype)

    def sample(f):
        # bilinear of field f: [C,N,N] at (cell, i0+fx, j0+fy)
        def at(di, dj):
            return f[cell, i0 + di, j0 + dj]
        return ((1 - fx) * (1 - fy) * at(0, 0) + fx * (1 - fy) * at(1, 0)
                + (1 - fx) * fy * at(0, 1) + fx * fy * at(1, 1))

    # central differences on the patch (getderiv_mggrid_*)
    up = jnp.roll(u, 1, axis=-2)
    dn = jnp.roll(u, -1, axis=-2)
    lf = jnp.roll(u, 1, axis=-1)
    rt = jnp.roll(u, -1, axis=-1)
    gt_f = (dn - up) / (2 * dL)                       # d/dtheta
    gp_f = (rt - lf) / (2 * dL) / sc[None, :, None]   # (1/sin) d/dphi
    gtt_f = (up + dn - 2 * u) / (dL * dL)
    gpp_raw = (lf + rt - 2 * u) / (dL * dL) / (sc ** 2)[None, :, None]
    gtp_raw = (jnp.roll(rt, -1, axis=-2) - jnp.roll(lf, -1, axis=-2)
               - jnp.roll(rt, 1, axis=-2) + jnp.roll(lf, 1, axis=-2)
               ) / (4 * dL * dL) / sc[None, :, None]
    cotv = jnp.asarray(np.cos(np.arange(N) * lev.dL + lev.thetaLoc)
                       / np.sin(np.arange(N) * lev.dL + lev.thetaLoc), u.dtype)
    # covariant components (same corrections as alm2allmaps outputs)
    gtp_f = gtp_raw - cotv[None, :, None] * gp_f
    gpp_f = gpp_raw + cotv[None, :, None] * gt_f

    pot = sample(u)
    gt = sample(gt_f)
    gp = sample(gp_f)
    gtt = sample(gtt_f)
    gtp = sample(gtp_f)
    gpp = sample(gpp_f)

    # patch-frame basis vectors at the ray, expressed globally — all
    # componentwise ([Nr] lanes; the rotated components v0..v2 come from
    # patch_coords_soa)
    tp0, tp1, tp2, pp0, pp1 = _tangent_basis_soa(v0, v1, v2)
    # global = R^T patch-frame (transpose = column-major rows of R9)
    tg_0 = r9[0] * tp0 + r9[3] * tp1 + r9[6] * tp2
    tg_1 = r9[1] * tp0 + r9[4] * tp1 + r9[7] * tp2
    tg_2 = r9[2] * tp0 + r9[5] * tp1 + r9[8] * tp2
    pg_0 = r9[0] * pp0 + r9[3] * pp1
    pg_1 = r9[1] * pp0 + r9[4] * pp1
    pg_2 = r9[2] * pp0 + r9[5] * pp1
    t0, t1, t2, p0, p1 = _tangent_basis_soa(n0, n1, n2)
    # B[a,b] = global basis a . rotated patch basis b
    B00 = t0 * tg_0 + t1 * tg_1 + t2 * tg_2
    B01 = t0 * pg_0 + t1 * pg_1 + t2 * pg_2
    B10 = p0 * tg_0 + p1 * tg_1
    B11 = p0 * pg_0 + p1 * pg_1

    g0 = B00 * gt + B01 * gp
    g1 = B10 * gt + B11 * gp
    grad = jnp.stack([g0, g1], axis=-1)

    H = jnp.stack([jnp.stack([gtt, gtp], -1),
                   jnp.stack([gtp, gpp], -1)], -2)
    B = jnp.stack([jnp.stack([B00, B01], -1),
                   jnp.stack([B10, B11], -1)], -2)
    hess = B @ H @ jnp.swapaxes(B, -1, -2)
    okf = ok.astype(u.dtype)
    return (pot * okf, grad * okf[:, None], hess * okf[:, None, None])


def _tangent_basis_soa(n0, n1, n2):
    """Componentwise _tangent_basis: returns (that_x, that_y, that_z,
    phat_x, phat_y); phat_z is identically 0."""
    npv = jnp.maximum(jnp.sqrt(n0 * n0 + n1 * n1), 1e-30)
    inv = 1.0 / npv
    return (n2 * n0 * inv, n2 * n1 * inv, -(n0 * n0 + n1 * n1) * inv,
            -n1 * inv, n0 * inv)


def _tangent_basis(nhat):
    npv = jnp.sqrt(nhat[..., 0] ** 2 + nhat[..., 1] ** 2)
    npv = jnp.maximum(npv, 1e-30)
    phat = jnp.stack([-nhat[..., 1] / npv, nhat[..., 0] / npv,
                      jnp.zeros_like(npv)], -1)
    that = jnp.stack([nhat[..., 2] * nhat[..., 0] / npv,
                      nhat[..., 2] * nhat[..., 1] / npv,
                      -(nhat[..., 0] ** 2 + nhat[..., 1] ** 2) / npv], -1)
    return that, phat


def _deposit_patches_sharded(setup: MGSetup, spec, pos, mass, densfact,
                             backdens, sl=None, sigmas=None):
    """Mesh deposit: each device scatters ONLY its particle shard into a
    full-C partial grid, one psum_scatter reduces it straight onto the patch
    owners ([C/n, N, N] per device) and the per-patch finish (kernel conv,
    scale) runs on the shards.  This is the reference's particle exchange
    (mgpoissonsolve.c:59-123) as a single collective: n-fold less scatter
    compute AND no replicated [C, N, N] all-reduce — GSPMD alone chooses to
    all-gather the particles instead (measured), which is wrong at
    production particle counts."""
    from jax.sharding import PartitionSpec as P
    from .parallel.sharding import AXIS

    lev = setup.levels[0]
    mesh = spec.mesh
    cosf_np = np.asarray(lev.cosfacs)

    if sl is None:
        def body(pos_l, mass_l, df, bd):
            g = _cic_patch_mass(setup, pos_l, mass_l)
            g = jax.lax.psum_scatter(g, AXIS, scatter_dimension=0, tiled=True)
            cosf = jnp.asarray(cosf_np, pos_l.dtype)[None, :, None]
            return g / (lev.dL * cosf) * df - bd

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P()),
            out_specs=P(AXIS))(pos, mass, densfact, backdens)

    B = len(sigmas)
    logsig_np = np.log(np.asarray(sigmas, np.float64))

    def body_sph(pos_l, mass_l, sl_l, df, bd):
        logsig = jnp.asarray(logsig_np, sl_l.dtype)
        hi = jnp.clip(jnp.searchsorted(logsig, jnp.log(sl_l)), 1, B - 1)
        lo = hi - 1
        t = jnp.clip((jnp.log(sl_l) - logsig[lo])
                     / (logsig[hi] - logsig[lo]), 0.0, 1.0)
        grid = 0.0
        for b, sig in enumerate(sigmas):
            wb = mass_l * jnp.where(lo == b, 1.0 - t, 0.0) + \
                mass_l * jnp.where(hi == b, t, 0.0)
            gb = _cic_patch_mass(setup, pos_l, wb)
            gb = jax.lax.psum_scatter(gb, AXIS, scatter_dimension=0,
                                      tiled=True)
            stamp = _kernel_stamp(float(sig), lev.dL, pos_l.dtype)
            grid = grid + jax.lax.conv_general_dilated(
                gb[:, None], stamp[None, None], (1, 1), "SAME")[:, 0]
        cosf = jnp.asarray(cosf_np, pos_l.dtype)[None, :, None]
        return grid / (lev.dL * cosf) * df - bd

    return jax.shard_map(
        body_sph, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=P(AXIS))(pos, mass, sl, densfact, backdens)


def _cst_patch(spec, x, replicate=False):
    """Constrain the leading patch-batch axis [C, ...] to the mesh axis
    (no-op off-mesh or when C doesn't tile).  This is the TPU form of the
    reference's per-task bundle-cell ownership (mgpoissonsolve.c:59-123):
    each device deposits its particle shard into a full-C partial grid, the
    constraint turns the combine into a reduce-scatter, and every FAS cycle
    then runs on C/n patches per device with no communication (patches are
    independent given their BCs).  replicate=True marks the one exchange the
    reference also pays — the solved patch potentials travel to the rays
    that need them (a [C, N, N] all-gather: a few MB, vs the reference's
    per-ray buffer exchange, mgpoissonsolve.c:1150-1346)."""
    if spec is None or x.shape[0] % spec.mesh.devices.size != 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.sharding import AXIS

    sp = P() if replicate else P(AXIS, *((None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(spec.mesh, sp))


def mg_refine(setup: MGSetup, tab, rays, ray_nest, ray_order, potmap,
              pos, mass, densfact, backdens, conv_fact=-1.0, sl=None,
              spec=None):
    """Full refinement: deposit, BC fill, batched FAS solve, ray update.

    potmap: RING-ordered SHT potential map (long range / boundary data).
    Sets phi and ADDS alpha/U from the patch solution (the rays enter with
    zeroed per-plane fields in non-SHTONLY mode).  sl (per-particle angular
    smoothing lengths) switches the patch deposit to the spline kernel
    (fill_rho_mggrid analog); conv_fact > 0 enables MGConvFact stopping.

    spec (a parallel.sharding.ShardingPlan) shards the patch batch over the
    mesh: deposit reduce-scatters into C-sharded rho, the BC fill and every
    FAS cycle run C/n patches per device, and only the solved [C, N, N]
    potential is all-gathered for the ray-side interpolation (see
    _cst_patch).  The long-range potmap stays replicated — in non-SHTONLY
    mode the SHT order is low (MG supplies the small scales), so the map is
    small by design (poissondrivers.c:64-75)."""
    sharded = (spec is not None
               and setup.C % spec.mesh.devices.size == 0
               and pos.shape[0] % spec.mesh.devices.size == 0)
    if sharded:
        rho = _deposit_patches_sharded(setup, spec, pos, mass, densfact,
                                       backdens, sl=sl,
                                       sigmas=setup.sph_sigmas)
    elif sl is not None:
        rho = deposit_patches_sph(setup, pos, mass, sl, densfact, backdens,
                                  setup.sph_sigmas)
    else:
        rho = deposit_patches(setup, pos, mass, densfact, backdens)
    rho = _cst_patch(spec, rho)
    u0 = _cst_patch(spec, fill_u_from_map(setup, tab, potmap))
    u = solve_patches(setup, u0, rho, conv_fact)
    u = _cst_patch(spec, u, replicate=True)
    shift = 2 * (ray_order - setup.bundle_order)
    cell_nest = (jnp.asarray(ray_nest) >> shift).astype(jnp.int32)
    pot, grad, hess = interp_derivs_to_rays(setup, u, rays.n, cell_nest)
    return rays._replace(
        phi=pot.astype(rays.phi.dtype),
        alpha=rays.alpha - grad.astype(rays.alpha.dtype),
        U=rays.U + hess.astype(rays.U.dtype),
    )
