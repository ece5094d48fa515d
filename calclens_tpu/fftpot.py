"""3D FFT potential path (THREEDPOT; reference fftpoissondriver.c +
fftpoissonsolve.c).

Alternative to the spherical solvers: per lens plane pick the nearest N-body
snapshot, CIC-deposit its particles onto an NFFT^3 periodic grid, solve
  phi(k) = potfact * grfcn(k) / W_cic(k)^2 * rho(k),
    potfact = 4 pi G / a * m_p / L^3      (fftpoissonsolve.c:62)
    grfcn   = -dL^2 / (4 sum_i sin^2(k_i dL / 2))   (discrete Laplacian)
    W_cic deconvolved twice (deposit + ray interpolation), zero mode nulled
(fftpoissonsolve.c:330-380), then integrate the Cartesian first/second
derivatives of phi along each ray's radial path through the plane's shell
with central differences + trilinear sampling, projecting onto the ray's
(theta, phi) basis (fftpoissondriver.c:153-1119):
  alpha_i = -(2/c^2) dchi sum_n  dphi/dx_c  J[c,i]
  U_ij    =  (2/c^2) dchi chi sum_n d2phi/dx_c dx_d J[c,i] J[d,j]  (symmetrized)
  phi_ray =  (2/c^2) (dchi/chi) sum_n phi
Instead of the reference's slab-FFT + grid-cell-hash gather, the whole grid
lives in (sharded) device memory and the path sampling is one batched gather.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .cosmology import RHO_CRIT, CSOL

FOUR_PI_G = 5.4061952545633574e-8  # Mpc (km/s)^2 / Msun (fftpoissonsolve.h:20)


def read_snap_list(path, cosmo, length_conv=1.0):
    """ThreeDPotSnapList: one snapshot basename per line ('#' comments).
    Returns list of dicts {fname, a, chi, L, npart_total}
    (fftpoissondriver.c read_snaps)."""
    import os

    from .io import lgadget

    snaps = []
    with open(path) as fp:
        for line in fp:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fn = line + ".0" if os.path.exists(line + ".0") else line
            hd = lgadget.read_header(fn)
            snaps.append(dict(
                fname=line, a=hd["time"],
                chi=float(cosmo.comvdist(hd["time"])),
                L=hd["boxsize"] * length_conv,
                npart_total=hd["npart_total"],
            ))
    return snaps


def nearest_snap(snaps, plane_rad):
    return min(range(len(snaps)), key=lambda i: abs(snaps[i]["chi"] - plane_rad))


def choose_nfft(L, plane_rad, min_sl, max_nfft=-1):
    """Grid size from the minimum smoothing scale (fftpoissondriver.c:109-129):
    cell ~ planeRad*minSL/2, rounded to a 2^k * {1,3,5,7} size."""
    want = max(16, int(L / (plane_rad * min_sl / 2.0)))
    best, bestdiff = None, None
    k = int(np.log2(want))
    for dk in range(-2, 3):
        for pf in (1, 3, 5, 7):
            cand = int(2 ** max(k + dk, 2) * pf)
            d = abs(cand - want)
            if bestdiff is None or d < bestdiff:
                best, bestdiff = cand, d
    if max_nfft > 0:
        best = min(best, max_nfft)
    return best


@partial(jax.jit, static_argnums=(1,))
def cic_deposit_3d(pos, nfft: int, L):
    """Periodic CIC of unit-weight particles onto [nfft]^3 (counts)."""
    dL = L / nfft
    u = pos / dL - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    grid = jnp.zeros((nfft, nfft, nfft), jnp.float32)
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - f[:, 0], f[:, 0])
        ix = jnp.mod(i0[:, 0] + dx, nfft)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - f[:, 1], f[:, 1])
            iy = jnp.mod(i0[:, 1] + dy, nfft)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - f[:, 2], f[:, 2])
                iz = jnp.mod(i0[:, 2] + dz, nfft)
                grid = grid.at[ix, iy, iz].add((wx * wy * wz).astype(jnp.float32))
    return grid


def _poisson_kern(kx, ky, kz, dL, potfact):
    """Discrete Green function x double CIC deconvolution at physical wave
    vectors (broadcastable [n,1,1]/[1,m,1]/[1,1,k]); zero mode zeroed
    (fftpoissonsolve.c:300-417)."""
    def s2(k):
        return jnp.sin(k * dL / 2.0) ** 2

    s = s2(kx) + s2(ky) + s2(kz)
    grfcn = -dL * dL / 4.0 / jnp.where(s > 0, s, 1.0)
    kny = jnp.pi / dL

    def w1(k):
        x = jnp.pi * jnp.abs(k) / (2.0 * kny)
        return jnp.where(k != 0.0, jnp.sin(x) / jnp.where(x != 0, x, 1.0), 1.0)

    w = (w1(kx) * w1(ky) * w1(kz)) ** 2
    kern = potfact * grfcn / jnp.where(w > 0, w * w, 1.0)
    return jnp.where((kx == 0) & (ky == 0) & (kz == 0), 0.0, kern)


@partial(jax.jit, static_argnums=(1,))
def potential_from_counts(counts, nfft: int, L, a, mp):
    """Counts grid -> potential grid (fftpoissonsolve.c:300-417)."""
    dL = L / nfft
    # the reference folds the unnormalized-FFTW 1/N^3 into mp/L^3
    # (fftpoissonsolve.c:62); jnp.fft.irfftn normalizes, so use mp/dL^3
    potfact = FOUR_PI_G / a * mp / (dL * dL * dL)
    rho_k = jnp.fft.rfftn(counts.astype(jnp.float32))

    kfull = 2.0 * jnp.pi * jnp.fft.fftfreq(nfft) / dL * 1.0
    khalf = 2.0 * jnp.pi * jnp.fft.rfftfreq(nfft) / dL
    kern = _poisson_kern(kfull[:, None, None], kfull[None, :, None],
                         khalf[None, None, :], dL, potfact)
    return jnp.fft.irfftn(rho_k * kern, s=(nfft, nfft, nfft)).astype(jnp.float32)


def potential_from_counts_slab(counts, nfft: int, L, a, mp, mesh):
    """Slab-decomposed distributed variant (reference DD-4, fftw3-mpi slab
    decomposition): counts sharded as x-slabs over the mesh; local
    rfft(z)+fft(y), all_to_all transpose, fft(x), kernel multiply in the
    y-sharded spectral layout, inverse retraced
    (parallel/slabfft.py)."""
    from .parallel import slabfft

    dL = L / nfft
    potfact = FOUR_PI_G / a * mp / (dL * dL * dL)
    kscale = 2.0 * jnp.pi / (nfft * dL)

    def kern_fn(fx, fy, fz):
        return _poisson_kern(fx * kscale, fy * kscale, fz * kscale,
                             dL, potfact)

    return slabfft.poisson_slab(counts.astype(jnp.float32), nfft, kern_fn,
                                mesh).astype(jnp.float32)


def compute_potential_grid(pos, L, nfft, a, omega_m, n_total):
    """Snapshot particles -> potential grid; mp from the mean density
    (fftpoissonsolve.c:61)."""
    mp = RHO_CRIT * omega_m * L ** 3 / n_total
    counts = cic_deposit_3d(jnp.asarray(pos, jnp.float32), nfft,
                            jnp.float32(L))
    return potential_from_counts(counts, nfft, jnp.float32(L),
                                 jnp.float32(a), jnp.float32(mp))


def _trilinear(grid, u):
    """Sample grid [N,N,N] at fractional index coords u [..., 3] (periodic)."""
    nfft = grid.shape[0]
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    val = 0.0
    for dx in (0, 1):
        wx = (1.0 - f[..., 0]) if dx == 0 else f[..., 0]
        ix = jnp.mod(i0[..., 0] + dx, nfft)
        for dy in (0, 1):
            wy = (1.0 - f[..., 1]) if dy == 0 else f[..., 1]
            iy = jnp.mod(i0[..., 1] + dy, nfft)
            for dz in (0, 1):
                wz = (1.0 - f[..., 2]) if dz == 0 else f[..., 2]
                iz = jnp.mod(i0[..., 2] + dz, nfft)
                val = val + grid[ix, iy, iz] * wx * wy * wz
    return val


@partial(jax.jit, static_argnums=(2, 3))
def threedpot_apply_to_rays(rays, pot, nfft: int, nint: int, L, plane_rad,
                            binL):
    """Integrate phi and its Cartesian derivatives along each ray's radial
    chord through the shell, project, and update alpha/U/phi
    (fftpoissondriver.c:400-1100)."""
    dL = L / nfft
    chimin = plane_rad - binL / 2.0
    dchi = binL / nint
    dtype = rays.n.dtype

    nhat = rays.n / jnp.linalg.norm(rays.n, axis=-1, keepdims=True)
    rad = chimin + (jnp.arange(nint, dtype=dtype) + 0.5) * dchi  # [Nint]
    pts = nhat[:, None, :] * rad[None, :, None]                  # [R, Nint, 3]
    u = jnp.mod(pts, L) / dL - 0.5

    # basis Jacobian: cartesian unit vectors on (theta_hat, phi_hat)
    theta = jnp.arccos(jnp.clip(nhat[..., 2], -1, 1))
    phi = jnp.arctan2(nhat[..., 1], nhat[..., 0])
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    # jac[c, i]: component of x_c on basis vector i (theta, phi)
    jac = jnp.stack([
        jnp.stack([cp * ct, -sp], -1),
        jnp.stack([sp * ct, cp], -1),
        jnp.stack([-st, jnp.zeros_like(st)], -1),
    ], axis=-2)                                                  # [R, 3, 2]

    def shift(g, axis, d):
        return jnp.roll(g, -d, axis=axis)

    # potential path integral
    phisum = jnp.sum(_trilinear(pot, u), axis=-1)

    fac1 = 2.0 / CSOL / CSOL * dchi
    alpha = rays.alpha
    U = rays.U
    for c in range(3):
        dg = (shift(pot, c, 1) - shift(pot, c, -1)) / (2.0 * dL)
        val = jnp.sum(_trilinear(dg, u), axis=-1)                # [R]
        alpha = alpha - fac1 * val[:, None] * jac[:, c, :]
    fac2 = 2.0 / CSOL / CSOL * dchi * plane_rad
    Uacc = jnp.zeros_like(U)
    for c in range(3):
        for d in range(c, 3):
            if c == d:
                dg = (shift(pot, c, 1) + shift(pot, c, -1) - 2.0 * pot) / (dL * dL)
            else:
                dg = (shift(shift(pot, c, 1), d, 1)
                      - shift(shift(pot, c, 1), d, -1)
                      - shift(shift(pot, c, -1), d, 1)
                      + shift(shift(pot, c, -1), d, -1)) / (4.0 * dL * dL)
            val = jnp.sum(_trilinear(dg, u), axis=-1)
            outer = jac[:, c, :, None] * jac[:, d, None, :]
            if c != d:
                outer = outer + jac[:, d, :, None] * jac[:, c, None, :]
            Uacc = Uacc + val[:, None, None] * outer
    Uacc = fac2 * Uacc
    # symmetrize the mixed partials (fftpoissondriver.c:1084-1087)
    off = 0.5 * (Uacc[:, 0, 1] + Uacc[:, 1, 0])
    Uacc = Uacc.at[:, 0, 1].set(off).at[:, 1, 0].set(off)
    return rays._replace(
        alpha=alpha,
        U=U + Uacc,
        phi=rays.phi + fac1 / plane_rad * phisum,
    )


class ThreeDPotDriver:
    """Per-plane driver with snapshot/grid caching
    (threedpot_poissondriver, fftpoissondriver.c:45-150)."""

    def __init__(self, cfg, cosmo):
        self.cfg = cfg
        self.cosmo = cosmo
        self.snaps = read_snap_list(cfg.ThreeDPotSnapList, cosmo,
                                    cfg.LengthConvFact if cfg.LengthConvFact > 0 else 1.0)
        self._cached = None  # (snap index, nfft, grid, L)

    def grid_for_plane(self, plane_rad, min_sl):
        from .io import lgadget
        import os

        i = nearest_snap(self.snaps, plane_rad)
        s = self.snaps[i]
        nfft = self.cfg.NFFT if self.cfg.NFFT > 0 else choose_nfft(
            s["L"], plane_rad, min_sl, self.cfg.MaxNFFT)
        if self._cached and self._cached[0] == i and self._cached[1] == nfft:
            return self._cached[2], self._cached[3]
        fn = s["fname"] + ".0" if os.path.exists(s["fname"] + ".0") else s["fname"]
        pos, _, hd = lgadget.read_positions(fn)
        lc = self.cfg.LengthConvFact if self.cfg.LengthConvFact > 0 else 1.0
        grid = compute_potential_grid(pos * lc, s["L"], nfft, s["a"],
                                      self.cfg.OmegaM, s["npart_total"])
        self._cached = (i, nfft, grid, s["L"])
        return grid, s["L"]

    def apply(self, rays, plane_rad, binL, min_sl=0.01):
        grid, L = self.grid_for_plane(plane_rad, min_sl)
        nfft = grid.shape[0]
        nint = max(4, int(binL / (L / nfft) * 2))
        return threedpot_apply_to_rays(
            rays, grid, nfft, nint,
            jnp.asarray(L, rays.n.dtype), jnp.asarray(plane_rad, rays.n.dtype),
            jnp.asarray(binL, rays.n.dtype))


def snapranges_main(argv=None):
    """snapranges3Dpot analog: print '#plane snapshot rmin rmax' for a config
    (reference snapranges3Dpot/main.c:41-70)."""
    import sys

    from .config import read_config
    from .cosmology import Cosmology

    argv = argv if argv is not None else sys.argv[1:]
    cfg = read_config(argv[0])
    cosmo = Cosmology(cfg.OmegaM)
    snaps = read_snap_list(cfg.ThreeDPotSnapList, cosmo,
                           cfg.LengthConvFact if cfg.LengthConvFact > 0 else 1.0)
    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    print("#plane snapshot rmin rmax")
    for p in range(cfg.NumLensPlanes):
        i = nearest_snap(snaps, p * binL + binL / 2.0)
        print(f"{p} {snaps[i]['fname']} {p * binL:.3f} {(p + 1) * binL:.3f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(snapranges_main())
