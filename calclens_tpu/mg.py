"""Batched tangent-patch FAS multigrid refinement (reference
mgpoissonsolve.c / mgpoissonsolve_utils.c).

Every active bundle cell gets a theta-phi patch rotated so its center sits on
the equator; because the patch geometry then depends only on the patch SIZE,
every per-row metric vector (the finite-volume sin factors, cell solid
angles, diagonal) is SHARED across cells — the whole solve batches as
[C, N, N] arrays with one V-cycle program for all patches at once, instead of
the reference's per-cell serial solves with per-cell cost timing feeding the
domain decomposition.

Discretization (finite volume on the spherical patch, mgpoissonsolve_utils.c
alloc_mggrid + smooth_mggrid):
  L(u)[i,j] = [ s_{i-1/2} u[i-1,j] + s_{i+1/2} u[i+1,j]
              + (u[i,j-1] + u[i,j+1]) / s_i  - diag_i u[i,j] ] / (h^2 s_i)
  diag_i = s_{i-1/2} + s_{i+1/2} + 2 / s_i,   s = sin(theta)
with Dirichlet ghost ring carrying boundary values interpolated from the
spherical-harmonic potential map (fill_bcs_mggrid).  Smoother: column-parity
red-black Gauss-Seidel (REDBLACK branch); cycles: FAS V-cycles with fixed
counts (the reference iterates to a truncation-error criterion; fixed counts
keep the program static for XLA).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

MGPATCH_SIZE_FAC = 4.0       # reference raytrace.h:125
NUM_MGPATCH_MIN = 256        # reference raytrace.h:126


def patch_interior_sizes(n_fine):
    """Level interior sizes n, n/2, ... while even, ending in {4,5,7,9}-ish
    (reference level choice from {4,5,7,9}*2^k, mgpoissonsolve.c:151-174)."""
    sizes = [n_fine]
    n = n_fine
    while n % 2 == 0 and n // 2 >= 4:
        n //= 2
        sizes.append(n)
    return sizes


def choose_patch_n(L, min_sl, n_min=NUM_MGPATCH_MIN, n_max=1024):
    """Fine-grid size ~ patch length / (min smoothing / 2), rounded to a
    power-of-two-times-{4,5,7,9} (raytrace.c:485-498)."""
    want = max(n_min, int(L / (min_sl / 2.0)))
    best, bestd = None, None
    for base in (4, 5, 7, 9):
        k = int(np.ceil(np.log2(max(1.0, want / base))))
        for dk in (-1, 0, 1):
            n = base * 2 ** max(k + dk, 0)
            d = abs(n - want)
            if (bestd is None or d < bestd) and n <= n_max:
                best, bestd = n, d
    return best


@dataclass(frozen=True)
class PatchLevel:
    """Geometry of one level: interior n, total N = n+2 (ghost ring)."""

    n: int
    N: int
    dL: float
    thetaLoc: float
    phiLoc: float
    sin_half: tuple    # s_{i-1/2} [N+1 values at half points: 2N+1? store N+1]
    sin_c: tuple       # s_i at centers [N]
    cosfacs: tuple     # cell delta-cos (solid angle / dL) [N]
    diag: tuple        # [N]


def build_levels(L, n_fine):
    """Geometry for every level of a patch of angular size L (radians)."""
    levels = []
    for n in patch_interior_sizes(n_fine):
        N = n + 2
        dL = L / n
        Lg = L + 2 * dL
        thetaLoc = np.pi / 2 - Lg / 2 + dL / 2
        phiLoc = -Lg / 2 + dL / 2
        i = np.arange(N)
        th = i * dL + thetaLoc
        sin_c = np.sin(th)
        sin_m = np.sin(th - dL / 2)          # s_{i-1/2}
        sin_p = np.sin(th + dL / 2)          # s_{i+1/2}
        cosfacs = np.cos(th - dL / 2) - np.cos(th + dL / 2)
        diag = sin_m + sin_p + 2.0 / sin_c
        levels.append(PatchLevel(
            n=n, N=N, dL=float(dL), thetaLoc=float(thetaLoc),
            phiLoc=float(phiLoc),
            sin_half=tuple(np.stack([sin_m, sin_p]).ravel()),
            sin_c=tuple(sin_c), cosfacs=tuple(cosfacs), diag=tuple(diag)))
    return levels


def _vecs(lev, dtype):
    sh = np.asarray(lev.sin_half).reshape(2, lev.N)
    return (jnp.asarray(sh[0], dtype)[:, None], jnp.asarray(sh[1], dtype)[:, None],
            jnp.asarray(np.asarray(lev.sin_c), dtype)[:, None],
            jnp.asarray(np.asarray(lev.diag), dtype)[:, None])


def lop(u, lev):
    """Apply the FV spherical Laplacian to interior cells; ghost ring -> 0."""
    sm, sp, sc, diag = _vecs(lev, u.dtype)
    h2 = lev.dL * lev.dL
    num = (sm * jnp.roll(u, 1, axis=-2) + sp * jnp.roll(u, -1, axis=-2)
           + (jnp.roll(u, 1, axis=-1) + jnp.roll(u, -1, axis=-1)) / sc
           - diag * u)
    out = num / (h2 * sc)
    return out * _interior_mask(lev, u.dtype)


def _interior_mask(lev, dtype):
    N = lev.N
    i = np.arange(N)
    m = ((i > 0) & (i < N - 1))
    return jnp.asarray(np.outer(m, m), dtype)


def rbgs(u, rhs, lev, nsweeps: int):
    """Column-parity red-black Gauss-Seidel (REDBLACK smoother)."""
    sm, sp, sc, diag = _vecs(lev, u.dtype)
    h2 = lev.dL * lev.dL
    N = lev.N
    i = np.arange(N)
    interior = np.outer((i > 0) & (i < N - 1), (i > 0) & (i < N - 1))
    parity = (i[:, None] + i[None, :]) % 2 == 0
    red = jnp.asarray(interior & parity, u.dtype)
    black = jnp.asarray(interior & ~parity, u.dtype)

    def gs(u, color):
        new = (sm * jnp.roll(u, 1, axis=-2) + sp * jnp.roll(u, -1, axis=-2)
               + (jnp.roll(u, 1, axis=-1) + jnp.roll(u, -1, axis=-1)) / sc
               - (h2 * sc) * rhs) / diag
        return u + color * (new - u)

    def sweep(k, u):
        return gs(gs(u, red), black)

    return jax.lax.fori_loop(0, nsweeps, sweep, u)


def restrict_full(x):
    """Cell-centered 2x2 average of the interior; ghost ring of the coarse
    grid copies the nearest fine ghost values."""
    inner = x[..., 1:-1, 1:-1]
    c = 0.25 * (inner[..., 0::2, 0::2] + inner[..., 1::2, 0::2]
                + inner[..., 0::2, 1::2] + inner[..., 1::2, 1::2])
    Nc = c.shape[-1] + 2
    out = jnp.zeros(x.shape[:-2] + (Nc, Nc), x.dtype)
    out = out.at[..., 1:-1, 1:-1].set(c)
    # coarse ghost from fine ghost (2:1 average along the edge)
    def edge(sl):
        return 0.5 * (sl[..., 0::2] + sl[..., 1::2])

    out = out.at[..., 0, 1:-1].set(edge(x[..., 0, 1:-1]))
    out = out.at[..., -1, 1:-1].set(edge(x[..., -1, 1:-1]))
    out = out.at[..., 1:-1, 0].set(edge(x[..., 1:-1, 0]))
    out = out.at[..., 1:-1, -1].set(edge(x[..., 1:-1, -1]))
    return out


def prolong_add(u_f, corr_c):
    """Bilinear prolongation of the coarse correction added to the fine grid
    (interior only; corrections vanish at the Dirichlet boundary)."""
    c = corr_c[..., 1:-1, 1:-1]
    C = c.shape[:-2]
    nc = c.shape[-1]
    # pad with zeros (correction -> 0 at the boundary)
    cp = jnp.pad(c, [(0, 0)] * len(C) + [(1, 1), (1, 1)])
    # fine cell (2i+a, 2j+b), a,b in {0,1}: weights 9/16, 3/16, 3/16, 1/16
    w1, w3, w9 = 1.0 / 16, 3.0 / 16, 9.0 / 16

    def shift(dx, dy):
        return cp[..., 1 + dx: 1 + dx + nc, 1 + dy: 1 + dy + nc]

    base = shift(0, 0)
    fine = jnp.zeros(C + (2 * nc, 2 * nc), u_f.dtype)
    for a, sx in ((0, -1), (1, 1)):
        for b, sy in ((0, -1), (1, 1)):
            val = (w9 * base + w3 * shift(sx, 0) + w3 * shift(0, sy)
                   + w1 * shift(sx, sy))
            fine = fine.at[..., a::2, b::2].set(val)
    return u_f.at[..., 1:-1, 1:-1].add(fine)


def vcycle(u, rhs, levels, li: int, npre: int, npost: int):
    """One FAS V-cycle starting at level index li (0 = finest)."""
    lev = levels[li]
    u = rbgs(u, rhs, lev, npre)
    if li + 1 < len(levels):
        levc = levels[li + 1]
        uc0 = restrict_full(u)
        resid = (rhs - lop(u, lev)) * _interior_mask(lev, u.dtype)
        rhs_c = lop(uc0, levc) + restrict_full(resid)
        uc = vcycle(uc0, rhs_c, levels, li + 1, npre, npost)
        u = prolong_add(u, uc - uc0)
    else:
        u = rbgs(u, rhs, lev, 32)
    return rbgs(u, rhs, lev, npost)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def solve_fas(u0, rhs, levels: tuple, ncycles: int = 8, npre: int = 2,
              npost: int = 2):
    """Batched FAS solve: u0, rhs [C, N, N] with Dirichlet values in u0's
    ghost ring.  Returns u with the same ghost ring."""
    def cyc(k, u):
        return vcycle(u, rhs, levels, 0, npre, npost)

    return jax.lax.fori_loop(0, ncycles, cyc, u0)


def _truncation_norm(u, rhs, levels):
    """FAS truncation-error estimate tau = L_c(R u) - R(L_f u) per patch
    (the reference's relative convergence reference, mgpoissonsolve_utils.c
    solve_fas_mggrid): returns its L1 norm over each patch [C]."""
    lev, levc = levels[0], levels[1]
    tau = lop(restrict_full(u), levc) - restrict_full(
        lop(u, lev) * _interior_mask(lev, u.dtype))
    return jnp.sum(jnp.abs(tau), axis=(-2, -1))


@partial(jax.jit, static_argnums=(2, 4, 5, 6))
def solve_fas_adaptive(u0, rhs, levels: tuple, conv_fact,
                       max_cycles: int = 20, npre: int = 2, npost: int = 2):
    """FAS solve with the reference's truncation-error-relative stopping
    rule (MGConvFact, mgpoissonsolve_utils.c:44-192): V-cycle until every
    patch's residual L1 norm is below conv_fact times its truncation-error
    estimate, capped at max_cycles.  lax.while_loop keeps shapes static
    while the trip count adapts.  Falls back to plain cycling when the
    hierarchy has a single level."""
    if len(levels) < 2:
        return solve_fas(u0, rhs, levels, max_cycles, npre, npost)
    lev = levels[0]
    mask = _interior_mask(lev, u0.dtype)

    def res_norm(u):
        return jnp.sum(jnp.abs((rhs - lop(u, lev)) * mask), axis=(-2, -1))

    def cond(state):
        u, k = state
        taun = _truncation_norm(u, rhs, levels)
        # patches with zero source (tau ~ 0) are converged by definition
        done = res_norm(u) <= conv_fact * jnp.maximum(taun, 1e-300)
        return (k < max_cycles) & ~jnp.all(done)

    def body(state):
        u, k = state
        return vcycle(u, rhs, levels, 0, npre, npost), k + 1

    u, _ = jax.lax.while_loop(cond, body, (u0, jnp.int32(0)))
    return u
