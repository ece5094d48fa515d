"""Particle -> HEALPix surface-density deposit (reference shtpoissonsolve.c
step 1, :110-291).

NGP and CIC schemes as vectorized scatter-adds on the RING-ordered map (the
reference deposits into nest-ordered bundle cells then shuffles to rings; on
TPU we deposit straight into ring order, which is the SHT's native layout —
the peano2ring shuffle disappears).  The SPH adaptive-kernel scheme
(partsmoothdens.c) deposits onto the pixels returned by a per-particle disc
query; its TPU form (fixed-size neighbor stencil + segment sum) lands in a
later round — NGP is the reference's default (Makefile:26, NGPSHTDENS).

Masses are scaled by 1/MASS_SCALE at deposit and rescaled in the Poisson
solve, following shtpoissonsolve.c:36,153 to keep f32 sums in range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..healpix import jaxhp

MASS_SCALE = 1e10  # reference shtpoissonsolve.c:36


def deposit_ngp(order: int, pos, mass, npix: int):
    """Nearest-grid-point deposit.  pos [N,3] (any radius), mass [N]."""
    theta, phi = jaxhp.vec2ang(pos)
    pix = jaxhp.ang2pix_ring(theta, phi, order)
    m = jnp.zeros((npix,), dtype=mass.dtype)
    return m.at[pix].add(mass / MASS_SCALE)


def deposit_cic(tab: jaxhp.InterpTables, pos, mass):
    """Cloud-in-cell deposit using the bilinear interpolation weights
    (shtpoissonsolve.c:159-185)."""
    theta, phi = jaxhp.vec2ang(pos)
    pix, wgt = jaxhp.get_interpol(tab, theta, phi)
    m = jnp.zeros((tab.npix,), dtype=mass.dtype)
    for k in range(4):
        m = m.at[pix[..., k]].add(mass * wgt[..., k] / MASS_SCALE)
    return m


def smoothing_lengths(pos, comv_smoothing_scale, min_sl, max_sl):
    """Angular smoothing length per particle, clamped (reference
    get_smoothing_lengths, partsmoothdens.c:14-81 + raytrace.c:425-450)."""
    r = jnp.linalg.norm(pos, axis=-1)
    sl = comv_smoothing_scale / jnp.maximum(r, 1e-12)
    return jnp.clip(sl, min_sl, max_sl)


def sph_sigma_grid(min_sl, max_sl, nbuckets=8):
    """Static log-spaced bucket centers for the sigma-bucketed deposit."""
    import numpy as _np

    return _np.geomspace(min_sl, max_sl, nbuckets)


def deposit_sph_bucketed(order: int, pos, mass, sl, sigmas, npix: int,
                         tab=None):
    """SPH deposit, TPU formulation: instead of the reference's per-particle
    query_disc scatter over a variable pixel set (shtpoissonsolve.c:187-291),
    particles deposit onto B maps via CIC (bilinear sub-pixel placement);
    each bucket's spline-kernel smoothing is applied afterwards in harmonic
    space (kernel_bl, deconvolved by the CIC assignment window), which is
    exact for the bucket's sigma and TPU-friendly (dense batched transforms
    instead of irregular scatters).

    Each particle's mass is split between its two bracketing sigma buckets
    (linear in ln sigma), so the effective smoothing window interpolates
    b_l(sigma) to first order instead of quantizing to the bucket grid.
    Measured against the exact per-particle oracle (testing/sph_oracle.py):
    deflection-field RMS error 1.4-1.7% at sigma ~ 2-6 pixels, < 0.7% at
    sigma >~ 5 pixels (tests/test_sph_deposit.py).

    Returns [B, npix] maps.
    """
    theta, phi = jaxhp.vec2ang(pos)
    B = len(sigmas)
    logsig = jnp.log(jnp.asarray(sigmas, sl.dtype))
    hi = jnp.clip(jnp.searchsorted(logsig, jnp.log(sl)), 1, B - 1)
    lo = hi - 1
    t = (jnp.log(sl) - logsig[lo]) / (logsig[hi] - logsig[lo])
    t = jnp.clip(t, 0.0, 1.0)
    # 1D scatter-adds into the FLAT [B * npix] buffer: the 2D (row, col)
    # scatter form stalled the TPU compiler for tens of minutes at order 12
    # ([8, 201M] operand), while the flat form lowers like deposit_ngp's
    # (which compiles in seconds at the same size)
    if B * npix < 2**31 or jax.config.jax_enable_x64:
        # flat index fits int32 through order 12 at 8 buckets
        # (1.6e9 < 2^31); past that only the x64 path indexes exactly
        idt = jnp.int32 if B * npix < 2**31 else jnp.int64
        m = jnp.zeros((B * npix,), dtype=mass.dtype)
        npix_i = idt(npix)
        if tab is not None:
            pix4, wgt = jaxhp.get_interpol(tab, theta, phi)
            for k in range(4):
                m = m.at[lo.astype(idt) * npix_i
                         + pix4[..., k].astype(idt)].add(
                    mass * wgt[..., k] * (1.0 - t) / MASS_SCALE)
                m = m.at[hi.astype(idt) * npix_i
                         + pix4[..., k].astype(idt)].add(
                    mass * wgt[..., k] * t / MASS_SCALE)
            return m.reshape(B, npix)
        pix = jaxhp.ang2pix_ring(theta, phi, order).astype(idt)
        m = m.at[lo.astype(idt) * npix_i + pix].add(
            mass * (1.0 - t) / MASS_SCALE)
        return m.at[hi.astype(idt) * npix_i + pix].add(
            mass * t / MASS_SCALE).reshape(B, npix)
    # 2D (row, col) scatter fallback: exact at any size without x64
    m = jnp.zeros((B, npix), dtype=mass.dtype)
    if tab is not None:
        pix4, wgt = jaxhp.get_interpol(tab, theta, phi)
        for k in range(4):
            m = m.at[lo, pix4[..., k]].add(
                mass * wgt[..., k] * (1.0 - t) / MASS_SCALE)
            m = m.at[hi, pix4[..., k]].add(
                mass * wgt[..., k] * t / MASS_SCALE)
        return m
    pix = jaxhp.ang2pix_ring(theta, phi, order)
    m = m.at[lo, pix].add(mass * (1.0 - t) / MASS_SCALE)
    return m.at[hi, pix].add(mass * t / MASS_SCALE)


def pixwin_disc_bl(order: int, lmax: int):
    """Isotropic pixel-assignment window: Legendre transform of the
    equal-area disc (radius R with pi R^2 = 4 pi / npix).  The CIC cloud's
    effective window is ~ this squared; the SPH solve divides it out so the
    band-limited kernel is centered at the exact particle position."""
    import numpy as _np
    from scipy.special import eval_legendre

    R = _np.sqrt(4.0 / (12.0 * 4.0**order))
    g = _np.linspace(0.0, R, 513)
    x = _np.cos(g)
    w = _np.gradient(g) * _np.sin(g)
    P = eval_legendre(_np.arange(lmax + 1)[:, None], x[None, :])
    bl = P @ w
    return bl / bl[0]


def kernel_bl(sigma, lmax):
    """Legendre transform of the normalized Epanechnikov-like spline kernel
    K(gamma) ~ max(1 - (gamma/sigma)^2, 0) (partsmoothdens.c:84-141):
    b_l = 2 pi int K(g) P_l(cos g) sin g dg, normalized so b_0 = 1."""
    import numpy as _np
    from scipy.special import eval_legendre

    ng = 512
    g = _np.linspace(0.0, sigma, ng + 1)
    k = _np.maximum(1.0 - (g / sigma) ** 2, 0.0)
    x = _np.cos(g)
    w = _np.gradient(g) * _np.sin(g) * k
    ls = _np.arange(lmax + 1)
    P = eval_legendre(ls[:, None], x[None, :])
    bl = P @ w
    return bl / bl[0]


def scale_density(dens, densfact, backdens, pixarea, vacmask=None):
    """densfact/pixarea scaling and background subtraction
    (shtpoissonsolve.c:454-502).  vacmask marks pixels outside the cut-sky
    region (zeroed instead of background-subtracted)."""
    out = dens * (densfact / pixarea * MASS_SCALE) - backdens
    if vacmask is not None:
        out = jnp.where(vacmask, 0.0, out)
    return out
