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


def scale_density(dens, densfact, backdens, pixarea, vacmask=None):
    """densfact/pixarea scaling and background subtraction
    (shtpoissonsolve.c:454-502).  vacmask marks pixels outside the cut-sky
    region (zeroed instead of background-subtracted)."""
    out = dens * (densfact / pixarea * MASS_SCALE) - backdens
    if vacmask is not None:
        out = jnp.where(vacmask, 0.0, out)
    return out
