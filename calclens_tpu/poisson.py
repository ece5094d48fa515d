"""Spherical Poisson solve driver (reference shtpoissonsolve.c + poissondrivers.c).

Pipeline per lens plane (SHTONLY + full-sky default path, SURVEY.md 3.2):
  particles -> deposit onto poissonOrder RING map -> scale by densfact/pixarea
  and subtract the mean background -> map2alm -> alm *= -1/(l(l+1)) (monopole
  zeroed) -> alm2allmaps (phi + 5 covariant derivatives) -> bilinear+parallel-
  transport interpolation onto rays, alpha -= grad(phi), U += hess(phi).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .healpix import jaxhp
from .ops import deposit as dep
from .ops.interp import FieldMaps, shear_interp, apply_lensing_fields
from .sht import transforms as T
from .sht.plan import SHTPlan


@partial(jax.jit, static_argnums=0)
def solve_potential(plan: SHTPlan, density):
    """Scaled surface density map -> FieldMaps (phi and covariant derivs)."""
    alm = T.legendre_analysis(plan, *T.fold_pairs(plan, T.analysis_rings(plan, density)))
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    alm = alm * inv.astype(plan.dtype)
    return FieldMaps(*T.alm2allmaps(plan, alm))


def sht_poisson_solve(plan: SHTPlan, tab: jaxhp.InterpTables, rays,
                      pos, mass, densfact, backdens, vacmask=None,
                      scheme: str = "NGP", density=None):
    """Full solve: deposit + solve + interpolate onto rays.

    pos [N,3]/mass [N] are this plane's particles (device arrays); `density`
    may be passed instead for the UseHEALPixLensPlaneMaps path (raw mass per
    pixel / MASS_SCALE, ring ordered).  Returns (rays', FieldMaps).
    """
    if density is None:
        if scheme == "NGP":
            density = dep.deposit_ngp(plan.order, pos, mass, plan.npix)
        elif scheme == "CIC":
            density = dep.deposit_cic(tab, pos, mass)
        else:
            raise NotImplementedError(f"deposit scheme {scheme}")
    pixarea = 4.0 * jnp.pi / plan.npix
    density = dep.scale_density(density, densfact, backdens, pixarea, vacmask)
    maps = solve_potential(plan, density)
    pot, grad, U = shear_interp(tab, maps, rays.n)
    return apply_lensing_fields(rays, pot, grad, U), maps
