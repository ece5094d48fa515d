"""Interpolation of the lensing potential and its derivatives to rays.

TPU version of the reference's ``shearinterp_comp`` (shtpoissonsolve.c:1122-
1204): 4-pixel bilinear weights at the ray position, with each neighbor
pixel's gradient vector and shear tensor parallel-transported from the pixel
center to the ray position before weighting.  Fully vectorized over rays; no
bundle-cell/buffer bookkeeping is needed because the maps are whole arrays
(sharded maps gather through an all-gathered or halo-exchanged copy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..healpix import jaxhp


class FieldMaps(NamedTuple):
    """The six ring-ordered maps produced by the SHT Poisson solve."""

    pot: jnp.ndarray
    gt: jnp.ndarray
    gp: jnp.ndarray
    gtt: jnp.ndarray
    gtp: jnp.ndarray
    gpp: jnp.ndarray


def shear_interp(tab: jaxhp.InterpTables, maps: FieldMaps, rvec):
    """Interpolate (pot, grad, U) to positions rvec [N, 3].

    Returns pot [N], grad [N, 2] (theta, phi components), U [N, 2, 2].
    """
    from ..rays.paratrans import paratrans_tangvec, paratrans_tangtensor

    theta, phi = jaxhp.vec2ang(rvec)
    pix, wgt = jaxhp.get_interpol(tab, theta, phi)  # [N,4]

    pot = jnp.sum(maps.pot[pix] * wgt, axis=-1)

    rhat = rvec / jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    grad = jnp.zeros(rvec.shape[:-1] + (2,), dtype=maps.pot.dtype)
    U = jnp.zeros(rvec.shape[:-1] + (2, 2), dtype=maps.pot.dtype)
    for k in range(4):
        pk = pix[..., k]
        wk = wgt[..., k]
        cvec = jaxhp.pix2vec_ring(pk, tab.order, dtype=maps.pot.dtype)
        tvec = jnp.stack([maps.gt[pk], maps.gp[pk]], axis=-1)
        grad = grad + paratrans_tangvec(tvec, cvec, rhat) * wk[..., None]
        T = jnp.stack(
            [
                jnp.stack([maps.gtt[pk], maps.gtp[pk]], axis=-1),
                jnp.stack([maps.gtp[pk], maps.gpp[pk]], axis=-1),
            ],
            axis=-2,
        )
        U = U + paratrans_tangtensor(T, cvec, rhat) * wk[..., None, None]
    return pot, grad, U


def apply_lensing_fields(rays, pot, grad, U):
    """alpha -= grad(phi), U += hessian(phi) (shtpoissonsolve.c:686-703)."""
    return rays._replace(
        phi=pot,
        alpha=rays.alpha - grad,
        U=rays.U + U,
    )
