"""Ray propagation between lens planes (reference rayprop.c, vectorized).

Each ray carries position n (length = current plane comoving distance),
direction beta, inverse-magnification matrices A (current) and Aprev, and the
per-plane deflection alpha / shear tensor U interpolated from the Poisson
solve.  One step (rayprop.c:18-189):

  1. bend beta by |alpha| about n x alpha (deflection alpha = alpha_t e_theta
     + alpha_p e_phi at the ray position),
  2. move along the bent geodesic chord to the sphere of radius w_p
     (quadratic |n + lambda beta| = w_p),
  3. update A by the 3-plane recurrence
       A_{p+1} = (1 - f) A_{p-1} + f A_p - ((w_p - w_{p-1})/w_p) U A_p,
       f = w_{p-1} (w_p - w_{p-2}) / (w_p (w_{p-1} - w_{p-2}))
  4. parallel transport A, Aprev from the old to the new position.

The whole step is a pure function over a Rays pytree, jit/vmap-fused to one
kernel; the Born-approximation variant skips the bend and the U coupling
remains (rayprop.c:40-61).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .paratrans import paratrans_tangtensor, rotate_axis_angle


class Rays(NamedTuple):
    """Struct-of-arrays ray pool (the TPU layout of reference HEALPixRay,
    raytrace.h:284-293).  nest indices are kept host-side."""

    n: jnp.ndarray      # [N, 3] position, |n| = current plane radius
    beta: jnp.ndarray   # [N, 3] direction
    A: jnp.ndarray      # [N, 2, 2]
    Aprev: jnp.ndarray  # [N, 2, 2]
    alpha: jnp.ndarray  # [N, 2] per-plane deflection (theta, phi comps)
    U: jnp.ndarray      # [N, 2, 2] per-plane shear tensor
    phi: jnp.ndarray    # [N] lensing potential at ray


def init_rays(nvec, wp, dtype=jnp.float32):
    """Rays at unit vectors nvec scaled to radius wp, beta = n_hat, A = I
    (reference init_rays, raytrace_utils.c:302-349)."""
    nvec = jnp.asarray(nvec, dtype=dtype)
    N = nvec.shape[0]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (N, 2, 2))
    return Rays(
        n=nvec * wp,
        beta=nvec,
        A=eye,
        Aprev=eye,
        alpha=jnp.zeros((N, 2), dtype),
        U=jnp.zeros((N, 2, 2), dtype),
        phi=jnp.zeros((N,), dtype),
    )


def zero_plane_fields(rays: Rays) -> Rays:
    """Reset per-plane alpha, U, phi (raytrace.c:213-230)."""
    return rays._replace(
        alpha=jnp.zeros_like(rays.alpha),
        U=jnp.zeros_like(rays.U),
        phi=jnp.zeros_like(rays.phi),
    )


def _theta_phi_hat(n):
    """Orthonormal tangent basis at position n (not necessarily unit)."""
    phihat = jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], axis=-1)
    phihat = phihat / jnp.linalg.norm(phihat, axis=-1, keepdims=True)
    thetahat = jnp.stack(
        [
            n[..., 2] * n[..., 0],
            n[..., 2] * n[..., 1],
            -(n[..., 0] ** 2 + n[..., 1] ** 2),
        ],
        axis=-1,
    )
    thetahat = thetahat / jnp.linalg.norm(thetahat, axis=-1, keepdims=True)
    return thetahat, phihat


def _amat_update(rays: Rays, wp, wpm1, wpm2, born: bool):
    f = wpm1 * (wp - wpm2) / (wp * (wpm1 - wpm2))
    g = (wp - wpm1) / wp
    # Born approximation uses U directly (A ~ I there, rayprop.c:49-52)
    UA = rays.U if born else rays.U @ rays.A
    return (1.0 - f) * rays.Aprev + f * rays.A - g * UA


def rayprop_sphere(rays: Rays, wp, wpm1, wpm2, born: bool = False,
                   radial_when_straight: bool = False) -> Rays:
    """Propagate all rays from plane radius wpm1 to wp (reference
    rayprop_sphere, rayprop.c:18).  wpm2 is the previous-previous radius
    (0 at the first step, handled by callers passing the reference's values).
    """
    dtype = rays.n.dtype
    wp = jnp.asarray(wp, dtype)
    wpm1 = jnp.asarray(wpm1, dtype)
    wpm2 = jnp.asarray(wpm2, dtype)

    Ap = _amat_update(rays, wp, wpm1, wpm2, born)

    if born:
        np_ = rays.n * (wp / wpm1)
        return rays._replace(n=np_, A=Ap, Aprev=rays.A)

    alpha_mag = jnp.sqrt(rays.alpha[..., 0] ** 2 + rays.alpha[..., 1] ** 2)
    thetahat, phihat = _theta_phi_hat(rays.n)
    avec = rays.alpha[..., 0:1] * thetahat + rays.alpha[..., 1:2] * phihat
    ncrossa = jnp.cross(rays.n, avec)
    norm = jnp.linalg.norm(ncrossa, axis=-1, keepdims=True)
    axis = ncrossa / jnp.where(norm > 0.0, norm, 1.0)

    betap_bend = rotate_axis_angle(
        rays.beta, axis, jnp.cos(alpha_mag), jnp.sin(alpha_mag)
    )
    bent = (alpha_mag > 0.0)[..., None]
    betap = jnp.where(bent, betap_bend, rays.beta)

    # geodesic chord: |n + lambda beta| = wp (rayprop.c:109-121); exact for
    # every ray — previously-bent rays must keep moving along beta even when
    # this plane's alpha is zero
    qb = 2.0 * jnp.sum(rays.n * betap, axis=-1)
    qc = wpm1 * wpm1 - wp * wp
    disc = jnp.sqrt(jnp.maximum(qb * qb - 4.0 * qc, 0.0))
    q = -0.5 * (qb + jnp.sign(qb) * disc)
    lam1 = qc / jnp.where(q != 0.0, q, 1.0)
    lam = jnp.where(lam1 < 0.0, q, lam1)
    if radial_when_straight:
        # reference alpha == 0 branch (rayprop.c:125-131): unbent rays move
        # radially; the |n| = wp renormalization below does the rescale
        lam = jnp.where(bent[..., 0], lam, 0.0)
    np_ = rays.n + betap * lam[..., None]

    # parallel transport both A matrices old -> new position (rayprop.c:151-170)
    Aprev_t = paratrans_tangtensor(rays.A, rays.n, np_)
    A_t = paratrans_tangtensor(Ap, rays.n, np_)

    # renormalize |n| = wp (rayprop.c:182-187)
    r = wp / jnp.linalg.norm(np_, axis=-1)
    np_ = np_ * r[..., None]

    return rays._replace(n=np_, beta=betap, A=A_t, Aprev=Aprev_t)
