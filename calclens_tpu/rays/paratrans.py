"""Rotations and parallel transport on the sphere (vectorized JAX).

TPU-native reimplementation of the reference's rot_paratrans.c: axis-angle
rotations and the psi-angle parallel transport of tangent vectors/tensors
along great circles (rot_paratrans.c:101-273).  All functions are pure and
broadcast over leading batch dimensions; they are used inside jit/vmap for
every ray every plane, so everything is branch-free (where-select instead of
the reference's if/else).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_axis_angle(vec, axis, cosangle, sinangle):
    """Rodrigues rotation of `vec` about unit `axis` (counter-clockwise),
    matching rot_vec_axis_trigangle_countercw (rot_paratrans.c:78-92).

    cosangle/sinangle must have shape vec.shape[:-1] (one scalar per batch
    element); the trailing vector axis is added here exactly once.
    """
    axisdotvec = jnp.sum(axis * vec, axis=-1, keepdims=True)
    axiscrossvec = jnp.cross(axis, vec)
    c = jnp.asarray(cosangle)[..., None]
    s = jnp.asarray(sinangle)[..., None]
    return vec * c + axis * axisdotvec * (1.0 - c) + axiscrossvec * s


def _transport_psi(vec, rvec):
    """cos(psi), sin(psi) of the basis rotation induced by parallel transport
    from unit vector `vec` to unit vector `rvec` along the great circle.

    psi is defined by R(e_theta) = cos(psi) e_theta' - sin(psi) e_phi',
    R(e_phi) = sin(psi) e_theta' + cos(psi) e_phi' (rot_paratrans.c:158-166).
    """
    axis = jnp.cross(vec, rvec)
    cosangle = jnp.sum(vec * rvec, axis=-1)
    sinangle = jnp.linalg.norm(axis, axis=-1)
    safe = sinangle > 0.0
    axis = jnp.where(
        safe[..., None],
        axis / jnp.where(safe, sinangle, 1.0)[..., None],
        jnp.array([1.0, 0.0, 0.0], dtype=vec.dtype),
    )

    # rotate e_phi(vec) to rvec's tangent plane
    p = jnp.stack([-vec[..., 1], vec[..., 0], jnp.zeros_like(vec[..., 0])], axis=-1)
    rephi = rotate_axis_angle(p, axis, cosangle, sinangle)

    ephi_r = jnp.stack([-rvec[..., 1], rvec[..., 0], jnp.zeros_like(rvec[..., 0])], axis=-1)
    etheta_r = jnp.stack(
        [
            rvec[..., 2] * rvec[..., 0],
            rvec[..., 2] * rvec[..., 1],
            -(rvec[..., 0] ** 2 + rvec[..., 1] ** 2),
        ],
        axis=-1,
    )

    norm = jnp.sqrt(
        (1.0 - rvec[..., 2]) * (1.0 + rvec[..., 2]) * (1.0 - vec[..., 2]) * (1.0 + vec[..., 2])
    )
    inv = 1.0 / jnp.where(norm > 0.0, norm, 1.0)
    sinpsi = jnp.sum(rephi * etheta_r, axis=-1) * inv
    cospsi = jnp.sum(rephi * ephi_r, axis=-1) * inv
    # transport to the same point: identity
    same = sinangle == 0.0
    cospsi = jnp.where(same, 1.0, cospsi)
    sinpsi = jnp.where(same, 0.0, sinpsi)
    return cospsi, sinpsi


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def paratrans_tangvec(tvec, vec, rvec):
    """Transport tangent vector tvec = (t_theta, t_phi) from vec to rvec."""
    cospsi, sinpsi = _transport_psi(_unit(vec), _unit(rvec))
    t0 = tvec[..., 0] * cospsi + tvec[..., 1] * sinpsi
    t1 = -tvec[..., 0] * sinpsi + tvec[..., 1] * cospsi
    return jnp.stack([t0, t1], axis=-1)


def paratrans_tangtensor(T, vec, rvec):
    """Transport 2x2 tangent tensor T (theta-phi basis) from vec to rvec:
    T' = R^T T R with R = [[c, -s], [s, c]] (rot_paratrans.c:236-270)."""
    cospsi, sinpsi = _transport_psi(_unit(vec), _unit(rvec))
    c = cospsi[..., None, None]
    s = sinpsi[..., None, None]
    zeros = jnp.zeros_like(c)
    R = jnp.concatenate(
        [jnp.concatenate([c, -s], axis=-1), jnp.concatenate([s, c], axis=-1)], axis=-2
    )
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt @ (T @ R)
