"""The packed SoA ray side (rays/soa.py) must reproduce the straightforward
array-of-struct implementation (ops/interp.py + rays/propagate.py) exactly."""
import numpy as np
import jax.numpy as jnp

from calclens_tpu.healpix import core as hp
from calclens_tpu.healpix import jaxhp
from calclens_tpu.ops.interp import FieldMaps, shear_interp, apply_lensing_fields
from calclens_tpu.rays import propagate as rp
from calclens_tpu.rays import soa


def _random_rays(n, rng, wpm1):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rays = rp.init_rays(jnp.asarray(v), wpm1, dtype=jnp.float64)
    beta = v + 0.01 * rng.normal(size=(n, 3))
    beta /= np.linalg.norm(beta, axis=1, keepdims=True)
    return rays._replace(
        beta=jnp.asarray(beta),
        A=jnp.asarray(np.eye(2) + 0.05 * rng.normal(size=(n, 2, 2))),
        Aprev=jnp.asarray(np.eye(2) + 0.05 * rng.normal(size=(n, 2, 2))),
        alpha=jnp.asarray(1e-3 * rng.normal(size=(n, 2))),
        U=jnp.asarray(1e-3 * rng.normal(size=(n, 2, 2))),
        phi=jnp.asarray(rng.normal(size=n)),
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    rays = _random_rays(257, rng, 500.0)
    back = soa.unpack(soa.pack(rays))
    for a, b in zip(rays, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interp_and_prop_matches_aos():
    order = 4
    rng = np.random.default_rng(1)
    tab = jaxhp.InterpTables(order, dtype=jnp.float64)
    npix = int(hp.order2npix(order))
    maps = FieldMaps(*[jnp.asarray(rng.normal(size=npix)) for _ in range(6)])
    wp, wpm1, wpm2 = 750.0, 500.0, 250.0

    rays = _random_rays(1024, rng, wpm1)
    # AoS reference path
    z = rp.zero_plane_fields(rays)
    pot, grad, U = shear_interp(tab, maps, z.n)
    z = apply_lensing_fields(z, pot, grad, U)
    want = rp.rayprop_sphere(z, wp, wpm1, wpm2, born=False)

    got = soa.unpack(soa.interp_and_prop_chunk(
        tab, maps, soa.zero_plane_rows(soa.pack(rays)),
        jnp.float64(wp), jnp.float64(wpm1), jnp.float64(wpm2), False))

    for name, a, b in zip(want._fields, want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


def test_prop_only_matches_aos_born_and_full():
    rng = np.random.default_rng(2)
    wp, wpm1, wpm2 = 1000.0, 750.0, 500.0
    for born in (False, True):
        rays = _random_rays(512, rng, wpm1)
        want = rp.rayprop_sphere(rays, wp, wpm1, wpm2, born=born)
        got = soa.unpack(soa.prop_only_chunk(
            soa.pack(rays), jnp.float64(wp), jnp.float64(wpm1),
            jnp.float64(wpm2), born))
        for name, a, b in zip(want._fields, want, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-12, atol=1e-12, err_msg=name)
