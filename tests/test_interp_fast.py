"""Windowed ray-interp fast path (rays/interp_fast.py) vs the global-gather
reference path (soa.interp_and_prop_chunk)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calclens_tpu.healpix import core as hp
from calclens_tpu.healpix import jaxhp
from calclens_tpu.rays import interp_fast, soa


def _perturbed_packed(ray_order, wp, eps=0.12, seed=0):
    """Full-sky packed rays nudged off their pixel centers by ~eps pixel
    (dodges the floor() knife edges that make path comparison ambiguous on
    CPU, where optimization_barrier does not survive)."""
    npix = int(hp.order2npix(ray_order))
    packed = np.array(jax.jit(soa.init_packed_fullsky,
                              static_argnums=(0, 2))(
        ray_order, jnp.float32(wp), npix))
    rng = np.random.default_rng(seed)
    pixrad = np.sqrt(4.0 * np.pi / npix)
    d = rng.normal(0, eps * pixrad, (2, npix)).astype(np.float32)
    n = packed[0:3].astype(np.float64)
    r = np.linalg.norm(n, axis=0)
    u = n / r
    # move along two tangent directions
    npv = np.sqrt(u[0] ** 2 + u[1] ** 2)
    ph = np.stack([-u[1] / npv, u[0] / npv, np.zeros_like(npv)])
    th = np.stack([u[2] * u[0] / npv, u[2] * u[1] / npv, -npv])
    u2 = u + th * d[0] + ph * d[1]
    u2 /= np.linalg.norm(u2, axis=0)
    packed[0:3] = (u2 * r).astype(np.float32)
    return packed


@pytest.mark.parametrize("ray_order,map_order", [(4, 6), (5, 5), (3, 6)])
def test_windowed_matches_global(ray_order, map_order):
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    npix_m = tab.npix
    rng = np.random.default_rng(1)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, npix_m)).astype(np.float32))
    packed = jnp.asarray(_perturbed_packed(ray_order, 500.0))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))

    wplan = interp_fast.get_plan(ray_order, map_order, drift_rings=4,
                                 wmax=max(4096, npix_m // 7))
    assert len(wplan.chunks) > 2  # actually exercises the chunking
    # chunks partition the ray rows exactly
    rows = sorted(wplan.chunks)
    assert rows[0][0] == 0 and rows[-1][1] == packed.shape[1]
    for (a, b, _), (c, d, _) in zip(rows[:-1], rows[1:]):
        assert b == c

    ref = jax.jit(lambda m, p: soa.interp_and_prop_chunk(
        tab, m, p, wp, wpm1, wpm2, False))(maps6, packed)
    out, viol = jax.jit(lambda m, p: interp_fast.interp_and_prop_fullsky(
        tab, m, p, wp, wpm1, wpm2, False, wplan))(maps6, packed)
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)


def test_windowed_deflected_within_margin():
    """Rays deflected by ~2 map rings stay inside the drift margin."""
    ray_order, map_order = 4, 6
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    nside_m = 1 << map_order
    rng = np.random.default_rng(2)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, tab.npix)).astype(np.float32))
    # theta drift of ~2 map ring spacings
    eps_pix = 2.0 * (np.pi / (4 * nside_m)) / np.sqrt(4 * np.pi / hp.order2npix(ray_order))
    packed = jnp.asarray(_perturbed_packed(ray_order, 500.0,
                                           eps=float(eps_pix), seed=3))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    wplan = interp_fast.get_plan(ray_order, map_order, drift_rings=6,
                                 wmax=max(4096, tab.npix // 7))
    ref = jax.jit(lambda m, p: soa.interp_and_prop_chunk(
        tab, m, p, wp, wpm1, wpm2, False))(maps6, packed)
    out, viol = jax.jit(lambda m, p: interp_fast.interp_and_prop_fullsky(
        tab, m, p, wp, wpm1, wpm2, False, wplan))(maps6, packed)
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)
    assert np.isfinite(np.asarray(out)).all()


def test_windowed_violation_poisons():
    """A ray dragged far past the margin is counted and NaN-poisoned, not
    silently interpolated from clamped pixels."""
    ray_order, map_order = 4, 6
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, tab.npix)).astype(np.float32))
    packed = np.asarray(_perturbed_packed(ray_order, 500.0))
    # swap one equatorial ray's direction with a polar one: taps land a
    # hemisphere away from its static window
    nr = packed.shape[1]
    i = nr // 2
    packed[0:3, i] = packed[0:3, 5]
    packed = jnp.asarray(packed)
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    wplan = interp_fast.get_plan(ray_order, map_order, drift_rings=2,
                                 wmax=max(4096, tab.npix // 7))
    out, viol = jax.jit(lambda m, p: interp_fast.interp_and_prop_fullsky(
        tab, m, p, wp, wpm1, wpm2, False, wplan))(maps6, packed)
    assert int(viol) >= 4
    out = np.asarray(out)
    assert np.isnan(out[14:, i]).any()
    # every other ray is untouched and finite
    mask = np.ones(nr, bool)
    mask[i] = False
    assert np.isfinite(out[:, mask]).all()


def test_dispatch_uses_windowed(monkeypatch):
    """poisson._ray_side_packed routes full-sky single-chip rays through the
    windowed path when the map exceeds the fast-gather ceiling."""
    from calclens_tpu import poisson
    from calclens_tpu.rays import interp_fast as IF

    called = {}
    orig = IF.interp_and_prop_fullsky

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(IF, "interp_and_prop_fullsky", spy)
    monkeypatch.setattr(IF, "default_wmax", lambda o: 1 << 10)  # force route
    ray_order, map_order = 3, 5
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)

    class FakePlan:
        spec = None
        order = map_order
        npix = tab.npix

    rng = np.random.default_rng(5)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, tab.npix)).astype(np.float32))
    packed = jnp.asarray(_perturbed_packed(ray_order, 500.0))
    scal = poisson.PlaneScalars(jnp.float32(1.0), jnp.float32(0.0),
                                jnp.float32(750.0), jnp.float32(500.0),
                                jnp.float32(250.0))
    out = poisson._ray_side_packed(tab, maps6, packed, scal, False, FakePlan())
    assert called.get("yes")
    ref = soa.interp_and_prop_chunk(tab, maps6, packed, scal.wp, scal.wpm1,
                                    scal.wpm2, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)


def test_dynwin_matches_global():
    """Dynamic-sub-window interp (sharded halo fast path) matches the
    global-gather path on a full-map window."""
    ray_order, map_order = 4, 6
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, tab.npix)).astype(np.float32))
    packed = jnp.asarray(_perturbed_packed(ray_order, 500.0, seed=9))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    ref = jax.jit(lambda m, p: soa.interp_and_prop_chunk(
        tab, m, p, wp, wpm1, wpm2, False))(maps6, packed)
    col_chunk = packed.shape[1] // 7 + 1
    wc = col_chunk * (4 ** (map_order - ray_order)) + 40 * (1 << map_order)
    out = jax.jit(lambda m, p: interp_fast.interp_and_prop_dynwin(
        tab, m, p, wp, wpm1, wpm2, False, jnp.int32(0), col_chunk,
        wc))(maps6, packed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)
    assert np.isfinite(np.asarray(out)).all()


def test_dynwin_sharded_halo_route():
    """The halo-exchange sharded interp routes through dynwin when the
    per-shard window exceeds the fast-gather ceiling, and still matches the
    single-device step (forced via a tiny WMAX)."""
    import calclens_tpu.rays.interp_fast as IF
    from calclens_tpu.parallel import halo
    from calclens_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    ray_order = map_order = 5
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    maps6 = jnp.asarray(rng.normal(0, 1e-3, (6, tab.npix)).astype(np.float32))
    packed = jnp.asarray(_perturbed_packed(ray_order, 500.0, seed=10))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    ref = jax.jit(lambda m, p: soa.interp_and_prop_chunk(
        tab, m, p, wp, wpm1, wpm2, False))(maps6, packed)

    mesh = make_mesh(8)
    H = halo.required_halo(ray_order, map_order, 8)
    old = IF.WMAX_DEFAULT
    IF.WMAX_DEFAULT = 1 << 10  # force the dynwin route
    try:
        out = halo.interp_and_prop_sharded(
            tab, maps6, packed, wp, wpm1, wpm2, False, mesh, H,
            ray_order, map_order)
    finally:
        IF.WMAX_DEFAULT = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)
    assert np.isfinite(np.asarray(out)).all()
