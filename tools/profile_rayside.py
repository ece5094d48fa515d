#!/usr/bin/env python
"""Sub-stage timing of the ray side (interp + prop) at bench shapes.

Decides whether the next kernel is the interpolation gather, the tap
arithmetic, or the propagation math (docs/TPU_NOTES.md 'Pallas
ray-interpolation kernel' lever)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens-tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp

from calclens_tpu.healpix import core as hp
from calclens_tpu.healpix import jaxhp
from calclens_tpu.rays import soa


def force(x):
    return float(jnp.sum(jax.lax.slice(
        x, (0,) * x.ndim, (1,) * x.ndim).astype(jnp.float32)))


def timeit(fn, *args, n=3):
    force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    map_order = int(os.environ.get("O", 12))
    ray_order = int(os.environ.get("RO", 10))
    npix_map = int(hp.order2npix(map_order))
    nrays = int(hp.order2npix(ray_order))
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    maps6 = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (6, npix_map), jnp.float32)
                * 1e-3)(key))
    packed = jax.block_until_ready(jax.jit(
        soa.init_packed_fullsky, static_argnums=(0, 2))(
        ray_order, jnp.float32(500.0), nrays))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))

    # full fused interp+prop (the production chunk step)
    full = jax.jit(lambda m, p: soa.interp_and_prop_chunk(
        tab, m, p, wp, wpm1, wpm2, False))
    t_full = timeit(full, maps6, packed)
    print(f"interp+prop fused: {t_full:.3f}s", flush=True)

    # tap computation only (angles + get_interpol arithmetic; no map access)
    def taps_only(p):
        nx, ny, nz = p[0], p[1], p[2]
        rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        hz = nz / rad
        theta = jnp.arccos(jnp.clip(hz, -1.0, 1.0))
        phi = jnp.arctan2(ny, nx)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        pix4, wgt4 = jaxhp.get_interpol_soa(tab, theta, phi)
        return sum(w for w in wgt4) + sum(x.astype(jnp.float32)
                                          for x in pix4)
    t_taps = timeit(jax.jit(taps_only), packed)
    print(f"tap arithmetic:    {t_taps:.3f}s", flush=True)

    # the 4 stacked row-gathers alone (fixed random indices)
    idx = jax.block_until_ready(jax.jit(
        lambda k: jax.random.randint(k, (4, nrays), 0, npix_map,
                                     jnp.int32))(key))

    def gathers(m, ix):
        return sum(jnp.sum(m[:, ix[k]], axis=0) for k in range(4))
    t_g = timeit(jax.jit(gathers), maps6, idx)
    print(f"4x [6,N] row-gathers (random idx): {t_g:.3f}s", flush=True)

    # coherent (RING-ordered) indices — the production access pattern
    def coherent_idx(p):
        nx, ny, nz = p[0], p[1], p[2]
        rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        theta = jnp.arccos(jnp.clip(nz / rad, -1.0, 1.0))
        phi = jnp.arctan2(ny, nx)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        pix4, _ = jaxhp.get_interpol_soa(tab, theta, phi)
        return jnp.stack(pix4)
    cidx = jax.block_until_ready(jax.jit(coherent_idx)(packed))
    t_gc = timeit(jax.jit(gathers), maps6, cidx)
    print(f"4x [6,N] row-gathers (coherent idx): {t_gc:.3f}s", flush=True)

    # propagation only
    prop = jax.jit(lambda p: soa.prop_only_chunk(p, wp, wpm1, wpm2, False))
    t_p = timeit(prop, packed)
    print(f"prop only:         {t_p:.3f}s", flush=True)


if __name__ == "__main__":
    main()


def windowed():
    """Windowed fast path at the same shapes (run: O=12 RO=10 python
    tools/profile_rayside.py windowed)."""
    from calclens_tpu.rays import interp_fast

    map_order = int(os.environ.get("O", 12))
    ray_order = int(os.environ.get("RO", 10))
    npix_map = int(hp.order2npix(map_order))
    nrays = int(hp.order2npix(ray_order))
    tab = jaxhp.InterpTables(map_order, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    maps6 = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (6, npix_map), jnp.float32)
                * 1e-3)(key))
    packed = jax.block_until_ready(jax.jit(
        soa.init_packed_fullsky, static_argnums=(0, 2))(
        ray_order, jnp.float32(500.0), nrays))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    drift = int(os.environ.get("DRIFT", 16))
    wplan = interp_fast.get_plan(ray_order, map_order, drift)
    print(wplan, flush=True)
    f = jax.jit(lambda m, p: interp_fast.interp_and_prop_fullsky(
        tab, m, p, wp, wpm1, wpm2, False, wplan)[0])
    t = timeit(f, maps6, packed)
    print(f"interp+prop windowed: {t:.3f}s", flush=True)
    fv = jax.jit(lambda m, p: interp_fast.interp_and_prop_fullsky(
        tab, m, p, wp, wpm1, wpm2, False, wplan))
    out, viol = fv(maps6, packed)
    print(f"viol = {int(viol)}", flush=True)


if "windowed" in sys.argv:
    windowed()
