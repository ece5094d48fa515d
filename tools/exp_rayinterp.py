#!/usr/bin/env python
"""Experiments for the rayside interp levers (docs/TPU_NOTES.md):
(a) row-major [npix, 8] map layout -> embedding-style row gathers
(b) closed-form ring geometry instead of 16K-entry table lookups
"""
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
    nside = tab.nside

    key = jax.random.PRNGKey(0)
    maps6 = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (6, npix_map), jnp.float32)
                * 1e-3)(key))
    # row-major padded layout [npix, 8]
    maps8 = jax.block_until_ready(jax.jit(
        lambda m: jnp.pad(m.T, ((0, 0), (0, 2))))(maps6))
    idx = jax.block_until_ready(jax.jit(
        lambda k: jax.random.randint(k, (4, nrays), 0, npix_map,
                                     jnp.int32))(key))

    def gathers_col(m, ix):
        return sum(jnp.sum(m[:, ix[k]], axis=0) for k in range(4))

    def gathers_row(m, ix):
        return sum(jnp.sum(m[ix[k]], axis=1) for k in range(4))

    t = timeit(jax.jit(gathers_col), maps6, idx)
    print(f"col-gather [6,npix]   : {t:.3f}s", flush=True)
    t = timeit(jax.jit(gathers_row), maps8, idx)
    print(f"row-gather [npix,8]   : {t:.3f}s", flush=True)

    # one fused gather: all 4 taps in one take (indices concatenated)
    def gathers_row1(m, ix):
        g = m[ix.reshape(-1)]
        return jnp.sum(g.reshape(4, -1, 8), axis=(0, 2))
    t = timeit(jax.jit(gathers_row1), maps8, idx)
    print(f"row-gather fused 4-tap: {t:.3f}s", flush=True)

    # (b) closed-form ring geometry vs table lookups
    packed = jax.block_until_ready(jax.jit(
        soa.init_packed_fullsky, static_argnums=(0, 2))(
        ray_order, jnp.float32(500.0), nrays))

    def angles(p):
        nx, ny, nz = p[0], p[1], p[2]
        rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        hz = nz / rad
        theta = jnp.arccos(jnp.clip(hz, -1.0, 1.0))
        phi = jnp.arctan2(ny, nx)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        return theta, phi

    def taps_table(p):
        theta, phi = angles(p)
        pix4, wgt4 = jaxhp.get_interpol_soa(tab, theta, phi)
        return sum(w for w in wgt4) + sum(x.astype(jnp.float32)
                                          for x in pix4)
    t = timeit(jax.jit(taps_table), packed)
    print(f"taps (table ring geo) : {t:.3f}s", flush=True)

    fns = jnp.float32(nside)

    def ring_geo_closed(ir):
        """ring number ir (1..4nside-1) -> startpix, ringpix, shift, theta
        via the closed-form HEALPix RING geometry (healpix_utils.c pix2ang
        structure), no table lookups."""
        irf = ir.astype(jnp.float32)
        north = ir < nside
        south = ir > 3 * nside
        # caps
        i_n = irf
        i_s = 4.0 * fns - irf
        sp_cap_n = 2.0 * i_n * (i_n - 1.0)
        sp_cap_s = jnp.float32(npix_map) - 2.0 * i_s * (i_s + 1.0)
        np_cap_n = 4.0 * i_n
        np_cap_s = 4.0 * i_s
        # belt
        sp_belt = 2.0 * fns * (fns - 1.0) + (irf - fns) * (4.0 * fns)
        np_belt = 4.0 * fns
        sp = jnp.where(north, sp_cap_n, jnp.where(south, sp_cap_s, sp_belt))
        npr = jnp.where(north, np_cap_n, jnp.where(south, np_cap_s, np_belt))
        shift = jnp.where(north | south, jnp.float32(0.5),
                          jnp.where((ir - nside) % 2 == 0, 0.5, 0.0))
        z = jnp.where(north, 1.0 - (i_n * i_n) / (3.0 * fns * fns),
                      jnp.where(south, -1.0 + (i_s * i_s) / (3.0 * fns * fns),
                                (2.0 * fns - irf) * (2.0 / (3.0 * fns))))
        thr = jnp.arccos(z)
        return sp, npr, shift, thr

    def taps_closed(p):
        theta, phi = angles(p)
        z = jnp.cos(theta)
        az = jnp.abs(z)
        ir_cap = (fns * jnp.sqrt(jnp.maximum(3.0 * (1.0 - az), 0.0))
                  ).astype(jnp.int32)
        ir_eq = (fns * (2.0 - 1.5 * z)).astype(jnp.int32)
        ring_above = jnp.where(az <= 2.0 / 3.0, ir_eq,
                               jnp.where(z > 0, ir_cap,
                                         4 * nside - ir_cap - 1))
        nrings = 4 * nside - 1
        acc_w = 0.0
        acc_p = 0.0
        for ir in (ring_above, ring_above + 1):
            irc = jnp.clip(ir, 1, nrings)
            sp, nr, shift, thr = ring_geo_closed(irc)
            dphi = 2.0 * jnp.pi / nr
            tmp = phi / dphi - shift
            i1 = jnp.floor(tmp)
            w = (phi - (i1 + shift) * dphi) / dphi
            i2 = i1 + 1.0
            i1 = jnp.where(i1 < 0, i1 + nr, i1)
            i2 = jnp.where(i2 >= nr, i2 - nr, i2)
            acc_w = acc_w + w + thr
            acc_p = acc_p + (sp + i1) + (sp + i2)
        return acc_w + acc_p
    t = timeit(jax.jit(taps_closed), packed)
    print(f"taps (closed-form geo): {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
