#!/usr/bin/env python
"""Measured ray side at rayOrder-13 shapes (round-3 VERDICT weak #7/item 8).

The 8 x v5p order-13 projection in BASELINE.md previously scaled the
rayOrder-10 interp+prop phase x64 (linear in rays).  This measures the real
thing at order-13 shapes on the single chip: a ring-contiguous ray SHARD
(npix13/16 = 50.3M rays — the largest [21, N] in+out pair that fits 16 GB
HBM; a v5p chip-eighth holds 2x this) interpolating from an order-13 map
WINDOW through the same interp_and_prop_chunk/pix_base path the halo-
exchange mesh kernel runs per shard (parallel/halo.py).  The gather wall is
index-coherence independent (docs/TPU_NOTES.md), so the polar shard's
timing stands for any shard.

Prints the measured shard time and the single-chip-equivalent full-sky ray
side (x16) for the BASELINE.md order-13 scaling row.
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
from calclens_tpu import poisson


def force(x):
    return float(jnp.sum(jax.lax.slice(
        x, (0,) * x.ndim, (1,) * x.ndim).astype(jnp.float32)))


def main():
    order = 13
    npix13 = int(hp.order2npix(order))
    # FRAC=16 (50.3M rays) RESOURCE_EXHAUSTs on a 16 GB v5e: the packed
    # in+out pair alone is 8.5 GB before gather temporaries.  FRAC=32 fits;
    # the gather wall is size-independent (docs/TPU_NOTES.md) so the
    # per-ray throughput stands for the full shard.
    frac = int(os.environ.get("FRAC", 32))
    nsh = npix13 // frac
    nside = 1 << order
    W = nsh + 64 * nside  # window: shard range + a generous ring margin
    print(f"order-13 ray-side shard: {nsh/1e6:.1f}M rays, window {W/1e6:.1f}M"
          f" pixels", flush=True)

    tab = jaxhp.InterpTables(order, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    maps6 = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (6, W), jnp.float32) * 1e-3)(key))
    wp, wpm1, wpm2 = (jnp.float32(750.0), jnp.float32(500.0),
                      jnp.float32(250.0))
    packed = jax.block_until_ready(jax.jit(
        soa.init_packed_fullsky, static_argnums=(0, 2))(
        order, wpm1, nsh))

    from calclens_tpu.rays import interp_fast

    mode = os.environ.get("MODE", "dynwin")
    if mode == "dynwin":
        # the halo fast path (interp_fast.interp_and_prop_dynwin): dynamic
        # sub-windows keep gather operands in the fast <= 2M px regime
        col_chunk, wc = interp_fast.dynwin_params(order, order)

        @jax.jit
        def rayside(m, p):
            return interp_fast.interp_and_prop_dynwin(
                tab, m, p, wp, wpm1, wpm2, False, jnp.int32(0), col_chunk,
                wc)
    else:
        @jax.jit
        def rayside(m, p):
            def block(b):
                return soa.interp_and_prop_chunk(tab, m, b, wp, wpm1, wpm2,
                                                 False, pix_base=0)
            return soa.chunked(block, p, poisson.RAY_CHUNK)

    force(rayside(maps6, packed))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(rayside(maps6, packed))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"measured shard interp+prop ({mode}): {t:.3f}s "
          f"({nsh/t/1e6:.1f}M rays/s)", flush=True)
    print(f"single-chip-equivalent full-sky ray side (x{frac}): "
          f"{t*frac:.1f}s; per v5p chip-eighth (x{frac/8:.0f}): "
          f"{t*frac/8:.2f}s", flush=True)


if __name__ == "__main__":
    main()
