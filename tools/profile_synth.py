"""Per-stage profile of the NSIDE-4096 streamed synthesis + analysis.

Times, with trustworthy scalar-fetch sync (docs/TPU_NOTES.md), each sub-stage
of one representative cap j-block and one belt j-block of the host-streamed
synthesis, plus the ring/Legendre split of the analysis.  This is the
measurement that decides which optimization lever to pull next.

Usage: python tools/profile_synth.py [order]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens-tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T
from functools import partial


def force(x):
    if isinstance(x, (tuple, list)):
        for y in x:
            if y is not None:
                force(y)
        return x
    # complex64 cannot cross device->host on axon: fetch the real part
    np.asarray(jax.device_get(jnp.real(
        jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim)).astype(jnp.float32)))
    return x


def timeit(fn, *args, n=3, **kw):
    force(fn(*args, **kw))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn(*args, **kw))
    return (time.perf_counter() - t0) / n


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    plan = SHTPlan(order=order, lmax=2 * (1 << order))
    nblk = T._synth_stream_blocks(plan)
    J, nrings = plan.J, plan.nrings
    Jblk = J // nblk
    print(f"order={order} nl={plan.nl} nm={plan.nm} J={J} nblk={nblk} "
          f"Jblk={Jblk} device={jax.devices()[0].platform}")

    rng = np.random.default_rng(7)
    re = rng.normal(size=(plan.nl, plan.nm)).astype(np.float32)
    im = rng.normal(size=(plan.nl, plan.nm)).astype(np.float32)
    # complex64 cannot cross host->device on axon: assemble in-graph
    mk = jax.jit(lambda r, i: (r + 1j * i).astype(plan.cdtype))
    alm_dev = mk(jnp.asarray(re), jnp.asarray(im))

    # --- MX prep (hoisted, as the production path does) ---
    prepped = None
    if T._use_pallas_mx(plan):
        from calclens_tpu.sht import pallas_legendre_mx as MX
        prep = jax.jit(partial(MX.mx_prep, plan.nl, plan.nm, derivs=True))
        t = timeit(prep, alm_dev, n=1)
        print(f"mx_prep: {t:.3f}s")
        prepped = prep(alm_dev)
    alm = None if prepped is not None else alm_dev

    # representative blocks: first (deep cap), last cap-ish, mid belt, equator
    probe = sorted(set([0, nblk // 2 - 1, nblk // 2, nblk - 1]))

    leg = jax.jit(lambda pl, a, p: T._legendre_synth_dispatch(
        pl, a, True, prepped=p), static_argnums=0)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def rings_north(pl, qN, tok, j0, j1):
        sN = T._streams_from_q_rows(pl, qN[0].T, qN[1].T, qN[2].T,
                                    pl.sth_ring[j0:j1], pl.cot_ring[j0:j1])
        return T._synth_ring_rows(pl, sN, j0, j1)

    total_leg = total_ring = total_blk = 0.0
    for b in probe:
        j0, j1 = b * Jblk, (b + 1) * Jblk
        view = T._geo_view(plan, j0, j1)
        t_leg = timeit(leg, view, alm, prepped)
        qN, qS = leg(view, alm, prepped)
        t_ring = timeit(rings_north, plan, qN, 0.0, j0, j1)
        t_blk = timeit(T._synth_block_segments, plan, J, nrings,
                       (j0, j1), alm, prepped)
        npr = plan.npix_ring[j0]
        print(f"block {b:3d} rings[{j0}:{j1}] n0={npr}: "
              f"legendre={t_leg:.3f}s ring_north={t_ring:.3f}s "
              f"full_block(N+S)={t_blk:.3f}s")
        total_leg += t_leg
        total_ring += t_ring
        total_blk += t_blk

    est = total_blk / len(probe) * nblk
    print(f"probe sums: leg={total_leg:.3f} ringN={total_ring:.3f} "
          f"blk={total_blk:.3f}; est full synth ~{est:.1f}s ({nblk} blocks)")

    # --- analysis split ---
    maps = jnp.asarray(rng.normal(size=(plan.npix,)).astype(np.float32))
    t_rings = timeit(jax.jit(T.analysis_rings, static_argnums=0), plan, maps,
                     n=1)
    G = jax.jit(T.analysis_rings, static_argnums=0)(plan, maps)
    t_fold = timeit(jax.jit(T.fold_pairs, static_argnums=0), plan, G, n=1)
    E, O = T.fold_pairs(plan, G)
    if T._use_pallas(plan):
        from calclens_tpu.sht import pallas_legendre as PL
        t_legA = timeit(jax.jit(PL.analysis_pallas, static_argnums=0),
                        plan, E, O, n=1)
    else:
        t_legA = timeit(T.legendre_analysis, plan, E, O, n=1)
    print(f"analysis: rings={t_rings:.3f}s fold={t_fold:.3f}s "
          f"legendre={t_legA:.3f}s")


if __name__ == "__main__":
    main()
