#!/usr/bin/env python
"""Stage-level timing of the streamed 6-map synthesis at a given order.

Splits one production j-block (and the whole streamed transform) into:
  legendre : MX Pallas kernel (alm -> qN/qS for the block's rings)
  streams  : covariant-corrected 6-stream assembly in ring-row space
  rings    : ring-space DFTs (belt irfft + cap chirp-Z) + segment gather
so the next kernel target is chosen from data, not guesswork
(docs/TPU_NOTES.md "Known next levers").
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

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T


def force(x):
    if isinstance(x, (tuple, list)):
        return [force(v) for v in x]
    # complex64 cannot cross device->host on this runtime: reduce to a real
    # scalar inside jit before fetching (docs/TPU_NOTES.md)
    s = jnp.abs(jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim))
    return float(jnp.real(jnp.sum(s)))


def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    order = int(os.environ.get("O", 12))
    plan = SHTPlan(order, dtype=jnp.float32)
    nblk = T._synth_stream_blocks(plan)
    J, nrings = plan.J, plan.nrings
    Jblk = J // nblk
    print(f"order {order}: nl={plan.nl} nm={plan.nm} J={J} nblk={nblk} "
          f"Jblk={Jblk}", flush=True)

    rng = np.random.default_rng(0)
    re_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    im_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    alm = jax.jit(lambda a, b: (a + 1j * b) / (1.0 + jnp.arange(
        plan.nl, dtype=jnp.float32)[:, None] ** 2))(re_, im_)
    alm = jax.block_until_ready(alm)

    from calclens_tpu.sht import pallas_legendre_mx as MX
    from functools import partial

    prep = jax.jit(partial(MX.mx_prep, plan.nl, plan.nm, derivs=True))
    prepped = jax.block_until_ready(prep(alm))

    # one mid-sphere j-block (belt rings) and one polar block (cap rings)
    for name, b in (("polar block (caps)", 0),
                    ("belt block", nblk // 2),
                    ("last block (equator)", nblk - 1)):
        j0, j1 = b * Jblk, (b + 1) * Jblk
        view = T._geo_view(plan, j0, j1)

        leg = jax.jit(lambda pp: T._legendre_synth_dispatch(
            view, None, True, prepped=pp))
        t_leg = timeit(leg, prepped)

        qN, qS = jax.block_until_ready(leg(prepped))

        def streams_n(q):
            return T._streams_from_q_rows(plan, q[0].T, q[1].T, q[2].T,
                                          plan.sth_ring[j0:j1],
                                          plan.cot_ring[j0:j1])
        streams_j = jax.jit(streams_n)
        t_str = timeit(streams_j, qN)
        sN = jax.block_until_ready(streams_j(qN))

        rings_j = jax.jit(lambda s: T._synth_ring_rows(plan, s, j0, j1))
        t_rng = timeit(rings_j, sN)

        full = jax.jit(lambda pp: T._synth_block_segments(
            plan, J, nrings, (j0, j1), None, pp, None))
        t_all = timeit(full, prepped)

        print(f"{name} [{j0},{j1}): legendre {t_leg:.3f}s  streams "
              f"{t_str:.3f}s  rings(1side) {t_rng:.3f}s  "
              f"block(NS) {t_all:.3f}s", flush=True)

    # whole streamed synthesis
    t0 = time.perf_counter()
    out = T.alm2allmaps_host_streamed(plan, alm, nblk)
    force(out)
    print(f"full streamed synthesis: {time.perf_counter()-t0:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
