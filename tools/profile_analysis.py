"""Analysis-stage-only profile (ring DFT / fold / Legendre split).

Split out of profile_synth.py so the analysis levers can be measured
without paying the (much longer) streamed-synthesis probe compiles.

Usage: python tools/profile_analysis.py [order]
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


def force(x):
    if isinstance(x, (tuple, list)):
        for y in x:
            if y is not None:
                force(y)
        return x
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
    print(f"order={order} nl={plan.nl} nm={plan.nm} "
          f"device={jax.devices()[0].platform}")
    rng = np.random.default_rng(7)

    maps = jnp.asarray(rng.normal(size=(plan.npix,)).astype(np.float32))
    t_rings = timeit(jax.jit(T.analysis_rings, static_argnums=0), plan, maps,
                     n=2)
    G = jax.jit(T.analysis_rings, static_argnums=0)(plan, maps)
    t_fold = timeit(jax.jit(T.fold_pairs, static_argnums=0), plan, G, n=2)
    E, O = T.fold_pairs(plan, G)
    if T._use_pallas(plan):
        from calclens_tpu.sht import pallas_legendre as PL
        t_legA = timeit(jax.jit(PL.analysis_pallas, static_argnums=0),
                        plan, E, O, n=2)
    else:
        t_legA = timeit(T.legendre_analysis, plan, E, O, n=2)
    tot = t_rings + t_fold + t_legA
    print(f"analysis: rings={t_rings:.3f}s fold={t_fold:.3f}s "
          f"legendre={t_legA:.3f}s total={tot:.3f}s")


if __name__ == "__main__":
    main()
