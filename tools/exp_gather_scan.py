#!/usr/bin/env python
"""Gather throughput vs table size / layout / fused-index count on v5e.

Informs the windowed ray-interp design: if small-table gathers are several
times faster than whole-map gathers, the interp should window the map per
ray chunk (dynamic-slice) and gather locally."""
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


N = 1 << 23   # 8.4M indices
F = 7


def main():
    key = jax.random.PRNGKey(0)
    for W in (1 << 12, 1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 24,
              201326592):
        try:
            tabF = jax.block_until_ready(jax.jit(
                lambda k: jax.random.normal(k, (F, W), jnp.float32))(key))
            idx = jax.block_until_ready(jax.jit(
                lambda k: jax.random.randint(k, (N,), 0, W, jnp.int32))(key))
            t_col = timeit(jax.jit(lambda t, ix: t[:, ix]), tabF, idx)
            tabR = jax.block_until_ready(jax.jit(
                lambda t: jnp.pad(t.T, ((0, 0), (0, 1))))(tabF))
            t_row = timeit(jax.jit(lambda t, ix: t[ix]), tabR, idx)
            print(f"W={W:>11}: col[{F},W] {N/t_col/1e6:7.0f} M idx/s "
                  f"({t_col:.3f}s)   row[W,{F+1}] {N/t_row/1e6:7.0f} M idx/s "
                  f"({t_row:.3f}s)", flush=True)
            del tabF, tabR, idx
        except Exception as e:
            print(f"W={W}: failed {type(e).__name__} {str(e)[:150]}",
                  flush=True)

    # fused 4-tap vs separate at W=2^16
    W = 1 << 16
    tabR = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (W, 8), jnp.float32))(key))
    idx4 = jax.block_until_ready(jax.jit(
        lambda k: jax.random.randint(k, (4, N), 0, W, jnp.int32))(key))
    t_sep = timeit(jax.jit(
        lambda t, ix: sum(jnp.sum(t[ix[k]], 1) for k in range(4))),
        tabR, idx4)
    t_fus = timeit(jax.jit(
        lambda t, ix: jnp.sum(t[ix.reshape(-1)], 1)), tabR, idx4)
    print(f"4-tap W=65536: separate {4*N/t_sep/1e6:7.0f} M idx/s "
          f"fused {4*N/t_fus/1e6:7.0f} M idx/s", flush=True)

    # does sortedness help at small W?
    idxs = jax.block_until_ready(jax.jit(
        lambda ix: jnp.sort(ix))(idx4[0]))
    t_sort = timeit(jax.jit(lambda t, ix: jnp.sum(t[ix], 1)), tabR, idxs)
    print(f"sorted W=65536: {N/t_sort/1e6:7.0f} M idx/s", flush=True)


if __name__ == "__main__":
    main()
