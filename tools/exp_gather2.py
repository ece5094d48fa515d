#!/usr/bin/env python
"""Second round of gather probes: per-index vs per-row cost, batched windowed
gathers, and the 1M-table plateau."""
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


def main():
    key = jax.random.PRNGKey(0)
    N = 1 << 23

    # (a) per-index cost vs row count at full map size
    NP = 201326592 // 4   # quarter map to fit several tables
    for R in (7, 14, 16):
        tab = jax.block_until_ready(jax.jit(
            lambda k: jax.random.normal(k, (R, NP), jnp.float32))(key))
        idx = jax.block_until_ready(jax.jit(
            lambda k: jax.random.randint(k, (N,), 0, NP, jnp.int32))(key))
        t = timeit(jax.jit(lambda t_, ix: jnp.sum(t_[:, ix], 0)), tab, idx)
        print(f"a rows={R:2d} W={NP}: {N/t/1e6:6.0f} M idx/s ({t:.3f}s)",
              flush=True)
        del tab

    # (b) batched windowed gather: B tables of W, each with k indices
    for W, B in ((1 << 16, 128), (1 << 18, 32), (1 << 20, 16)):
        k = N // B
        tab = jax.block_until_ready(jax.jit(
            lambda ky: jax.random.normal(ky, (B, 7, W), jnp.float32))(key))
        idx = jax.block_until_ready(jax.jit(
            lambda ky: jax.random.randint(ky, (B, k), 0, W, jnp.int32))(key))
        f = jax.jit(jax.vmap(lambda t_, ix: jnp.sum(t_[:, ix], 0)))
        t = timeit(f, tab, idx)
        print(f"b batched W={W:>8} B={B:4d}: {N/t/1e6:6.0f} M idx/s "
              f"({t:.3f}s)", flush=True)
        del tab, idx

    # (c) confirm the 1M plateau and probe 2M/4M/512k
    for W in (1 << 19, 1 << 20, 1 << 21, 1 << 22, 1 << 23):
        tab = jax.block_until_ready(jax.jit(
            lambda ky: jax.random.normal(ky, (7, W), jnp.float32))(key))
        idx = jax.block_until_ready(jax.jit(
            lambda ky: jax.random.randint(ky, (N,), 0, W, jnp.int32))(key))
        t = timeit(jax.jit(lambda t_, ix: jnp.sum(t_[:, ix], 0)), tab, idx)
        print(f"c W={W:>8}: {N/t/1e6:6.0f} M idx/s ({t:.3f}s)", flush=True)
        del tab, idx


if __name__ == "__main__":
    main()
