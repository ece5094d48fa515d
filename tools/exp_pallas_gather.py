#!/usr/bin/env python
"""Probe Mosaic's in-kernel gather abilities on the v5e before designing the
ray-interp kernel (docs/TPU_NOTES.md 'Pallas ray-interpolation kernel').

Candidates:
  A. in-kernel fancy indexing / take_along_axis from a VMEM-resident table
  B. one-hot MXU contraction gather (two-level: segment matmul + lane select)
  C. XLA baseline gather at the same shapes
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


N = 1 << 23          # rays per call (8.4M)
W = 4096             # VMEM window pixels per block
BN = 2048            # rays per grid block
F = 8                # fields (padded 7 -> 8)


def main():
    key = jax.random.PRNGKey(0)
    tableT = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (W, F), jnp.float32))(key))
    # local offsets within the window
    idx = jax.block_until_ready(jax.jit(
        lambda k: jax.random.randint(k, (N,), 0, W, jnp.int32))(key))

    # ---- C. XLA gather baseline at this shape
    def xla_gather(t, ix):
        return t[ix]  # [N, F]
    try:
        t = timeit(jax.jit(xla_gather), tableT, idx)
        print(f"C xla row-gather [W,F] ({N/t/1e6:.0f} M idx/s): {t:.3f}s",
              flush=True)
    except Exception as e:
        print(f"C failed: {e}", flush=True)

    # ---- A. pallas in-kernel dynamic indexing
    def kern_a(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:]                    # [BN] int32
        g = tab_ref[ix]                    # fancy index on sublane dim?
        out_ref[:] = g

    def pallas_a(tab, ix):
        return pl.pallas_call(
            kern_a,
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(ix, tab)
    try:
        t = timeit(jax.jit(pallas_a), tableT, idx)
        print(f"A pallas fancy-index ({N/t/1e6:.0f} M idx/s): {t:.3f}s",
              flush=True)
    except Exception as e:
        print(f"A failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- A2: take_along_axis on lane dim, table [F, W]
    tableF = jax.block_until_ready(jax.jit(lambda t: t.T.copy())(tableT))

    def kern_a2(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:]                        # [1, BN]
        ixb = jnp.broadcast_to(ix, (F, BN))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ixb, axis=1)

    def pallas_a2(tab, ix):
        return pl.pallas_call(
            kern_a2,
            out_shape=jax.ShapeDtypeStruct((F, N), jnp.float32),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((1, BN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(ix, tab)
    try:
        t = timeit(jax.jit(pallas_a2), tableF, idx[None, :])
        print(f"A2 pallas take_along_axis lane ({N/t/1e6:.0f} M idx/s): {t:.3f}s",
              flush=True)
    except Exception as e:
        print(f"A2 failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- B. two-level one-hot: segment matmul (MXU) + lane select
    NSEG = W // 128

    def kern_b(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:]                     # [BN] int32
        seg = ix // 128                     # [BN]
        off = ix % 128
        segs = jax.lax.broadcasted_iota(jnp.int32, (BN, NSEG), 1)
        E1 = (seg[:, None] == segs).astype(jnp.bfloat16)     # [BN, NSEG]
        # rows: [BN, 128] per field — do all F at once: tab [NSEG, 128*F]
        rows = jnp.dot(E1, tab_ref[:].reshape(NSEG, 128 * F),
                       preferred_element_type=jnp.float32)   # [BN, 128F]
        rows = rows.reshape(BN, 128, F)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BN, 128), 1)
        E2 = (off[:, None] == lanes).astype(jnp.float32)     # [BN, 128]
        out_ref[:] = jnp.sum(rows * E2[:, :, None], axis=1)

    def pallas_b(tab, ix):
        return pl.pallas_call(
            kern_b,
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(ix, tab)
    try:
        t = timeit(jax.jit(pallas_b), tableT, idx)
        print(f"B pallas one-hot 2-level ({N/t/1e6:.0f} M idx/s): {t:.3f}s",
              flush=True)
    except Exception as e:
        print(f"B failed: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
