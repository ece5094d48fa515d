#!/usr/bin/env python
"""Micro-benchmark of the MX Legendre synthesis kernel on one belt j-block.

Env: O (order, default 12), CALCLENS_MX_PRECISION (HIGH/HIGHEST/DEFAULT).
Prints the block time and, when CHECK=1, max relative error of the q
streams vs a HIGHEST-precision run (same kernel, precision only)."""
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
    s = jnp.abs(jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim))
    return float(jnp.real(jnp.sum(s)))


def main():
    order = int(os.environ.get("O", 12))
    plan = SHTPlan(order, dtype=jnp.float32)
    nblk = T._synth_stream_blocks(plan)
    Jblk = plan.J // nblk

    rng = np.random.default_rng(0)
    re_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    im_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    alm = jax.block_until_ready(jax.jit(
        lambda a, b: (a + 1j * b) / (1.0 + jnp.arange(
            plan.nl, dtype=jnp.float32)[:, None] ** 1.5))(re_, im_))

    from calclens_tpu.sht import pallas_legendre_mx as MX
    from functools import partial

    prep = jax.jit(partial(MX.mx_prep, plan.nl, plan.nm, derivs=True))
    prepped = jax.block_until_ready(prep(alm))

    b = nblk // 2
    j0, j1 = b * Jblk, (b + 1) * Jblk
    view = T._geo_view(plan, j0, j1)

    leg = jax.jit(lambda pp: T._legendre_synth_dispatch(
        view, None, True, prepped=pp))
    force(leg(prepped))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        force(leg(prepped))
        ts.append(time.perf_counter() - t0)
    prec = os.environ.get("CALCLENS_MX_PRECISION", "HIGH")
    print(f"order {order} belt block [{j0},{j1}) precision={prec}: "
          f"{min(ts):.3f}s", flush=True)

    if os.environ.get("CHECK", "0") == "1":
        qN, qS = leg(prepped)
        parts = jax.device_get(jax.jit(lambda a, b: (
            jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)))(qN, qS))
        np.save(f"/tmp/mb_mx_q_{prec}.npy", np.stack(parts))
        print(f"saved /tmp/mb_mx_q_{prec}.npy", flush=True)


if __name__ == "__main__":
    main()
