#!/usr/bin/env python
"""Time the full host-streamed synthesis under different block/pipeline
knobs (CALCLENS_SYNTH_STREAM, CALCLENS_SYNTH_PIPELINE, CALCLENS_CZT_CACHE).

Env: O (order, default 12), NBLK (comma list, default "16,8"),
DEPTH (comma list, default "2,3")."""
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


def main():
    order = int(os.environ.get("O", 12))
    nblks = [int(v) for v in os.environ.get("NBLK", "16,8").split(",")]
    depths = [int(v) for v in os.environ.get("DEPTH", "2,3").split(",")]
    plan = SHTPlan(order, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    re_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    im_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    mk_alm = jax.jit(lambda a, b: (a + 1j * b) / (1.0 + jnp.arange(
        plan.nl, dtype=jnp.float32)[:, None] ** 1.5))

    for nblk in nblks:
        for depth in depths:
            os.environ["CALCLENS_SYNTH_PIPELINE"] = str(depth)
            ts = []
            for it in range(3):
                alm = jax.block_until_ready(mk_alm(re_, im_))
                t0 = time.perf_counter()
                out = T.alm2allmaps_host_streamed(plan, alm, nblk)
                float(jnp.sum(out[0, :1]))
                ts.append(time.perf_counter() - t0)
                del out, alm
            print(f"order {order} nblk={nblk} depth={depth}: "
                  f"{min(ts):.3f}s (all: {[round(t, 3) for t in ts]})",
                  flush=True)


if __name__ == "__main__":
    main()
