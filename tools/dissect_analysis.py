"""Dissect the analysis ring stage: belt rfft vs each cap chirp-Z bucket,
with each czt further split into table build vs transform, plus the block
gather and the final phase multiply.

Usage: python tools/dissect_analysis.py [order] [lmax]
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
from calclens_tpu.sht.czt import czt, czt_tables


def force(x):
    if isinstance(x, (tuple, list)):
        for y in x:
            force(y)
        return x
    np.asarray(jax.device_get(jnp.real(
        jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim)).astype(jnp.float32)))
    return x


def timeit(fn, *args, n=3, **kw):
    force(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn(*args, **kw))
    return (time.perf_counter() - t0) / n


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 3 * (1 << order) - 1
    plan = SHTPlan(order=order, lmax=lmax)
    rs = T._ring_stage(plan)
    print(f"order={order} nm={plan.nm} nrings={rs.nrings} B={rs.B}")
    for b in rs.abuckets:
        print(f"  abucket rows={len(b['rows'])} rows_pad={b['rows_pad']} "
              f"nmax={b['nmax']} K={b['K']} L={b['L']} nbl={b['nbl']} "
              f"Nk={b['Nk']}")
    rng = np.random.default_rng(7)
    maps = jnp.asarray(rng.normal(size=(rs.npix,)).astype(np.float32))

    # full analysis
    t_full = timeit(jax.jit(rs.analysis), maps, n=2)
    print(f"analysis total: {t_full:.3f}s")

    # belt only
    @jax.jit
    def belt(m):
        ne = len(rs.eq_rows)
        p0 = int(rs.startpix[rs.eq_rows[0]])
        Xe = m[p0: p0 + ne * rs.P].reshape(ne, rs.P)
        Fh = jnp.fft.rfft(Xe, axis=-1)
        H = rs.P // 2 + 1
        if rs.nm <= H:
            return Fh[..., :rs.nm]
        folded = jnp.conj(jnp.flip(Fh[..., rs.P - rs.nm + 1: rs.P - H + 1],
                                   axis=-1))
        return jnp.concatenate([Fh, folded], axis=-1)

    t_belt = timeit(belt, maps, n=2)
    print(f"belt rfft+unfold: {t_belt:.3f}s")

    # per-bucket: gather, czt tables, czt transform
    for i, b in enumerate(rs.abuckets):
        gather = jax.jit(lambda m, b=b: rs._gather_rows_blocked(m, b))
        t_g = timeit(gather, maps, n=2)
        K = b.get("K", rs.nm)
        N = b["nbl"] * rs.B
        nrow = jnp.asarray(b["n"])

        tab_fn = jax.jit(lambda n=nrow, b=b: czt_tables(
            n, N, K, b["L"], -1, rs.cdtype, Nk=b["Nk"]))
        t_tab = timeit(tab_fn, n=2)
        tabs = tab_fn()

        Xb = gather(maps)

        def tr(x, tabs=tabs, b=b, K=K):
            return czt(x, jnp.asarray(b["n"]), K=K, L=b["L"], sign=-1,
                       cdtype=rs.cdtype, tables=tabs, Nk=b["Nk"])
        t_tr = timeit(jax.jit(tr), Xb, n=2)

        def czt_all(x, b=b, K=K):
            return czt(x, jnp.asarray(b["n"]), K=K, L=b["L"], sign=-1,
                       cdtype=rs.cdtype, Nk=b["Nk"])
        t_all = timeit(jax.jit(czt_all), Xb, n=2)
        print(f"bucket {i}: rows={b['rows_pad']} L={b['L']} K={K} "
              f"gather={t_g:.3f}s tables={t_tab:.3f}s czt(tabs)={t_tr:.3f}s "
              f"czt(full)={t_all:.3f}s")

    # phase multiply
    G = jax.jit(rs.analysis)(maps)
    ph_fn = jax.jit(lambda g: g * rs._phase_analysis())
    t_ph = timeit(ph_fn, G, n=2)
    print(f"phase multiply: {t_ph:.3f}s")


if __name__ == "__main__":
    main()
