#!/usr/bin/env python
"""Roofline statement for the two Pallas Legendre kernels (VERDICT r4 #2).

"The recurrence is the wall" must be falsifiable: this tool
  1. measures SYNTHETIC ceilings on the same tile shapes as the production
     kernels — (a) the bare dependent 3-term recurrence with hoisted
     coefficients and NO stores (the pure-arithmetic ceiling for this
     dependency pattern), (b) the same loop with the per-degree lambda-tile
     store (the store-bound ceiling), (c) the 6-pass HIGHEST MXU stream
     contraction alone;
  2. measures the PRODUCTION kernels at the order-12 bench shapes (one belt
     j-block and one polar j-block of the streamed synthesis; the full
     analysis sweep) and counts their computed elements exactly (triangular
     l-block skip + turning-point m cutoffs);
  3. prints effective FLOP/s / store GB/s and the utilization of each
     kernel against its binding synthetic ceiling.

A kernel at >= ~80% of ceiling (a)+(b) is done-by-measurement: the
remaining time IS the recurrence+store pattern at the speed this hardware
executes it.  A kernel well below ceiling points at dispatch/grid overheads
as the next lever.  Numbers land in BASELINE.md.
"""
import os
import sys
import time
from functools import partial

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
    if isinstance(x, (tuple, list)):
        return [force(v) for v in x]
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


# ---------------------------------------------------------------------------
# synthetic ceilings (same tile shapes as pallas_legendre_mx fast path)
# ---------------------------------------------------------------------------

def _probe_kernel(LB, TM, TJ, mode, geo_ref, out_ref, p_scr, pp_ref, pc_ref):
    """mode: 'rec' = bare recurrence, 'rec+store' = with per-degree store,
    'store' = stores only (constant value), 'dot' = MXU contraction only."""
    lb = pl.program_id(1)
    cth = geo_ref[0:1, :]

    @pl.when(lb == 0)
    def _init():
        pp_ref[...] = jnp.zeros_like(pp_ref)
        pc_ref[...] = jnp.full_like(pc_ref, 0.5)
        out_ref[...] = jnp.zeros_like(out_ref)

    mi = pl.program_id(0)
    mf = (mi * TM + jax.lax.broadcasted_iota(
        jnp.int32, (TM, 1), 0)).astype(jnp.float32)
    lf_blk = (lb * LB + jax.lax.broadcasted_iota(
        jnp.int32, (TM, LB), 1)).astype(jnp.float32) + 1.0
    den = jnp.maximum((lf_blk - mf) * (lf_blk + mf), 1.0)
    a_blk = jnp.sqrt((2.0 * lf_blk - 1.0) * (2.0 * lf_blk + 1.0) / den)
    b_blk = jnp.sqrt(jnp.maximum((lf_blk - 1.0 - mf) * (lf_blk - 1.0 + mf),
                                 0.0)
                     / jnp.maximum((2.0 * lf_blk - 3.0)
                                   * (2.0 * lf_blk - 1.0), 1.0))

    if mode == "dot":
        l_row = jax.lax.broadcasted_iota(jnp.int32, (TM, 1, LB), 2)
        S = jnp.concatenate([l_row.astype(jnp.float32) * (0.01 * k + 1.0)
                             for k in range(16)], axis=1)
        out_ref[...] += jax.lax.dot_general(
            S, p_scr[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return

    pp = pp_ref[...]
    pc = pc_ref[...]
    for i in range(LB):
        if mode == "store":
            p_scr[:, i: i + 1, :] = pc[:, None, :]
            continue
        a = a_blk[:, i: i + 1]
        b = b_blk[:, i: i + 1]
        new = a * (cth * pc - b * pp)
        if mode == "rec+store":
            p_scr[:, i: i + 1, :] = new[:, None, :]
        pp, pc = pc, new
    pp_ref[...] = pp
    pc_ref[...] = pc

    n_lb = pl.num_programs(1)

    @pl.when(lb == n_lb - 1)
    def _emit():
        if mode == "store":
            out_ref[...] += p_scr[:, 0:1, :][:, 0]
        else:
            out_ref[...] += pc_ref[...]


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _probe(MT, LBLK, LB, TM, TJ, mode, geo):
    kern = partial(_probe_kernel, LB, TM, TJ, mode)
    ncol = 16 if mode == "dot" else TM  # out shape row dim
    out_shape = ((TM, 16, TJ) if mode == "dot" else (TM, TJ))
    return pl.pallas_call(
        kern,
        grid=(MT, LBLK),
        in_specs=[pl.BlockSpec((5, TJ), lambda m, lb: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((MT,) + out_shape, jnp.float32),
        out_specs=pl.BlockSpec((1,) + out_shape,
                               lambda m, lb: (m,) + (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TM, LB, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
        ],
    )(geo)


def ceilings(TM=32, TJ=256, LB=128, MT=96, LBLK=64):
    geo = jnp.asarray(np.random.default_rng(0).uniform(
        -0.9, 0.9, (5, TJ)).astype(np.float32))
    elems = MT * LBLK * TM * LB * TJ
    out = {}
    for mode, label in (("rec", "recurrence only      "),
                        ("rec+store", "recurrence + store   "),
                        ("store", "stores only          "),
                        ("dot", "MXU 16-col dot HIGHEST")):
        t = timeit(lambda g, m=mode: _probe(MT, LBLK, LB, TM, TJ, m, g), geo)
        flop = {"rec": 4, "rec+store": 4, "store": 0, "dot": 16 * 2}[mode]
        line = (f"ceiling {label}: {t:.4f}s "
                f"{elems / t / 1e9:8.1f} G elem/s")
        if flop:
            line += f"  {elems * flop / t / 1e12:6.2f} TFLOP/s(x{flop})"
        if "store" in mode:
            line += f"  {elems * 4 / t / 1e9:7.0f} GB/s stored"
        print(line, flush=True)
        out[mode] = (t, elems)
    return out


# ---------------------------------------------------------------------------
# production kernel measurements at order-12 bench shapes
# ---------------------------------------------------------------------------

def _mx_elements(nl_pad, nm_eff, TM, LB, TJ_pad):
    """Computed elements of the MX synthesis grid: per m-tile, l-blocks from
    floor(m0/LB) (triangular skip); every element of a visited block counts
    (masked elements still execute)."""
    tot = 0
    for mi in range(-(-nm_eff // TM)):
        lb_act = (mi * TM) // LB
        nlb = nl_pad // LB - lb_act
        tot += nlb * TM * LB * TJ_pad
    return tot


def production(order=12):
    from calclens_tpu.sht.plan import SHTPlan
    from calclens_tpu.sht import transforms as T
    from calclens_tpu.sht import pallas_legendre_mx as MX
    from calclens_tpu.sht import pallas_legendre as PL

    plan = SHTPlan(order, dtype=jnp.float32)
    nblk = T._synth_stream_blocks(plan)
    J = plan.J
    Jblk = J // nblk
    rng = np.random.default_rng(0)
    re_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    im_ = jnp.asarray(rng.normal(size=(plan.nl, plan.nm)).astype(np.float32))
    alm = jax.jit(lambda a, b: (a + 1j * b) / (1.0 + jnp.arange(
        plan.nl, dtype=jnp.float32)[:, None] ** 2))(re_, im_)
    prep = jax.jit(partial(MX.mx_prep, plan.nl, plan.nm, derivs=True))
    prepped = jax.block_until_ready(prep(alm))

    TM, LB = 32, 128
    print(f"\n== production MX synthesis, order {order}, nblk={nblk} ==",
          flush=True)
    for name, b in (("belt block ", nblk - 1), ("polar block", 0)):
        j0, j1 = b * Jblk, (b + 1) * Jblk
        view = T._geo_view(plan, j0, j1)
        mcut = getattr(view, "mcut", plan.nm)
        TJ_pad = max(-(-Jblk // 128) * 128, 128)
        nl_pad = -(-plan.nl // LB) * LB
        nm_eff = min(plan.nm, mcut)
        elems = _mx_elements(nl_pad, nm_eff, TM, LB, TJ_pad)
        leg = jax.jit(lambda pp, v=view: T._legendre_synth_dispatch(
            v, None, True, prepped=pp))
        t = timeit(leg, prepped)
        print(f"{name} j[{j0}:{j1}] mcut={mcut}: {t:.4f}s  "
              f"{elems / t / 1e9:6.1f} G elem/s  "
              f"rec {elems * 4 / t / 1e12:5.2f} TFLOP/s  "
              f"store {elems * 4 / t / 1e9:6.0f} GB/s  "
              f"mxu(6pass bf16) {elems * 16 * 2 * 6 / t / 1e12:5.1f} TFLOP/s",
              flush=True)

    # analysis sweep (VPU kernel): whole transform's Legendre part
    print(f"\n== production VPU analysis, order {order} ==", flush=True)
    E = jnp.asarray(rng.normal(size=(plan.nm, plan.J)).astype(np.float32))
    O = jnp.asarray(rng.normal(size=(plan.nm, plan.J)).astype(np.float32))
    Ec = jax.block_until_ready(jax.jit(lambda x: x.astype(jnp.complex64))(E))
    Oc = jax.block_until_ready(jax.jit(lambda x: x.astype(jnp.complex64))(O))
    ana = jax.jit(lambda e, o: PL.analysis_pallas(plan, e, o))
    t = timeit(ana, Ec, Oc)
    # elements: same triangular structure, j tiled over the whole J
    TMa, LBa, TJa = 32, 128, 512
    J_pad = -(-plan.J // TJa) * TJa
    nl_pad = -(-plan.nl // LBa) * LBa
    # per j-tile mcut: analysis skips (m-tile, j-tile) pairs beyond the
    # turning point; approximate with the exact per-tile active count
    sth = np.asarray(plan.sth)
    elems = 0
    for jt in range(J_pad // TJa):
        s = sth[jt * TJa: (jt + 1) * TJa]
        mc = T.m_cutoff(plan.nl - 1, float(s.max()) if len(s) else 0.0,
                        plan.nm)
        elems += _mx_elements(nl_pad, mc, TMa, LBa, TJa) // (J_pad // TJa) \
            if False else 0
        for mi in range(-(-mc // TMa)):
            lb_act = (mi * TMa) // LBa
            elems += (nl_pad // LBa - lb_act) * TMa * LBa * TJa
    print(f"analysis Legendre sweep: {t:.4f}s  {elems / t / 1e9:6.1f} "
          f"G elem/s  ~10 op/elem -> {elems * 10 / t / 1e12:5.2f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    print("== synthetic ceilings (TM=32 TJ=256 LB=128) ==", flush=True)
    ceilings()
    production(int(os.environ.get("O", 12)))
