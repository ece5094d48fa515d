"""Pallas TPU kernels for the associated-Legendre scan (the SHT hot loop).

The XLA scan in transforms.py round-trips the [nm, J] recurrence state and
six accumulators through HBM on every unrolled l-block; these kernels keep
everything in VMEM scratch across the whole l sweep and stream only the alm
rows (synthesis) / write only the alm rows (analysis), making the sweep
VPU-bound instead of HBM-bound.

Two structural tricks versus the straight port:
  * parity bucketing: (l+m) even  <=>  l = m (mod 2), so contributions are
    accumulated unconditionally into l-even / l-odd buckets A and B with NO
    per-element parity select; outside the kernel qN = A + B and
    qS = s_m (A - B) with s_m = +-1 by m parity (and the d_theta kernel's
    south sign flip folded in, transforms.py legendre_synthesis).
  * grid = (m_tiles, j_tiles, l_blocks) with the l axis innermost: the
    recurrence state lives in VMEM scratch that persists across sequential
    grid steps, and the alm row block [LB, TM] is auto double-buffered by
    the BlockSpec pipeline.

Underflow control is the same power-of-2^64 scale counter as the scan
version (reference plmgen rescaling, healpix_plmgen.c:73-239).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH_BIG = 2.0**32
_RESC = 2.0**-64
_TINY = 2.0**-64


def _row_coeffs(lf, mf):
    """Recurrence coefficients a, b for one l over the m tile [TM, 1]."""
    den = jnp.maximum((lf - mf) * (lf + mf), 1.0)
    a = jnp.sqrt((2.0 * lf - 1.0) * (2.0 * lf + 1.0) / den)
    bnum = jnp.maximum((lf - 1.0 - mf) * (lf - 1.0 + mf), 0.0)
    bden = jnp.maximum((2.0 * lf - 3.0) * (2.0 * lf - 1.0), 1.0)
    b = jnp.sqrt(bnum / bden)
    return a, b


def _synth_kernel(nl, LB, TM, TJ, derivs,
                  almre_ref, almim_ref, geo_ref,
                  *refs):
    """Grid (m_tiles, j_tiles, l_blocks).  geo_ref rows: cth, sth, cot,
    inv_sth [4, TJ].  Outputs: nacc pairs of (re, im) accumulators [TM, TJ]
    where nacc = 2 (phi A/B) or 6 (phi, dth, dthth each A/B).  Scratch:
    accs [nacc*2, TM, TJ], pp, pc [TM, TJ], k [TM, TJ] i32,
    seed [1, TJ], seedk [1, TJ] i32.
    """
    nacc = 6 if derivs else 2
    out_refs = refs[: 2 * nacc]
    accs, pp_ref, pc_ref, k_ref, seed_ref, seedk_ref = refs[2 * nacc:]

    mi = pl.program_id(0)
    lb = pl.program_id(2)
    n_lb = pl.num_programs(2)

    cth = geo_ref[0:1, :]
    sth = geo_ref[1:2, :]
    cot = geo_ref[2:3, :]
    inv_sth = geo_ref[3:4, :]

    m_vec = (mi * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0))
    mf = m_vec.astype(jnp.float32)
    mf2 = mf * mf

    @pl.when(lb == 0)
    def _init():
        accs[...] = jnp.zeros_like(accs)
        pp_ref[...] = jnp.zeros_like(pp_ref)
        pc_ref[...] = jnp.zeros_like(pc_ref)
        k_ref[...] = jnp.zeros_like(k_ref)
        seed_ref[...] = jnp.full_like(seed_ref, 0.28209479177387814)  # 1/sqrt(4pi)
        seedk_ref[...] = jnp.zeros_like(seedk_ref)

    def body(i, _):
        l_int = lb * LB + i
        lf = l_int.astype(jnp.float32)

        pp = pp_ref[...]
        pc = pc_ref[...]
        k = k_ref[...]
        seed = seed_ref[...]
        seedk = seedk_ref[...]

        a, b = _row_coeffs(lf, mf)
        new = a * (cth * pc - b * pp)

        seed_row = m_vec == l_int
        inactive = m_vec > l_int
        new = jnp.where(seed_row, seed, jnp.where(inactive, 0.0, new))
        prev = jnp.where(seed_row | inactive, 0.0, pc)
        k_new = jnp.where(seed_row, seedk.astype(jnp.int32), k)

        big = jnp.abs(new) > _TH_BIG
        new = jnp.where(big, new * _RESC, new)
        prev = jnp.where(big, prev * _RESC, prev)
        k_new = k_new + big.astype(jnp.int32)

        corfac = jnp.where(k_new == 0, 1.0,
                           jnp.where(k_new == -1, _RESC, 0.0))
        lam = new * corfac
        lam_prev = prev * corfac

        # seed chain for l+1
        seed2 = seed * sth * jnp.sqrt((2.0 * lf + 3.0) / (2.0 * lf + 2.0))
        under = seed2 < _TINY
        seed_ref[...] = jnp.where(under, seed2 / _RESC, seed2)
        seedk_ref[...] = seedk - under.astype(jnp.int32)

        pp_ref[...] = prev
        pc_ref[...] = new
        k_ref[...] = k_new

        # accumulate into the l-parity bucket: slot base = (l%2) * nacc
        par = jnp.remainder(l_int, 2)
        are = almre_ref[i, :][:, None]   # [TM, 1]
        aim = almim_ref[i, :][:, None]

        def acc_into(slot, val):
            idx = par * nacc + slot
            accs[idx] += val

        acc_into(0, are * lam)
        acc_into(1, aim * lam)
        if derivs:
            c = jnp.sqrt(jnp.maximum((lf - mf) * (lf + mf), 0.0)
                         * (2.0 * lf + 1.0)
                         / jnp.maximum(2.0 * lf - 1.0, 1.0))
            lamp = lf * cot * lam - c * lam_prev * inv_sth
            lampp = (mf2 * inv_sth * inv_sth - lf * (lf + 1.0)) * lam \
                - cot * lamp
            acc_into(2, are * lamp)
            acc_into(3, aim * lamp)
            acc_into(4, are * lampp)
            acc_into(5, aim * lampp)
        return 0

    nl_here = jnp.minimum(nl - lb * LB, LB)
    jax.lax.fori_loop(0, nl_here, body, 0)

    @pl.when(lb == n_lb - 1)
    def _write():
        for s in range(nacc):
            out_refs[2 * s][...] = accs[s]          # l-even bucket (A)
            out_refs[2 * s + 1][...] = accs[nacc + s]  # l-odd bucket (B)


@partial(jax.jit, static_argnums=(0, 4, 5))
def _synthesis_buckets(plan_key, almre, almim, geo, nl, derivs):
    """plan_key = (nl_pad, nm_pad, J_pad, LB, TM, TJ).  Returns list of
    [nm_pad, J_pad] bucket arrays (A, B per kernel, re/im interleaved)."""
    nl_pad, nm_pad, J_pad, LB, TM, TJ = plan_key
    nacc = 6 if derivs else 2
    grid = (nm_pad // TM, J_pad // TJ, nl_pad // LB)

    out_shapes = [jax.ShapeDtypeStruct((nm_pad, J_pad), jnp.float32)
                  for _ in range(2 * nacc)]
    out_specs = [pl.BlockSpec((TM, TJ), lambda m, j, lb: (m, j),
                              memory_space=pltpu.VMEM)
                 for _ in range(2 * nacc)]
    kern = partial(_synth_kernel, nl, LB, TM, TJ, derivs)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LB, TM), lambda m, j, lb: (lb, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, TM), lambda m, j, lb: (lb, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TJ), lambda m, j, lb: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * nacc, TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.int32),
            pltpu.VMEM((1, TJ), jnp.float32),
            pltpu.VMEM((1, TJ), jnp.int32),
        ],
    )(almre, almim, geo)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def synthesis_pallas(plan, alm, derivs: bool, TM=128, TJ=512, LB=256):
    """Drop-in replacement for transforms.legendre_synthesis on TPU.

    Returns (qN, qS) each [nkern, nm, J] complex64.
    """
    nl, nm, J = plan.nl, plan.nm, plan.J
    TM, TJ = min(TM, 128), min(TJ, max(J, 128))
    nm_pad = -(-nm // TM) * TM
    J_pad = -(-J // TJ) * TJ
    nl_pad = -(-nl // LB) * LB

    almre = _pad_to(_pad_to(jnp.real(alm).astype(jnp.float32), nl_pad, 0), nm_pad, 1)
    almim = _pad_to(_pad_to(jnp.imag(alm).astype(jnp.float32), nl_pad, 0), nm_pad, 1)
    geo = jnp.stack([
        _pad_to(plan.cth.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.sth.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.cot.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.inv_sth.astype(jnp.float32), J_pad, 0),
    ])

    key = (nl_pad, nm_pad, J_pad, LB, TM, TJ)
    buckets = _synthesis_buckets(key, almre, almim, geo, nl, derivs)

    s_m = (1 - 2 * (jnp.arange(nm, dtype=jnp.int32) % 2)).astype(jnp.float32)[:, None]
    nkern = 3 if derivs else 1

    qN, qS = [], []
    for kidx in range(nkern):
        Are = buckets[4 * kidx][:nm, :J]
        Bre = buckets[4 * kidx + 1][:nm, :J]
        Aim = buckets[4 * kidx + 2][:nm, :J]
        Bim = buckets[4 * kidx + 3][:nm, :J]
        # bucket layout: outputs ordered (slot0 A, slot0 B, slot1 A, slot1 B..)
        # slot 2k = re of kernel k, slot 2k+1 = im of kernel k
        qn = (Are + Bre) + 1j * (Aim + Bim)
        qs = s_m * ((Are - Bre) + 1j * (Aim - Bim))
        if kidx == 1:  # d_theta flips sign on the south ring
            qs = -qs
        qN.append(qn.astype(plan.cdtype))
        qS.append(qs.astype(plan.cdtype))
    return jnp.stack(qN), jnp.stack(qS)


# ---------------------------------------------------------------------------
# analysis: alm[l, m] = sum_j lam_lm(theta_j) * src[m, j]
# ---------------------------------------------------------------------------

def _analysis_kernel(nl, LB, TM, TJ, RS,
                     mcut_ref, ere_ref, eim_ref, ore_ref, oim_ref, geo_ref,
                     logc_ref,
                     almre_ref, almim_ref,
                     s0re, s0im, s1re, s1im,
                     pp_ref, pc_ref, k_ref):
    """Grid (m_tiles, j_tiles, l_blocks); alm output blocks [LB, TM] are
    accumulated across the j grid dimension (init at j == 0).

    Parity handling: the source for row m at degree l is E when (l+m) even
    else O, i.e. for l even src = (m even ? E : O) =: S0 and for l odd
    src = S1 — both precomputed once per (m, j) program, removing every
    per-l select from the contraction.

    Structure (the lambda fast path):
      * triangular skip — l-blocks below the tile's smallest m do nothing
        (the diagonal seed lambda_mm comes directly from log2 space like the
        MX kernel, so no seed chain has to be advanced through them);
      * the seed block (lb == lb_act) runs the careful per-step body with
        seed/inactive masking and per-step rescaling;
      * later blocks run the fast body: the 3-op recurrence plus a rescale
        check only every RS steps (within a window p cannot overflow f32:
        the worst per-step growth factor is a <= sqrt(2*lmax) ~ 2^8, so
        p <= 2^32 * 2^(8*RS) << 2^128), and the corfac scale is constant
        across the window so lam = p * corfac stays exact.
    """
    ji = pl.program_id(1)
    lb = pl.program_id(2)

    cth = geo_ref[0:1, :]
    ln_sth = geo_ref[4:5, :]

    mi = pl.program_id(0)
    lb_act = (mi * TM) // LB
    m_vec = (mi * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0))
    mf = m_vec.astype(jnp.float32)
    m_even = (m_vec % 2) == 0
    # turning-point skip: every m of this tile is beyond the j-tile's
    # cutoff -> lambda is below f32 significance for all its rings, the
    # whole (m-tile, j-tile) contribution is zero (transforms.m_cutoff)
    active = (mi * TM) < mcut_ref[0, ji]

    @pl.when((lb == lb_act) & active)
    def _init():
        s0re[...] = jnp.where(m_even, ere_ref[...], ore_ref[...])
        s0im[...] = jnp.where(m_even, eim_ref[...], oim_ref[...])
        s1re[...] = jnp.where(m_even, ore_ref[...], ere_ref[...])
        s1im[...] = jnp.where(m_even, oim_ref[...], eim_ref[...])

    @pl.when(ji == 0)
    def _zero_out():
        almre_ref[...] = jnp.zeros_like(almre_ref)
        almim_ref[...] = jnp.zeros_like(almim_ref)

    def _accum(i, lam, l_even):
        src_re = s0re[...] if l_even else s1re[...]
        src_im = s0im[...] if l_even else s1im[...]
        almre_ref[i, :] += jnp.sum(lam * src_re, axis=1)
        almim_ref[i, :] += jnp.sum(lam * src_im, axis=1)

    @pl.when((lb == lb_act) & active)
    def _seed_block():
        # direct diagonal seed (log2 space; see pallas_legendre_mx)
        log2lam = (logc_ref[:, 0:1] + mf * ln_sth
                   - 1.2655121234846454) * 1.4426950408889634
        kf = jnp.floor((log2lam + 32.0) * (1.0 / 64.0))
        seedval = jnp.exp2(log2lam - 64.0 * kf)
        seedk = kf.astype(jnp.int32)

        pp_ref[...] = jnp.zeros_like(pp_ref)
        pc_ref[...] = jnp.zeros_like(pc_ref)
        k_ref[...] = jnp.zeros_like(k_ref)

        def body(i, _):
            l_int = lb * LB + i
            lf = l_int.astype(jnp.float32)
            pp = pp_ref[...]
            pc = pc_ref[...]
            k = k_ref[...]

            a, b = _row_coeffs(lf, mf)
            new = a * (cth * pc - b * pp)

            seed_row = m_vec == l_int
            inactive = m_vec > l_int
            new = jnp.where(seed_row, seedval, jnp.where(inactive, 0.0, new))
            prev = jnp.where(seed_row | inactive, 0.0, pc)
            k_new = jnp.where(seed_row, seedk, k)

            big = jnp.abs(new) > _TH_BIG
            new = jnp.where(big, new * _RESC, new)
            prev = jnp.where(big, prev * _RESC, prev)
            k_new = k_new + big.astype(jnp.int32)

            corfac = jnp.where(k_new == 0, 1.0,
                               jnp.where(k_new == -1, _RESC, 0.0))
            lam = new * corfac
            pp_ref[...] = prev
            pc_ref[...] = new
            k_ref[...] = k_new

            par_even = jnp.remainder(l_int, 2) == 0
            src_re = jnp.where(par_even, s0re[...], s1re[...])
            src_im = jnp.where(par_even, s0im[...], s1im[...])
            almre_ref[i, :] += jnp.sum(lam * src_re, axis=1)
            almim_ref[i, :] += jnp.sum(lam * src_im, axis=1)
            return 0

        jax.lax.fori_loop(0, LB, body, 0)

    @pl.when((lb > lb_act) & active)
    def _fast_blocks():
        # fully unrolled (LB static steps): every alm accumulation lands at
        # a STATIC sublane offset — the fori_loop version's per-degree
        # dynamic-sublane read-modify-writes were the main non-arithmetic
        # cost of the sweep.  Recurrence coefficients a, b are HOISTED into
        # one [TM, LB] batched evaluation per l-block (2 sqrts total)
        # instead of ~12 small-vector ops + 2 sqrts per degree.
        lf_blk = (lb * LB
                  + jax.lax.broadcasted_iota(jnp.int32, (TM, LB), 1)
                  ).astype(jnp.float32)
        den = jnp.maximum((lf_blk - mf) * (lf_blk + mf), 1.0)
        a_blk = jnp.sqrt((2.0 * lf_blk - 1.0) * (2.0 * lf_blk + 1.0) / den)
        bnum = jnp.maximum((lf_blk - 1.0 - mf) * (lf_blk - 1.0 + mf), 0.0)
        bden = jnp.maximum((2.0 * lf_blk - 3.0) * (2.0 * lf_blk - 1.0), 1.0)
        b_blk = jnp.sqrt(bnum / bden)

        def careful_sweep():
            pp = pp_ref[...]
            pc = pc_ref[...]
            k = k_ref[...]
            for w in range(LB // RS):
                corfac = jnp.where(k == 0, 1.0,
                                   jnp.where(k == -1, _RESC, 0.0))
                base = w * RS
                for r in range(RS):  # l parity == r parity (RS, LB even)
                    a = a_blk[:, base + r: base + r + 1]
                    b = b_blk[:, base + r: base + r + 1]
                    new = a * (cth * pc - b * pp)
                    _accum(base + r, new * corfac, (r % 2) == 0)
                    pp, pc = pc, new
                big = jnp.maximum(jnp.abs(pc), jnp.abs(pp)) > _TH_BIG
                scale = jnp.where(big, _RESC, 1.0)
                pp = pp * scale
                pc = pc * scale
                k = k + big.astype(jnp.int32)
            pp_ref[...] = pp
            pc_ref[...] = pc
            k_ref[...] = k

        # once every element is at the asymptotic scale (k == 0), lam == p
        # exactly and the rescale check cannot fire (|lam| <= max|Y_lm| ~ 44
        # at lmax 12288 << 2^32): the bare branch computes exactly the same
        # values minus the corfac multiply and window checks (same measured
        # lever as the synthesis MX kernel's fast path)
        steady = jnp.all(k_ref[...] == 0)

        @pl.when(steady)
        def _bare_sweep():
            pp = pp_ref[...]
            pc = pc_ref[...]
            for i in range(LB):
                a = a_blk[:, i: i + 1]
                b = b_blk[:, i: i + 1]
                new = a * (cth * pc - b * pp)
                _accum(i, new, (i % 2) == 0)
                pp, pc = pc, new
            pp_ref[...] = pp
            pc_ref[...] = pc

        @pl.when(jnp.logical_not(steady))
        def _careful():
            careful_sweep()


@partial(jax.jit, static_argnums=(0, 8), static_argnames=("interpret",))
def _analysis_alm(plan_key, mcut, ere, eim, ore, oim, geo, logc, nl,
                  interpret=False):
    # interpret=True uses the GENERIC Pallas interpreter (not
    # force_tpu_interpret_mode): alm output blocks are revisited across the
    # j grid dimension, which real Mosaic handles by re-fetching the block
    # (validated on hardware, tests/test_mcut.py) but the TPU-simulating
    # interpreter rejects outright.
    nl_pad, nm_pad, J_pad, LB, TM, TJ, RS = plan_key
    grid = (nm_pad // TM, J_pad // TJ, nl_pad // LB)
    kern = partial(_analysis_kernel, nl, LB, TM, TJ, RS)
    eo_spec = pl.BlockSpec((TM, TJ), lambda m, j, lb: (m, j),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  eo_spec, eo_spec, eo_spec, eo_spec,
                  pl.BlockSpec((5, TJ), lambda m, j, lb: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TM, 128), lambda m, j, lb: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nl_pad, nm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((nl_pad, nm_pad), jnp.float32)],
        out_specs=[pl.BlockSpec((LB, TM), lambda m, j, lb: (lb, m),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((LB, TM), lambda m, j, lb: (lb, m),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.int32),
        ],
    )(mcut, ere, eim, ore, oim, geo, logc)


# ---------------------------------------------------------------------------
# analysis, MXU-contraction variant: the VPU version above pays ~8 ops per
# (l, m, j) element in per-degree multiply + cross-lane reductions; this
# variant stores the lambda tile to VMEM scratch (exactly like the MX
# synthesis kernel) and replaces all accumulation with ONE batched MXU dot
# per (m-tile, j-tile, l-block).  alm comes out TRANSPOSED [nm, nl] so the
# output block is [TM, LB] (m rows accumulate where the dot's batch dim
# already is); the wrapper transposes once at the end.
# ---------------------------------------------------------------------------

def _analysis_dot_kernel(nl, LB, TM, TJ, RS, prec,
                         mcut_ref, ere_ref, eim_ref, ore_ref, oim_ref,
                         geo_ref, logc_ref,
                         almre_ref, almim_ref,
                         s0re, s0im, s1re, s1im,
                         p_scr, pp_ref, pc_ref, k_ref):
    """Grid (m_tiles, j_tiles, l_blocks); alm output blocks [TM, LB] of the
    TRANSPOSED [nm_pad, nl_pad] arrays, accumulated across the j grid dim.

    Same lambda fast-path structure as the VPU kernel (seed block careful,
    later blocks bare-3-op once every element reaches the asymptotic scale)
    but each degree only STORES lambda into p_scr; the parity-resolved
    source contraction moves to the MXU: R[TM, LB, 4] = p_scr . {s0, s1}
    with rows selected by l parity afterwards (LB even => row i of this
    block has l parity i % 2)."""
    ji = pl.program_id(1)
    lb = pl.program_id(2)

    cth = geo_ref[0:1, :]
    ln_sth = geo_ref[4:5, :]

    mi = pl.program_id(0)
    lb_act = (mi * TM) // LB
    m_vec = (mi * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0))
    mf = m_vec.astype(jnp.float32)
    m_even = (m_vec % 2) == 0
    active = (mi * TM) < mcut_ref[0, ji]

    @pl.when((lb == lb_act) & active)
    def _init():
        s0re[...] = jnp.where(m_even, ere_ref[...], ore_ref[...])
        s0im[...] = jnp.where(m_even, eim_ref[...], oim_ref[...])
        s1re[...] = jnp.where(m_even, ore_ref[...], ere_ref[...])
        s1im[...] = jnp.where(m_even, oim_ref[...], eim_ref[...])

    @pl.when(ji == 0)
    def _zero_out():
        almre_ref[...] = jnp.zeros_like(almre_ref)
        almim_ref[...] = jnp.zeros_like(almim_ref)

    @pl.when((lb == lb_act) & active)
    def _seed_block():
        log2lam = (logc_ref[:, 0:1] + mf * ln_sth
                   - 1.2655121234846454) * 1.4426950408889634
        kf = jnp.floor((log2lam + 32.0) * (1.0 / 64.0))
        seedval = jnp.exp2(log2lam - 64.0 * kf)
        seedk = kf.astype(jnp.int32)

        pp_ref[...] = jnp.zeros_like(pp_ref)
        pc_ref[...] = jnp.zeros_like(pc_ref)
        k_ref[...] = jnp.zeros_like(k_ref)

        def body(i, _):
            l_int = lb * LB + i
            lf = l_int.astype(jnp.float32)
            pp = pp_ref[...]
            pc = pc_ref[...]
            k = k_ref[...]

            a, b = _row_coeffs(lf, mf)
            new = a * (cth * pc - b * pp)

            seed_row = m_vec == l_int
            inactive = m_vec > l_int
            new = jnp.where(seed_row, seedval, jnp.where(inactive, 0.0, new))
            prev = jnp.where(seed_row | inactive, 0.0, pc)
            k_new = jnp.where(seed_row, seedk, k)

            big = jnp.abs(new) > _TH_BIG
            new = jnp.where(big, new * _RESC, new)
            prev = jnp.where(big, prev * _RESC, prev)
            k_new = k_new + big.astype(jnp.int32)

            corfac = jnp.where(k_new == 0, 1.0,
                               jnp.where(k_new == -1, _RESC, 0.0))
            p_scr[:, pl.ds(i, 1), :] = (new * corfac)[:, None, :]
            pp_ref[...] = prev
            pc_ref[...] = new
            k_ref[...] = k_new
            return 0

        jax.lax.fori_loop(0, LB, body, 0)

    @pl.when((lb > lb_act) & active)
    def _fast_blocks():
        lf_blk = (lb * LB
                  + jax.lax.broadcasted_iota(jnp.int32, (TM, LB), 1)
                  ).astype(jnp.float32)
        den = jnp.maximum((lf_blk - mf) * (lf_blk + mf), 1.0)
        a_blk = jnp.sqrt((2.0 * lf_blk - 1.0) * (2.0 * lf_blk + 1.0) / den)
        bnum = jnp.maximum((lf_blk - 1.0 - mf) * (lf_blk - 1.0 + mf), 0.0)
        bden = jnp.maximum((2.0 * lf_blk - 3.0) * (2.0 * lf_blk - 1.0), 1.0)
        b_blk = jnp.sqrt(bnum / bden)

        def careful_sweep():
            pp = pp_ref[...]
            pc = pc_ref[...]
            k = k_ref[...]
            for w in range(LB // RS):
                corfac = jnp.where(k == 0, 1.0,
                                   jnp.where(k == -1, _RESC, 0.0))
                base = w * RS
                for r in range(RS):
                    a = a_blk[:, base + r: base + r + 1]
                    b = b_blk[:, base + r: base + r + 1]
                    new = a * (cth * pc - b * pp)
                    p_scr[:, base + r: base + r + 1, :] = \
                        (new * corfac)[:, None, :]
                    pp, pc = pc, new
                big = jnp.maximum(jnp.abs(pc), jnp.abs(pp)) > _TH_BIG
                scale = jnp.where(big, _RESC, 1.0)
                pp = pp * scale
                pc = pc * scale
                k = k + big.astype(jnp.int32)
            pp_ref[...] = pp
            pc_ref[...] = pc
            k_ref[...] = k

        steady = jnp.all(k_ref[...] == 0)

        @pl.when(steady)
        def _bare_sweep():
            pp = pp_ref[...]
            pc = pc_ref[...]
            for i in range(LB):
                a = a_blk[:, i: i + 1]
                b = b_blk[:, i: i + 1]
                new = a * (cth * pc - b * pp)
                p_scr[:, i: i + 1, :] = new[:, None, :]
                pp, pc = pc, new
            pp_ref[...] = pp
            pc_ref[...] = pc

        @pl.when(jnp.logical_not(steady))
        def _careful():
            careful_sweep()

    @pl.when((lb >= lb_act) & active)
    def _contract():
        S4 = jnp.concatenate(
            [s0re[...][:, None, :], s0im[...][:, None, :],
             s1re[...][:, None, :], s1im[...][:, None, :]],
            axis=1)  # [TM, 4, TJ]
        R = jax.lax.dot_general(
            p_scr[...], S4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)  # [TM, LB, 4]
        l_even = (jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1) % 2) == 0
        almre_ref[...] += jnp.where(l_even, R[:, :, 0], R[:, :, 2])
        almim_ref[...] += jnp.where(l_even, R[:, :, 1], R[:, :, 3])


@partial(jax.jit, static_argnums=(0, 8), static_argnames=("interpret",))
def _analysis_alm_dot(plan_key, mcut, ere, eim, ore, oim, geo, logc, nl,
                      interpret=False):
    from .pallas_legendre_mx import _MX_PRECISION

    nl_pad, nm_pad, J_pad, LB, TM, TJ, RS = plan_key
    grid = (nm_pad // TM, J_pad // TJ, nl_pad // LB)
    kern = partial(_analysis_dot_kernel, nl, LB, TM, TJ, RS, _MX_PRECISION)
    eo_spec = pl.BlockSpec((TM, TJ), lambda m, j, lb: (m, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TM, LB), lambda m, j, lb: (m, lb),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  eo_spec, eo_spec, eo_spec, eo_spec,
                  pl.BlockSpec((5, TJ), lambda m, j, lb: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TM, 128), lambda m, j, lb: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nm_pad, nl_pad), jnp.float32),
                   jax.ShapeDtypeStruct((nm_pad, nl_pad), jnp.float32)],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, LB, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.int32),
        ],
    )(mcut, ere, eim, ore, oim, geo, logc)


import os as _os

_ANA_DOT = _os.environ.get("CALCLENS_ANA_DOT", "0") == "1"


def analysis_pallas(plan, E, O, TM=128, TJ=512, LB=256, RS=8):
    """Drop-in replacement for transforms.legendre_analysis on TPU.

    E, O [nm, J] complex (quadrature-folded even/odd ring pairs) -> alm
    [nl, nm] complex64.

    CALCLENS_ANA_DOT=1 switches to the MXU-contraction variant (lambda tile
    stored to scratch + one batched dot per l-block, _analysis_dot_kernel)
    with its own tile shapes TM=32, LB=128.
    """
    if _ANA_DOT:
        TM, LB = min(TM, 32), min(LB, 128)
    from .pallas_legendre_mx import _logc_table

    nl, nm, J = plan.nl, plan.nm, plan.J
    TM, TJ = min(TM, 128), min(TJ, max(J, 128))
    nm_pad = -(-nm // TM) * TM
    J_pad = -(-J // TJ) * TJ
    nl_pad = -(-nl // LB) * LB

    def prep(x):
        return _pad_to(_pad_to(x.astype(jnp.float32), nm_pad, 0), J_pad, 1)

    geo = jnp.stack([
        _pad_to(plan.cth.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.sth.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.cot.astype(jnp.float32), J_pad, 0),
        _pad_to(plan.inv_sth.astype(jnp.float32), J_pad, 0),
        _pad_to(jnp.asarray(plan.ln_sth, jnp.float32), J_pad, 0),
    ])
    logc = jnp.asarray(_logc_table(nm_pad))
    # per-j-tile turning-point cutoff (transforms.m_cutoff): (m, j) tiles
    # with every m beyond it are skipped inside the kernel — their lambda
    # is below f32 significance for all the tile's rings
    from .transforms import m_cutoff

    sth_host = np.asarray(plan.sth, np.float64)
    njt = J_pad // TJ
    mcuts = np.full((1, njt), nm, np.int32)
    for t in range(njt):
        rows = sth_host[t * TJ: min((t + 1) * TJ, len(sth_host))]
        if len(rows):
            mcuts[0, t] = m_cutoff(nl - 1, float(np.max(rows)), nm,
                                   granularity=1)
        else:
            mcuts[0, t] = 0  # pure padding tile
    key = (nl_pad, nm_pad, J_pad, LB, TM, TJ, RS)
    if _ANA_DOT:
        almreT, almimT = _analysis_alm_dot(
            key, jnp.asarray(mcuts), prep(jnp.real(E)), prep(jnp.imag(E)),
            prep(jnp.real(O)), prep(jnp.imag(O)), geo, logc, nl)
        return (almreT[:nm, :nl].T
                + 1j * almimT[:nm, :nl].T).astype(plan.cdtype)
    almre, almim = _analysis_alm(
        key, jnp.asarray(mcuts), prep(jnp.real(E)), prep(jnp.imag(E)),
        prep(jnp.real(O)), prep(jnp.imag(O)), geo, logc, nl)
    return (almre[:nl, :nm] + 1j * almim[:nl, :nm]).astype(plan.cdtype)
