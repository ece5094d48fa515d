"""MXU-contraction Pallas kernel for the Legendre synthesis (the SHT hot
loop in matmul form — the "sharded associated-Legendre matmul" north star).

The VPU kernel in pallas_legendre.py accumulates six per-(l, m, j) streams
elementwise (~30 VPU ops per recurrence element).  This kernel restructures
the synthesis so the VPU only runs the lambda recurrence (~15 ops/element)
and the MXU does all the accumulation:

  * All six outputs are contractions of the SAME lambda_lm tile against
    modified alm streams.  The derivative recurrences fold into l-shifted /
    l-scaled coefficients (the reference's d_theta recurrence,
    alm2allmaps_transpose_mpi.c:405-410, summed by parts):

      sum_l a_l lam'_l  = cot * sum_l (l a_l) lam_l
                          - (1/sin) * sum_l (d_{l+1} a_{l+1}) lam_l
      sum_l a_l lam''_l = m^2/sin^2 * sum_l a_l lam_l
                          - sum_l (l(l+1) a_l) lam_l - cot * sum_l a_l lam'_l

    with d_lm = sqrt((l^2-m^2)(2l+1)/(2l-1)).  The cot / 1/sin factors and
    the combinations are applied OUTSIDE the kernel (elementwise [nm, J]).
  * Per (m, l-block, j-tile): the recurrence materializes a lambda tile
    P [LB, TJ] in VMEM, then ONE MXU dot contracts S16^T[16, LB] x P -> the
    16 raw streams {a, l*a, d+a+, l(l+1)a} x {re, im} x {+, (-1)^l} — the
    (-1)^l south-parity variants come from row signs on the SMALL S matrix,
    not a second lambda tile.
  * Triangular skip: each m tile skips all l blocks below floor(m0/LB); the
    diagonal seed lambda_mm is evaluated directly in log2 space
    (log-double-factorial table + m ln sin theta) with the 2^64 scale
    counter initialized from the exponent (reference plmgen rescaling,
    healpix_plmgen.c:73-239; underflow reproduces the lmin cutoff,
    healpix_shtrans.c:533-544).

Outputs feed the same (qN, qS) interface as pallas_legendre.synthesis_pallas.
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
_LOG2E = 1.4426950408889634
_HALF_LN_4PI = 1.2655121234846454  # 0.5 * ln(4 pi)

# MXU pass count for the stream contraction (overridable for benchmarking):
# HIGH = bf16x3 (f32-equivalent products), HIGHEST = 6-pass exact f32
import os as _os

# (Mosaic only lowers DEFAULT and HIGHEST; HIGH raises NotImplementedError.
# The MXU share of the sweep is ~0.3 s of ~6 s at order 12, so the 6-pass
# HIGHEST exactness is kept.)
_MX_PRECISION = {
    "HIGHEST": jax.lax.Precision.HIGHEST,
    "DEFAULT": jax.lax.Precision.DEFAULT,
}[_os.environ.get("CALCLENS_MX_PRECISION", "HIGHEST")]

# Fast-block corfac skip: once every element of the tile has reached the
# asymptotic scale (k == 0), lam == p exactly — the per-degree corfac
# multiply is the identity and the per-window rescale check cannot fire
# (|lam| <= max|Y| ~ m^(1/4) << 2^32).  A per-window scalar predicate
# switches to a bare 3-op recurrence + store.  No accuracy change: the
# skipped path computes exactly the same values.
_MX_CORFAC_SKIP = _os.environ.get("CALCLENS_MX_CORFAC_SKIP", "1") == "1"

# Batched stream contraction: one dot_general with a TM batch dimension
# instead of TM separate [ncol, LB] x [LB, TJ] dots (fewer, larger MXU
# dispatches).  Overridable for benchmarking.
_MX_BATCHED_DOT = _os.environ.get("CALCLENS_MX_BATCHED_DOT", "0") == "1"


def _logc_table(nm_pad: int) -> np.ndarray:
    """C[m] = 0.5 * ln((2m+1)!!/(2m)!!) replicated to 128 lanes."""
    m = np.arange(nm_pad, dtype=np.float64)
    c = np.concatenate(
        [[0.0], 0.5 * np.cumsum(np.log((2.0 * m[1:] + 1.0) / (2.0 * m[1:])))])
    return np.broadcast_to(c[:, None].astype(np.float32),
                           (nm_pad, 128)).copy()


def _seed_init(logc_col, mf, ln_sth):
    """Direct diagonal seed lambda_mm = stored * 2^(64 k) from log2 space.

    k chosen so stored lands in [2^-32, 2^32): lambda_mm at the equator
    EXCEEDS 1 for large m (max|Y_mm| ~ m^(1/4)), so a ceil(log2/64) window
    would emit k=+1 there and the k>0 corfac cutoff would zero legitimate
    values (the 10% q error seen on first hardware runs)."""
    log2lam = (logc_col + mf * ln_sth - _HALF_LN_4PI) * _LOG2E
    kf = jnp.floor((log2lam + 32.0) * (1.0 / 64.0))
    seedval = jnp.exp2(log2lam - 64.0 * kf)
    return seedval, kf.astype(jnp.int32)


def _lam_step(l_int, mf, m_vec, cth, pp, pc, k, seedval, seedk):
    """One degree of the scaled recurrence -> (pp', pc', k', lam)."""
    lf = l_int.astype(jnp.float32)
    den = jnp.maximum((lf - mf) * (lf + mf), 1.0)
    a = jnp.sqrt((2.0 * lf - 1.0) * (2.0 * lf + 1.0) / den)
    bnum = jnp.maximum((lf - 1.0 - mf) * (lf - 1.0 + mf), 0.0)
    bden = jnp.maximum((2.0 * lf - 3.0) * (2.0 * lf - 1.0), 1.0)
    b = jnp.sqrt(bnum / bden)
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

    corfac = jnp.where(k_new == 0, 1.0, jnp.where(k_new == -1, _RESC, 0.0))
    return prev, new, k_new, new * corfac


def _synth_mx_kernel(LB, TM, TJ, ncol, RS, corfac_skip, batched_dot,
                     are_ref, aim_ref, hre_ref, him_ref, geo_ref, logc_ref,
                     out_ref,
                     p_scr, pp_ref, pc_ref, k_ref):
    """Grid (m_tiles, j_tiles, l_blocks), l innermost.

    alm/shifted-stream blocks [LB, TM]; geo rows cth, sth, cot, inv_sth,
    ln_sth [5, TJ]; out block [TM, ncol, TJ] accumulated across l blocks.
    ncol = 16 (derivs) or 4 (phi only: {a_re, a_im} x {+, (-1)^l}).

    Lambda fast path: only the seed block (lb == lb_act, where the diagonal
    lambda_mm enters) pays the per-step seed/inactive masking and rescale;
    later blocks run the bare 3-op recurrence with a rescale check every RS
    steps (p cannot overflow f32 within a window: worst per-step growth
    a <= sqrt(2*lmax) ~ 2^8, so p <= 2^32 * 2^(8*RS) << 2^128, and corfac
    is constant across the window so lam = p * corfac stays exact).
    """
    mi = pl.program_id(0)
    lb = pl.program_id(2)
    lb_act = (mi * TM) // LB

    cth = geo_ref[0:1, :]
    ln_sth = geo_ref[4:5, :]

    m_vec = (mi * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0))
    mf = m_vec.astype(jnp.float32)

    @pl.when(lb == 0)
    def _zero_out():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(lb == lb_act)
    def _seed_block():
        sv, sk = _seed_init(logc_ref[:, 0:1], mf, ln_sth)
        pp_ref[...] = jnp.zeros_like(pp_ref)
        pc_ref[...] = jnp.zeros_like(pc_ref)
        k_ref[...] = jnp.zeros_like(k_ref)

        def body(i, _):
            pp, pc, k, lam = _lam_step(
                lb * LB + i, mf, m_vec, cth,
                pp_ref[...], pc_ref[...], k_ref[...], sv, sk)
            p_scr[:, pl.ds(i, 1), :] = lam[:, None, :]
            pp_ref[...] = pp
            pc_ref[...] = pc
            k_ref[...] = k
            return 0

        jax.lax.fori_loop(0, LB, body, 0)

    @pl.when(lb > lb_act)
    def _fast_blocks():
        # fully unrolled (LB static steps): every p_scr store lands at a
        # STATIC sublane offset — the fori_loop version's per-degree
        # dynamic-sublane stores (pl.ds on the second axis) were the main
        # non-arithmetic cost of the sweep.  (Grouping RS rows into one
        # [TM, RS, TJ] chunked store was MEASURED SLOWER on v5e: 0.524 s vs
        # 0.379 s per belt block at order 12 — the stack materializes the
        # window in registers and spills.)
        #
        # Recurrence coefficients a, b are HOISTED: one [TM, LB] batched
        # evaluation per l-block (2 sqrts total on 2-vreg shapes) instead
        # of ~12 small-vector ops + 2 sqrts per DEGREE — the per-degree
        # coefficient math was ~40% of the fast path's instruction count.
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

        if not corfac_skip:
            careful_sweep()
        else:
            # once every element is at the asymptotic scale (k == 0),
            # lam == p exactly and the rescale check cannot fire
            # (|lam| <= max|Y_lm| ~ 44 at lmax 12288 << 2^32): a bare
            # 3-op recurrence + store computes exactly the same values
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

    @pl.when(lb >= lb_act)
    def _compute():

        # stream matrix per m (transposed [ncol, LB]: alm arrives l-on-lanes
        # so stream rows are sublane concats — no in-kernel transposes),
        # then ONE MXU contraction over the l block
        l_row = (lb * LB
                 + jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1))
        lf_row = l_row.astype(jnp.float32)
        l2_row = lf_row * (lf_row + 1.0)
        sgn_row = 1.0 - 2.0 * (l_row % 2).astype(jnp.float32)  # (-1)^l
        if batched_dot:
            def col(x):
                return x[:, None, :]  # [TM, 1, LB]
            a_re = are_ref[...]
            a_im = aim_ref[...]
            if ncol == 16:
                h_re = hre_ref[...]
                h_im = him_ref[...]
                S8 = jnp.concatenate(
                    [col(a_re), col(a_im),
                     col(a_re * lf_row), col(a_im * lf_row),
                     col(h_re), col(h_im),
                     col(a_re * l2_row), col(a_im * l2_row)], axis=1)
                S = jnp.concatenate([S8, S8 * sgn_row[:, None, :]], axis=1)
            else:
                S = jnp.concatenate(
                    [col(a_re), col(a_im),
                     col(a_re * sgn_row), col(a_im * sgn_row)], axis=1)
            out_ref[...] += jax.lax.dot_general(
                S, p_scr[...], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_MX_PRECISION)
            return
        for mm in range(TM):
            a_re = are_ref[mm: mm + 1, :]
            a_im = aim_ref[mm: mm + 1, :]
            if ncol == 16:
                h_re = hre_ref[mm: mm + 1, :]
                h_im = him_ref[mm: mm + 1, :]
                S8 = jnp.concatenate(
                    [a_re, a_im, a_re * lf_row, a_im * lf_row,
                     h_re, h_im, a_re * l2_row, a_im * l2_row], axis=0)
                S = jnp.concatenate([S8, S8 * sgn_row], axis=0)
            else:
                S = jnp.concatenate(
                    [a_re, a_im, a_re * sgn_row, a_im * sgn_row], axis=0)
            # >= HIGH: the summed-by-parts streams (l*a vs d*a+) cancel
            # by ~1/l after the cot/inv combination — single-pass bf16 MXU
            # inputs (the TPU default) turn that into O(1) error at high l.
            # bf16x3 (HIGH) carries f32-equivalent products at half the
            # passes of HIGHEST (see _MX_PRECISION benchmark note).
            out_ref[mm] += jax.lax.dot_general(
                S, p_scr[mm], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MX_PRECISION)


@partial(jax.jit, static_argnums=(0, 6))
def _synth_mx_raw(plan_key, are, aim, hre, him, geo, ncol):
    nl_pad, nm_pad, J_pad, LB, TM, TJ, RS, cskip, bdot = plan_key
    grid = (nm_pad // TM, J_pad // TJ, nl_pad // LB)
    logc = jnp.asarray(_logc_table(nm_pad))
    kern = partial(_synth_mx_kernel, LB, TM, TJ, ncol, RS, cskip, bdot)
    # alm streams arrive TRANSPOSED [nm_pad, nl_pad]: (TM, LB) = (8, 128)
    # blocks satisfy Mosaic's (8, 128)-divisibility, and l-on-lanes lets the
    # kernel build the stream matrix from sublane rows without transposes
    ab_spec = pl.BlockSpec((TM, LB), lambda m, j, lb: (m, lb),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ab_spec, ab_spec, ab_spec, ab_spec,
                  pl.BlockSpec((5, TJ), lambda m, j, lb: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TM, 128), lambda m, j, lb: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((nm_pad, ncol, J_pad), jnp.float32),
        out_specs=pl.BlockSpec((TM, ncol, TJ), lambda m, j, lb: (m, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TM, LB, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.float32),
            pltpu.VMEM((TM, TJ), jnp.int32),
        ],
    )(are, aim, hre, him, geo, logc)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _geo_rows(plan, J_pad):
    rows = np.stack([plan.cth, plan.sth, plan.cot, plan.inv_sth,
                     plan.ln_sth]).astype(np.float32)
    out = np.zeros((5, J_pad), np.float32)
    out[:, : rows.shape[1]] = rows
    return jnp.asarray(out)


def _dfac_rows(nl, nm):
    """d_lm = sqrt((l^2-m^2)(2l+1)/(2l-1)) for l = 1..nl (the d_theta
    lowering factor), computed IN-GRAPH: as a literal this is [nl, nm] f32
    (600 MB at NSIDE 4096) and blows the compile-request size limit."""
    l = jnp.arange(1, nl + 1, dtype=jnp.float32)[:, None]
    m = jnp.arange(nm, dtype=jnp.float32)[None, :]
    num = jnp.maximum(l * l - m * m, 0.0) * (2.0 * l + 1.0)
    den = jnp.maximum(2.0 * l - 1.0, 1.0)
    return jnp.sqrt(num / den)


def mx_prep(nl: int, nm: int, alm, derivs: bool, TM=32, LB=128):
    """alm -> the four padded TRANSPOSED stream arrays [nm_pad, nl_pad]
    (a_re, a_im, h_re, h_im with h = d_{l+1} a_{l+1}).  Split out so the
    host-streamed synthesis preps ONCE instead of once per j-block (~2.3 GB
    of pad/transpose traffic per block at NSIDE 4096)."""
    nm_pad = -(-nm // TM) * TM
    nl_pad = -(-nl // LB) * LB
    ar = jnp.real(alm).astype(jnp.float32)
    ai = jnp.imag(alm).astype(jnp.float32)
    if derivs:
        # shifted stream h[l] = d_{l+1} a_{l+1} (summation by parts of the
        # d_theta lowering recurrence)
        d = _dfac_rows(nl - 1, nm)  # rows l = 1..nl-1
        hr = jnp.concatenate([ar[1:] * d, jnp.zeros((1, nm), ar.dtype)])
        hi = jnp.concatenate([ai[1:] * d, jnp.zeros((1, nm), ai.dtype)])
    else:
        hr = hi = jnp.zeros((1, nm), jnp.float32)

    def prep(x):
        return _pad_to(_pad_to(x, nl_pad, 0), nm_pad, 1).T

    return prep(ar), prep(ai), prep(hr), prep(hi)


# tile-shape overrides for benchmarking (tools/mb_mx.py sweeps)
_MX_TM = int(_os.environ.get("CALCLENS_MX_TM", "0")) or None
_MX_TJ = int(_os.environ.get("CALCLENS_MX_TJ", "0")) or None
_MX_RS = int(_os.environ.get("CALCLENS_MX_RS", "0")) or None


def synthesis_pallas_mx(plan, alm, derivs: bool, TM=32, TJ=512, LB=128,
                        prepped=None, RS=8, mcut=None):
    """MXU Legendre synthesis: drop-in for transforms.legendre_synthesis.

    Returns (qN, qS) each [nkern, nm, J] complex64.  `prepped` (from
    mx_prep) skips the per-call stream preparation.  `mcut` (the
    turning-point cutoff, transforms.m_cutoff) shrinks the kernel grid's m
    dimension: columns m >= mcut are below f32 significance for every ring
    of this plan/view, so their rows are zero-filled instead of computed —
    polar j-blocks of the streamed synthesis skip most of the sweep."""
    TM = _MX_TM or TM
    TJ = _MX_TJ or TJ
    RS = _MX_RS or RS
    nl, nm, J = plan.nl, plan.nm, plan.J
    nm_eff = nm if mcut is None else min(nm, int(mcut))
    TJ = min(TJ, max(-(-J // 128) * 128, 128))
    nm_pad = -(-nm_eff // TM) * TM
    J_pad = -(-J // TJ) * TJ
    nl_pad = -(-nl // LB) * LB
    ncol = 16 if derivs else 4

    if prepped is None:
        prepped = mx_prep(nl, nm, alm, derivs, TM=TM, LB=LB)
    if prepped[0].shape[0] > nm_pad:
        prepped = tuple(x[:nm_pad] for x in prepped)

    geo = _geo_rows(plan, J_pad)
    key = (nl_pad, nm_pad, J_pad, LB, TM, TJ, RS,
           _MX_CORFAC_SKIP, _MX_BATCHED_DOT)
    c = _synth_mx_raw(key, *prepped, geo, ncol)
    c = c[:nm_eff, :, :J]  # [nm_eff, ncol, J]
    if nm_eff < nm:
        c = jnp.pad(c, ((0, nm - nm_eff), (0, 0), (0, 0)))

    s_m = (1 - 2 * (jnp.arange(nm, dtype=jnp.int32) % 2)).astype(
        jnp.float32)[:, None]

    def cplx(k):
        return (c[:, 2 * k] + 1j * c[:, 2 * k + 1]).astype(plan.cdtype)

    if not derivs:
        c0, c0a = cplx(0), cplx(1)
        return (jnp.stack([c0]), jnp.stack([s_m * c0a]))

    c0, c1, c2, c3 = cplx(0), cplx(1), cplx(2), cplx(3)
    c0a, c1a, c2a, c3a = cplx(4), cplx(5), cplx(6), cplx(7)

    cot = jnp.asarray(plan.cot, jnp.float32)[None, :]
    inv = jnp.asarray(plan.inv_sth, jnp.float32)[None, :]
    m2i2 = jnp.asarray(plan.m_f, jnp.float32)[:, None] ** 2 * inv * inv

    qphiN = c0
    qphiS = s_m * c0a
    qthN = cot * c1 - inv * c2
    dSa = cot * c1a + inv * c2a          # sum (-1)^l a lam'
    qthS = -s_m * dSa
    qththN = m2i2 * c0 - c3 - cot * qthN
    qththS = s_m * (m2i2 * c0a - c3a - cot * dSa)

    qN = jnp.stack([qphiN, qthN, qththN])
    qS = jnp.stack([qphiS, qthS, qththS])
    return qN, qS

