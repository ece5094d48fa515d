"""Spherical-harmonic transforms as JAX scans over the degree l.

TPU-native replacement for the reference's distributed SHT
(map2alm_transpose_mpi.c:54, alm2map_transpose_mpi.c:53,
alm2allmaps_transpose_mpi.c:53).  Design:

  * Ring DFTs: batched chirp-Z (czt.py) instead of per-ring FFTW plans.
  * Legendre part: the associated-Legendre values lambda_lm(theta) are
    generated on the fly by the standard 3-term recurrence in l, vectorized
    over all (m, ring-pair) simultaneously, inside a `lax.scan` over l-blocks
    (lblock unrolled steps per scan step keeps the recurrence state in
    registers/VMEM between steps instead of round-tripping HBM every l).
  * Underflow control: the recurrence state carries a per-(m, ring) power-of-
    2^64 scale exponent (the TPU analog of the reference's plmgen rescaling,
    healpix_plmgen.c:73-239); values whose true magnitude is below ~2^-96
    contribute exact zeros, which reproduces the reference's lmin cutoff
    (healpix_shtrans.c:533-544) with no explicit bookkeeping.
  * North/south parity: rings are folded into J = 2*nside northern pairs with
    even/odd combinations, halving Legendre work exactly as the reference's
    ring pairing does.

The derivative synthesis (alm2allmaps) accumulates three kernels per l:
lambda, dlambda/dtheta (via the l-lowering recurrence, matching
alm2allmaps_transpose_mpi.c:405-410), and d2lambda/dtheta2 from the Legendre
ODE  lam'' = (m^2/sin^2 - l(l+1)) lam - cot * lam', then assembles the six
covariant outputs phi, d_theta, d_phi/sin, and the covariant second
derivatives with the cot corrections of alm2allmaps_transpose_mpi.c:1094-1147.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .czt import czt_blocked
from .plan import SHTPlan

_TH_BIG = 2.0**32
_RESC = 2.0**-64
_TINY = 2.0**-64


def _use_pallas(plan):
    """Use the Pallas VMEM-resident Legendre kernels on TPU f32 (overridable
    via plan.use_pallas)."""
    override = getattr(plan, "use_pallas", None)
    if override is not None:
        return override
    return jax.default_backend() == "tpu" and plan.dtype == jnp.float32


def _cst(plan, x, spec_name):
    """Sharding constraint when the plan carries a mesh (no-op otherwise).
    These mark the ring-sharded / m-sharded regions; XLA inserts the
    all-to-all transpose between them (reference map2alm_transpose_mpi.c:317)."""
    if plan.spec is None:
        return x
    sp = getattr(plan.spec, spec_name)
    return jax.lax.with_sharding_constraint(x, sp)


def _cst_rings2(plan, x):
    """Constrain the trailing [nrings_pad, ...] axes to ring sharding for an
    array with any number of leading stream axes.  This marks the ring-space
    side of the ring<->m transpose: without it GSPMD all-gathers the full
    [nrings_pad, nm] complex matrices on every device (the NSIDE 8192 memory
    wall) instead of inserting the all-to-all."""
    if plan.spec is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.sharding import AXIS

    spec = P(*((None,) * (x.ndim - 2)), AXIS, None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(plan.spec.mesh, spec))


def _cst_blocks1(plan, x):
    """Constrain the trailing [npix] axis to contiguous pixel blocks (the
    flat-map sharding consumed by the halo-exchange interpolation)."""
    if plan.spec is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.sharding import AXIS

    spec = P(*((None,) * (x.ndim - 1)), AXIS)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(plan.spec.mesh, spec))


# ----------------------------------------------------------------------------
# ring-space stages
# ----------------------------------------------------------------------------

def _ring_phase(plan: SHTPlan, sign):
    """exp(sign * i * m * phi0_r): [nrings_pad, nm] complex (in-graph — a
    literal constant this size would bloat the compiled program)."""
    # phi0 = shift * pi / n  ->  exponent = sign * pi * (m * shift mod 2n) / n
    m = jnp.asarray(plan.m_int)[None, :]
    n = jnp.asarray(plan.n_dev)[:, None]
    t = (m * jnp.asarray(plan.shift_dev)[:, None]) % (2 * n)
    rdtype = plan.dtype
    ph = (jnp.pi * sign) * (t.astype(rdtype) / n.astype(rdtype))
    return (jnp.cos(ph) + 1j * jnp.sin(ph)).astype(plan.cdtype)


def _ring_stage(plan):
    rs = getattr(plan, "_ring_stage", None)
    if rs is None:
        from .rings import RingStage

        rs = RingStage(plan.order, plan.nm, plan.nrings_pad, dtype=plan.dtype)
        plan._ring_stage = rs
    return rs


def analysis_rings(plan: SHTPlan, maps):
    """RING map(s) [..., npix] -> G_m per ring [..., nrings_pad, nm].

    G[r, m] = sum_p map(r,p) exp(-i m phi_rp) = e^{-i m phi0} DFT_n(x)[m mod n]
    """
    if getattr(plan, "use_rings_v2", True):
        return _cst_rings2(plan, _ring_stage(plan).analysis(maps))
    X = plan.map_to_rings(maps)  # [..., R, P]
    lead = X.shape[:-2]
    Xf = X.reshape((-1,) + X.shape[-2:])
    out = []
    for i in range(Xf.shape[0]):
        F = czt_blocked(Xf[i], plan.n_dev, K=plan.P, L=plan.L, sign=-1,
                        cdtype=plan.cdtype, block=plan.ring_block)
        mmod = plan.m_int[None, :] % plan.n_dev[:, None]
        G = jnp.take_along_axis(F, mmod.astype(jnp.int32), axis=1)
        out.append(G * _ring_phase(plan, -1))
    res = jnp.stack(out, axis=0)
    return _cst_rings2(plan, res.reshape(lead + res.shape[-2:]))


def synthesis_rings(plan: SHTPlan, Q):
    """q_m per ring [..., nrings_pad, nm] -> RING map(s) [..., npix].

    map(r,p) = Re sum_m (2 - delta_m0) q_m e^{i m phi_rp}

    Uses the uniform chirp-Z over all rings: one CZT shape means the chirp
    FFT is CSE'd across streams and only a few large batched FFTs run — the
    bucketed v2 stage wins for analysis but loses here to TPU per-FFT-call
    overhead (set plan.use_rings_v2_synthesis to force v2).
    """
    # measured on v5e at NSIDE 1024 (2 streams): uniform 1.48 s,
    # hybrid 1.82 s, bucketed v2 3.2 s — uniform CZT stays the default
    Q = _cst_rings2(plan, Q)  # m-sharded -> ring-sharded (the transpose)
    mode = getattr(plan, "synthesis_rings_mode", "uniform")
    if mode == "hybrid":
        return _ring_stage(plan).synthesis_hybrid(Q)
    if mode == "v2":
        return _ring_stage(plan).synthesis(Q)
    wfold = jnp.where(jnp.asarray(plan.m_int) == 0, 1.0, 2.0).astype(plan.dtype)
    Y = Q * wfold[None, :] * _ring_phase(plan, +1)
    lead = Y.shape[:-2]
    Yf = Y.reshape((-1,) + Y.shape[-2:])
    out = []
    for i in range(Yf.shape[0]):
        X = czt_blocked(Yf[i], jnp.asarray(plan.n_dev), K=plan.P, L=plan.L,
                        sign=+1, cdtype=plan.cdtype, block=plan.ring_block)
        out.append(plan.rings_to_map(jnp.real(X).astype(plan.dtype)))
    res = jnp.stack(out, axis=0)
    return _cst_blocks1(plan, res.reshape(lead + res.shape[-1:]))


def fold_pairs(plan: SHTPlan, G):
    """G [nrings_pad, nm] -> quadrature-weighted even/odd parts [nm, J]."""
    jj = jnp.arange(plan.J)
    GN = G[jj]                       # [J, nm]
    GS = G[plan.nrings - 1 - jj]     # equator row duplicated; wS[J-1] = 0
    E = (plan.wN[:, None] * GN + plan.wS[:, None] * GS).T
    O = (plan.wN[:, None] * GN - plan.wS[:, None] * GS).T
    return E, O


def unfold_pairs(plan: SHTPlan, qN, qS):
    """[nm, J] north/south ring values -> [nrings_pad, nm]."""
    north = qN.T                                  # rings 0..J-1
    south = qS[:, : plan.J - 1][:, ::-1].T        # rings J..nrings-1
    pad = jnp.zeros((plan.nrings_pad - plan.nrings, plan.nm), dtype=qN.dtype)
    return jnp.concatenate([north, south, pad], axis=0)


# ----------------------------------------------------------------------------
# Legendre recurrence core
# ----------------------------------------------------------------------------

def _lam_step(plan: SHTPlan, state, l_int):
    """One l step of the scaled lambda_lm recurrence for all (m, ring).

    state = (p_prev, p_curr, k, seed, seedk); returns (state', lam, lam_prev)
    where lam = lambda_l,m(theta_j) and lam_prev = lambda_{l-1,m}(theta_j)
    with scale corrections applied (underflowed entries are exactly 0).
    """
    p_prev, p_curr, k, seed, seedk = state
    dtype = plan.dtype
    mf = plan.m_f
    mi = plan.m_int
    lf = jnp.asarray(l_int, dtype=dtype)

    lm = lf - mf
    lp = lf + mf
    den = jnp.maximum(lm * lp, 1.0)
    a = jnp.sqrt((2.0 * lf - 1.0) * (2.0 * lf + 1.0) / den)
    bnum = jnp.maximum((lf - 1.0 - mf) * (lf - 1.0 + mf), 0.0)
    bden = jnp.maximum((2.0 * lf - 3.0) * (2.0 * lf - 1.0), 1.0)
    b = jnp.sqrt(bnum / bden)

    new = a[:, None] * (plan.cth[None, :] * p_curr - b[:, None] * p_prev)

    seed_row = (mi == l_int)[:, None]
    inactive = (mi > l_int)[:, None]
    new = jnp.where(seed_row, seed[None, :], jnp.where(inactive, 0.0, new))
    prev_new = jnp.where(seed_row | inactive, 0.0, p_curr)
    k_new = jnp.where(seed_row, seedk[None, :], k)

    big = jnp.abs(new) > _TH_BIG
    new = jnp.where(big, new * _RESC, new)
    prev_new = jnp.where(big, prev_new * _RESC, prev_new)
    k_new = k_new + big.astype(jnp.int32)

    corfac = jnp.where(k_new == 0, 1.0, jnp.where(k_new == -1, _RESC, 0.0)).astype(dtype)
    lam = new * corfac
    lam_prev = prev_new * corfac

    # seed for l+1: lambda_{m+1,m+1} = sqrt((2m+3)/(2m+2)) sin(theta) lambda_mm
    seed2 = seed * plan.sth * jnp.sqrt((2.0 * lf + 3.0) / (2.0 * lf + 2.0)).astype(dtype)
    under = seed2 < _TINY
    seed2 = jnp.where(under, seed2 / _RESC, seed2)
    seedk2 = seedk - under.astype(jnp.int32)

    return (prev_new, new, k_new, seed2, seedk2), lam, lam_prev


def _init_state(plan: SHTPlan):
    dtype = plan.dtype
    shape = (plan.nm, plan.J)
    p_prev = jnp.zeros(shape, dtype)
    p_curr = jnp.zeros(shape, dtype)
    k = jnp.zeros(shape, jnp.int32)
    seed = jnp.full((plan.J,), 1.0 / jnp.sqrt(4.0 * jnp.pi), dtype)  # lambda_00
    seedk = jnp.zeros((plan.J,), jnp.int32)
    return (p_prev, p_curr, k, seed, seedk)


def _nl_padded(plan: SHTPlan):
    B = plan.lblock
    return ((plan.nl + B - 1) // B) * B


# ----------------------------------------------------------------------------
# map2alm
# ----------------------------------------------------------------------------

def map2alm(plan: SHTPlan, m):
    """RING map [npix] -> alm [nl, nm] complex (l-major; entries m > l are 0).

    alm = sum_rings w_r lambda_lm(theta_r) G_m(r)  with the reference's
    quadrature weights (map2alm_transpose_mpi.c:110-124).
    """
    G = analysis_rings(plan, m)
    E, O = fold_pairs(plan, G)
    if _use_pallas(plan):
        from . import pallas_legendre as PL

        return PL.analysis_pallas(plan, E, O)
    return legendre_analysis(plan, E, O)


@partial(jax.jit, static_argnums=0)
def legendre_analysis(plan: SHTPlan, E, O):
    B = plan.lblock
    nlp = _nl_padded(plan)
    E = _cst(plan, E, "m_rows")
    O = _cst(plan, O, "m_rows")

    def block(state, b):
        rows = []
        for i in range(B):
            l_int = b * B + i
            state, lam, _ = _lam_step(plan, state, l_int)
            par_even = ((l_int + plan.m_int) % 2 == 0)[:, None]
            src = jnp.where(par_even, E, O)
            rows.append(jnp.sum(lam * src, axis=1))
        return state, jnp.stack(rows, axis=0)

    _, alm = jax.lax.scan(block, _init_state(plan), jnp.arange(nlp // B, dtype=jnp.int32))
    return _cst(plan, alm.reshape(nlp, plan.nm)[: plan.nl], "alm")


# ----------------------------------------------------------------------------
# alm2map / alm2allmaps
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 2))
def legendre_synthesis(plan: SHTPlan, alm, derivs: bool):
    """alm [nl, nm] -> per-ring q values.

    Returns (qN, qS) each [nkern, nm, J] complex with nkern = 1 (just phi) or
    3 (phi, d_theta, d_theta_theta) when derivs.
    """
    B = plan.lblock
    nlp = _nl_padded(plan)
    alm = _cst(plan, alm, "alm")
    pad = jnp.zeros((nlp - plan.nl, plan.nm), dtype=alm.dtype)
    xs = jnp.concatenate([alm, pad], axis=0).reshape(nlp // B, B, plan.nm)
    bidx = jnp.arange(nlp // B, dtype=jnp.int32)

    dtype = plan.dtype
    cshape = (plan.nm, plan.J)
    nacc = 3 if derivs else 1
    acc0 = tuple(jnp.zeros(cshape, plan.cdtype) for _ in range(2 * nacc))

    mf2 = (plan.m_f**2)[:, None]

    def block(carry, xb):
        state, acc = carry
        b, rows = xb
        acc = list(acc)
        for i in range(B):
            l_int = b * B + i
            state, lam, lam_prev = _lam_step(plan, state, l_int)
            a_row = rows[i][:, None]  # [nm, 1] complex
            par = ((l_int + plan.m_int) % 2 == 0)[:, None]
            lf = jnp.asarray(l_int, dtype=dtype)

            contrib = a_row * lam
            acc[0] = acc[0] + jnp.where(par, contrib, 0.0)
            acc[1] = acc[1] + jnp.where(par, 0.0, contrib)
            if derivs:
                c = jnp.sqrt(
                    jnp.maximum((lf - plan.m_f) * (lf + plan.m_f), 0.0)
                    * (2.0 * lf + 1.0)
                    / jnp.maximum(2.0 * lf - 1.0, 1.0)
                )
                lamp = lf * plan.cot[None, :] * lam - c[:, None] * lam_prev * plan.inv_sth[None, :]
                lampp = (mf2 * (plan.inv_sth**2)[None, :] - lf * (lf + 1.0)) * lam \
                    - plan.cot[None, :] * lamp
                cp = a_row * lamp
                cpp = a_row * lampp
                acc[2] = acc[2] + jnp.where(par, cp, 0.0)
                acc[3] = acc[3] + jnp.where(par, 0.0, cp)
                acc[4] = acc[4] + jnp.where(par, cpp, 0.0)
                acc[5] = acc[5] + jnp.where(par, 0.0, cpp)
        return (state, tuple(acc)), None

    (_, acc), _ = jax.lax.scan(block, (_init_state(plan), acc0), (bidx, xs))

    qN = [acc[0] + acc[1]]
    qS = [acc[0] - acc[1]]
    if derivs:
        # lambda'(pi - theta) = -(-1)^(l+m) lambda'(theta): south flips sign
        qN.append(acc[2] + acc[3])
        qS.append(-(acc[2] - acc[3]))
        qN.append(acc[4] + acc[5])
        qS.append(acc[4] - acc[5])
    qN = jnp.stack(qN)
    qS = jnp.stack(qS)
    if plan.spec is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.sharding import AXIS

        sp = NamedSharding(plan.spec.mesh, P(None, AXIS, None))
        qN = jax.lax.with_sharding_constraint(qN, sp)
        qS = jax.lax.with_sharding_constraint(qS, sp)
    return qN, qS


def _legendre_synth_dispatch(plan, alm, derivs):
    if _use_pallas(plan):
        from . import pallas_legendre as PL

        return PL.synthesis_pallas(plan, alm, derivs)
    return legendre_synthesis(plan, alm, derivs)


def alm2map(plan: SHTPlan, alm):
    """alm [nl, nm] -> RING map [npix] (potential only, non-SHTONLY path)."""
    qN, qS = _legendre_synth_dispatch(plan, alm, False)
    Q = unfold_pairs(plan, qN[0], qS[0])
    return synthesis_rings(plan, Q[None])[0]


def alm2allmaps(plan: SHTPlan, alm):
    """alm -> (phi, d_theta, d_phi, d_theta_theta, d_theta_phi, d_phi_phi).

    All derivatives are the covariant components on the orthonormal
    (e_theta, e_phi) basis, matching the reference's outputs that feed the
    deflection alpha = -grad(phi) and shear tensor U
    (alm2allmaps_transpose_mpi.c:121-131, 1080-1147).
    """
    qN, qS = _legendre_synth_dispatch(plan, alm, True)
    qphi = unfold_pairs(plan, qN[0], qS[0])
    qth = unfold_pairs(plan, qN[1], qS[1])
    qthth = unfold_pairs(plan, qN[2], qS[2])

    im = (1j * np.asarray(plan.m_f, plan.dtype)).astype(plan.cdtype)[None, :]
    m2 = np.asarray(plan.m_f**2, plan.dtype)[None, :]
    streams = jnp.stack([
        qphi,            # s0: phi
        qth,             # s1: d_theta
        qphi * im,       # s2: d_phi (raw, needs /sin)
        qthth,           # s3: d_theta d_theta
        qth * im,        # s4: d_theta d_phi (raw, needs /sin)
        -(qphi * m2),    # s5: d_phi d_phi (raw, needs /sin^2)
    ])
    # chunk the six synthesis FFT pipelines in pairs: all six concurrently
    # multiplies peak HBM ~6x (OOM at NSIDE >= 1024 on a 16 GB chip), while
    # lax.map serializes so hard it is ~10x slower
    s = jnp.concatenate([synthesis_rings(plan, streams[i: i + 2])
                         for i in range(0, 6, 2)])

    sth_pix = plan.rings_to_map(
        jnp.broadcast_to(plan.sth_ring[:, None], (plan.nrings_pad, plan.P))
    )
    cot_pix = plan.rings_to_map(
        jnp.broadcast_to(plan.cot_ring[:, None], (plan.nrings_pad, plan.P))
    )
    pot = s[0]
    gt = s[1]
    gp = s[2] / sth_pix
    gtt = s[3]
    gtp = s[4] / sth_pix - cot_pix * gp
    gpp = s[5] / sth_pix**2 + cot_pix * gt
    return pot, gt, gp, gtt, gtp, gpp
