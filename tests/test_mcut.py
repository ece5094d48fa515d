"""Turning-point m cutoff: margin validation + cut-vs-full equivalence.

The SHT skips m columns beyond m_cutoff(lmax, sin(theta_max)) in the
Legendre sweep (transforms._legendre_synth_dispatch) because
max_{l <= lmax} |lambda_lm(theta)| is below f32 significance there — the
m-side view of the reference's lmin cutoff (healpix_shtrans.c:533-544).
These tests (a) verify that claim directly against the f64 scaled
recurrence at several scales including the production lmax, and (b) check
the streamed synthesis with the cutoff active matches the uncut transform.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T


def _log2_lam_envelope(lmax, sth, ms):
    """max over l of log2 |lambda_lm(theta)| for each m in ms (f64 scaled
    recurrence over l, vectorized over m)."""
    ms = np.asarray(ms, dtype=np.int64)
    cth = np.sqrt(max(0.0, 1.0 - sth * sth))
    # seed lambda_mm via log space: ln lambda_mm = C(m) + m ln sth - 0.5 ln 4pi
    mm = np.arange(1, lmax + 1, dtype=np.float64)
    C = np.concatenate([[0.0], 0.5 * np.cumsum(np.log((2 * mm + 1) / (2 * mm)))])
    ln_seed = C[ms] + ms * np.log(sth) - 0.5 * np.log(4 * np.pi)
    # scaled recurrence: p * 2^e with e tracked per m
    e = np.floor(ln_seed / np.log(2.0))
    p = np.exp(ln_seed - e * np.log(2.0))
    pp = np.zeros_like(p)
    best = np.log2(np.abs(p) + 1e-300) + e
    for l in range(int(ms.min()) + 1, lmax + 1):
        lf = float(l)
        mf = ms.astype(np.float64)
        act = l > ms
        den = np.maximum((lf - mf) * (lf + mf), 1.0)
        a = np.sqrt((2 * lf - 1) * (2 * lf + 1) / den)
        bnum = np.maximum((lf - 1 - mf) * (lf - 1 + mf), 0.0)
        b = np.sqrt(bnum / np.maximum((2 * lf - 3) * (2 * lf - 1), 1.0))
        new = np.where(act, a * (cth * p - b * pp), p)
        pp = np.where(act, p, pp)
        p = new
        # renormalize to keep p in range
        with np.errstate(divide="ignore"):
            sc = np.where(np.abs(p) > 0, np.floor(np.log2(np.abs(p) + 1e-300)), 0.0)
        sc = np.where(np.abs(sc) > 100, sc, 0.0)
        p = p * 2.0 ** (-sc)
        pp = pp * 2.0 ** (-sc)
        e = e + sc
        best = np.maximum(best,
                          np.where(act | (l == ms),
                                   np.log2(np.abs(p) + 1e-300) + e, -np.inf))
    return best


@pytest.mark.parametrize("lmax,sth", [
    (1535, 0.1), (1535, 0.35), (6143, 0.08), (12287, 0.05), (12287, 0.4),
])
def test_envelope_below_f32_at_cutoff(lmax, sth):
    nm = lmax + 1
    mc = T.m_cutoff(lmax, sth, nm, granularity=1)
    if mc >= nm:
        pytest.skip("cutoff inactive at this scale")
    # sample m from the cutoff upward; every sampled column must be
    # negligible at f32 (lambda values are O(1) at their largest)
    ms = np.unique(np.linspace(mc, nm - 1, 8).astype(np.int64))
    env = _log2_lam_envelope(lmax, sth, ms)
    assert np.all(env < np.log2(1e-9)), (mc, ms, env)


def test_envelope_large_just_below_cutoff():
    """The cutoff must not be wastefully loose: somewhere within the margin
    below it the envelope is still f32-significant."""
    lmax, sth = 1535, 0.35
    nm = lmax + 1
    mc = T.m_cutoff(lmax, sth, nm, granularity=1)
    m_turn = int(lmax * sth)  # at the turning point lambda is O(1)
    env = _log2_lam_envelope(lmax, sth, np.asarray([m_turn - 2]))
    assert env[0] > np.log2(1e-6)
    assert mc - m_turn < 600  # margin stays a small additive band


def test_streamed_synthesis_with_mcut_matches_full():
    """CPU streamed path at order 8 / lmax 3*nside-1: polar j-blocks carry
    an active cutoff (mcut < nm); result must match the unstreamed
    transform.  Runs in f64 so the comparison resolves far below the f32
    significance the margin targets."""
    order = 8
    plan = SHTPlan(order, dtype=jnp.float64)
    plan_s = SHTPlan(order, dtype=jnp.float64)
    plan_s.synth_stream = 8
    # the cutoff must actually engage on the most polar block
    from calclens_tpu.sht.transforms import _geo_view
    v0 = _geo_view(plan_s, 0, plan_s.J // 8)
    assert v0.mcut < plan_s.nm, (v0.mcut, plan_s.nm)

    rng = np.random.default_rng(3)
    l = np.arange(plan.nl)[:, None]
    m = np.arange(plan.nm)[None, :]
    alm = np.where(
        m <= l,
        rng.normal(size=(plan.nl, plan.nm))
        + 1j * rng.normal(size=(plan.nl, plan.nm)), 0.0)
    ref = T.alm2allmaps(plan, jnp.asarray(alm))
    out = T.alm2allmaps(plan_s, jnp.asarray(alm))
    for k in range(6):
        sc = float(np.max(np.abs(np.asarray(ref[k]))))
        err = float(np.max(np.abs(np.asarray(out[k]) - np.asarray(ref[k]))))
        assert err < 2e-8 * sc, (k, err / sc)


def test_mx_kernel_mcut_slicing_matches_scan():
    """Interpret-mode MX kernel with an explicit mcut: mechanics of the
    grid shrink + zero-fill (the physics of the margin is covered above).
    Reference: the scan path with the same columns zeroed."""
    from jax.experimental.pallas import tpu as pltpu
    from calclens_tpu.sht import pallas_legendre_mx as MX

    plan = SHTPlan(4, dtype=jnp.float32)
    plan.use_pallas = False
    rng = np.random.default_rng(7)
    l = np.arange(plan.nl)[:, None]
    m = np.arange(plan.nm)[None, :]
    alm = np.where(
        m <= l,
        (rng.normal(size=(plan.nl, plan.nm))
         + 1j * rng.normal(size=(plan.nl, plan.nm))), 0.0).astype(np.complex64)
    mcut = 24
    alm_cut = np.where(m < mcut, alm, 0.0).astype(np.complex64)
    qN_ref, qS_ref = T.legendre_synthesis(plan, jnp.asarray(alm_cut), True)
    with pltpu.force_tpu_interpret_mode():
        qN, qS = MX.synthesis_pallas_mx(plan, jnp.asarray(alm), True,
                                        TM=8, TJ=128, LB=16, mcut=mcut)
    for k in range(3):
        sc = np.max(np.abs(np.asarray(qN_ref[k]))) + 1e-30
        assert np.max(np.abs(np.asarray(qN[k]) - np.asarray(qN_ref[k]))) < 1e-5 * sc
        assert np.max(np.abs(np.asarray(qS[k]) - np.asarray(qS_ref[k]))) < 1e-5 * sc


def test_analysis_kernel_mcut_masking_mechanics():
    """Interpret-mode analysis kernel with a hand-forced per-j-tile cutoff
    array: skipped (m-tile, j-tile) pairs must contribute exactly zero —
    equivalent to zeroing those E/O entries in the scan reference.

    Uses the GENERIC Pallas interpreter (interpret=True): the j>0 grid
    steps revisit earlier alm output blocks, which real Mosaic handles by
    re-fetching (validated on hardware) but force_tpu_interpret_mode's
    revisit checker rejects."""
    from calclens_tpu.sht import pallas_legendre as PL

    plan = SHTPlan(4, dtype=jnp.float32)
    plan.use_pallas = False
    rng = np.random.default_rng(11)
    nm, J, nl = plan.nm, plan.J, plan.nl
    E = (rng.normal(size=(nm, J)) + 1j * rng.normal(size=(nm, J))
         ).astype(np.complex64)
    O = (rng.normal(size=(nm, J)) + 1j * rng.normal(size=(nm, J))
         ).astype(np.complex64)

    TM, TJ, LB = 8, 16, 16
    nm_pad = -(-nm // TM) * TM
    J_pad = -(-J // TJ) * TJ
    nl_pad = -(-nl // LB) * LB
    njt = J_pad // TJ
    # cut tile 0 at m=16, tile 1 fully off, others full
    mcuts = np.full((1, njt), nm, np.int32)
    mcuts[0, 0] = 16
    if njt > 1:
        mcuts[0, 1] = 0

    def prep(x):
        out = np.zeros((nm_pad, J_pad), np.float32)
        out[:nm, :J] = x
        return jnp.asarray(out)

    geo = jnp.asarray(np.stack([
        np.pad(np.asarray(plan.cth, np.float32), (0, J_pad - J)),
        np.pad(np.asarray(plan.sth, np.float32), (0, J_pad - J)),
        np.pad(np.asarray(plan.cot, np.float32), (0, J_pad - J)),
        np.pad(np.asarray(plan.inv_sth, np.float32), (0, J_pad - J)),
        np.pad(np.asarray(plan.ln_sth, np.float32), (0, J_pad - J)),
    ]))
    from calclens_tpu.sht.pallas_legendre_mx import _logc_table
    logc = jnp.asarray(_logc_table(nm_pad))
    key = (nl_pad, nm_pad, J_pad, LB, TM, TJ, 8)
    almre, almim = PL._analysis_alm(
        key, jnp.asarray(mcuts),
        prep(E.real), prep(E.imag), prep(O.real), prep(O.imag),
        geo, logc, nl, interpret=True)
    got = (np.asarray(almre) + 1j * np.asarray(almim))[:nl, :nm]

    # reference: scan path with the same E/O entries masked out
    Em, Om = E.copy(), O.copy()
    for t in range(njt):
        mc = int(mcuts[0, t])
        j0, j1 = t * TJ, min((t + 1) * TJ, J)
        # tile skip is at m-tile granularity: tile skipped iff mi*TM >= mc
        mstart = -(-mc // TM) * TM
        Em[mstart:, j0:j1] = 0
        Om[mstart:, j0:j1] = 0
    ref = np.asarray(T.legendre_analysis(plan, jnp.asarray(Em),
                                         jnp.asarray(Om)))
    sc = np.max(np.abs(ref)) + 1e-30
    assert np.max(np.abs(got - ref)) < 1e-5 * sc
