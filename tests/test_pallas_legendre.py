"""Pallas Legendre kernels vs the XLA scan reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T
from calclens_tpu.sht import pallas_legendre as PL


def _plan():
    p = SHTPlan(4, dtype=jnp.float32)
    p.use_pallas = False  # scan path for the reference values
    return p


def test_synthesis_matches_scan():
    plan = _plan()
    rng = np.random.default_rng(0)
    alm = (rng.normal(size=(plan.nl, plan.nm))
           + 1j * rng.normal(size=(plan.nl, plan.nm))).astype(np.complex64)
    l = np.arange(plan.nl)[:, None]
    m = np.arange(plan.nm)[None, :]
    alm = jnp.asarray(np.where(m <= l, alm, 0))
    qN_ref, qS_ref = T.legendre_synthesis(plan, alm, True)
    with pltpu.force_tpu_interpret_mode():
        qN_p, qS_p = PL.synthesis_pallas(plan, alm, True, TM=8, TJ=128, LB=16)
    for k in range(3):
        sc = np.max(np.abs(np.asarray(qN_ref[k])))
        assert np.max(np.abs(np.asarray(qN_p[k]) - np.asarray(qN_ref[k]))) < 5e-6 * sc
        assert np.max(np.abs(np.asarray(qS_p[k]) - np.asarray(qS_ref[k]))) < 5e-6 * sc


def test_analysis_matches_scan():
    plan = _plan()
    rng = np.random.default_rng(1)
    E = jnp.asarray((rng.normal(size=(plan.nm, plan.J))
                     + 1j * rng.normal(size=(plan.nm, plan.J))).astype(np.complex64))
    O = jnp.asarray((rng.normal(size=(plan.nm, plan.J))
                     + 1j * rng.normal(size=(plan.nm, plan.J))).astype(np.complex64))
    alm_ref = T.legendre_analysis(plan, E, O)
    with pltpu.force_tpu_interpret_mode():
        alm_p = PL.analysis_pallas(plan, E, O, TM=8, TJ=128, LB=16)
    sc = np.max(np.abs(np.asarray(alm_ref)))
    assert np.max(np.abs(np.asarray(alm_p) - np.asarray(alm_ref))) < 5e-6 * sc


def test_analysis_dot_matches_scan():
    """MXU-contraction analysis variant (CALCLENS_ANA_DOT) vs the scan."""
    plan = _plan()
    rng = np.random.default_rng(2)
    E = jnp.asarray((rng.normal(size=(plan.nm, plan.J))
                     + 1j * rng.normal(size=(plan.nm, plan.J))).astype(np.complex64))
    O = jnp.asarray((rng.normal(size=(plan.nm, plan.J))
                     + 1j * rng.normal(size=(plan.nm, plan.J))).astype(np.complex64))
    alm_ref = T.legendre_analysis(plan, E, O)
    prev = PL._ANA_DOT
    PL._ANA_DOT = True
    try:
        with pltpu.force_tpu_interpret_mode():
            alm_p = PL.analysis_pallas(plan, E, O, TM=8, TJ=128, LB=16)
    finally:
        PL._ANA_DOT = prev
    sc = np.max(np.abs(np.asarray(alm_ref)))
    assert np.max(np.abs(np.asarray(alm_p) - np.asarray(alm_ref))) < 5e-6 * sc
