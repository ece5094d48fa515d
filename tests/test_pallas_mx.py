"""MXU-contraction Legendre synthesis vs the XLA scan reference
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T
from calclens_tpu.sht import pallas_legendre_mx as MX


def _setup(seed=0):
    p = SHTPlan(4, dtype=jnp.float32)
    p.use_pallas = False
    rng = np.random.default_rng(seed)
    alm = (rng.normal(size=(p.nl, p.nm))
           + 1j * rng.normal(size=(p.nl, p.nm))).astype(np.complex64)
    l = np.arange(p.nl)[:, None]
    m = np.arange(p.nm)[None, :]
    return p, jnp.asarray(np.where(m <= l, alm, 0))


def test_mx_synthesis_derivs_matches_scan():
    plan, alm = _setup()
    qN_ref, qS_ref = T.legendre_synthesis(plan, alm, True)
    with pltpu.force_tpu_interpret_mode():
        qN_p, qS_p = MX.synthesis_pallas_mx(plan, alm, True, TM=8, TJ=128,
                                            LB=16)
    for k in range(3):
        sc = np.max(np.abs(np.asarray(qN_ref[k])))
        assert np.max(np.abs(np.asarray(qN_p[k]) - np.asarray(qN_ref[k]))) < 1e-5 * sc, k
        assert np.max(np.abs(np.asarray(qS_p[k]) - np.asarray(qS_ref[k]))) < 1e-5 * sc, k


def test_mx_synthesis_phi_matches_scan():
    plan, alm = _setup(1)
    qN_ref, qS_ref = T.legendre_synthesis(plan, alm, False)
    with pltpu.force_tpu_interpret_mode():
        qN_p, qS_p = MX.synthesis_pallas_mx(plan, alm, False, TM=8, TJ=128,
                                            LB=16)
    sc = np.max(np.abs(np.asarray(qN_ref[0])))
    assert np.max(np.abs(np.asarray(qN_p[0]) - np.asarray(qN_ref[0]))) < 1e-5 * sc
    assert np.max(np.abs(np.asarray(qS_p[0]) - np.asarray(qS_ref[0]))) < 1e-5 * sc

