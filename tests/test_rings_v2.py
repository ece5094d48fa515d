"""Ring-stage v2 (equator rfft + octave-bucketed CZT) vs the uniform CZT."""
import numpy as np
import jax.numpy as jnp

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T
from calclens_tpu.sht.rings import RingStage


def _cross_check(order):
    plan = SHTPlan(order, dtype=jnp.float64)
    plan.use_rings_v2 = False  # old path as reference
    rs = RingStage(order, plan.nm, plan.nrings_pad, dtype=jnp.float64)
    rng = np.random.default_rng(order)
    m = jnp.asarray(rng.normal(size=plan.npix))
    da = np.max(np.abs(np.asarray(rs.analysis(m))
                       - np.asarray(T.analysis_rings(plan, m))))
    Q = jnp.asarray(rng.normal(size=(2, plan.nrings_pad, plan.nm))
                    + 1j * rng.normal(size=(2, plan.nrings_pad, plan.nm)))
    mask = np.zeros((plan.nrings_pad, 1))
    mask[: plan.nrings] = 1
    Q = Q * mask
    ds = np.max(np.abs(np.asarray(rs.synthesis(Q))
                       - np.asarray(T.synthesis_rings(plan, Q))))
    assert da < 1e-11, da
    assert ds < 1e-10, ds


def test_rings_v2_order3():
    _cross_check(3)


def test_rings_v2_order6():
    _cross_check(6)
