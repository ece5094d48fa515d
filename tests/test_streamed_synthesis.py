"""j-blocked streaming synthesis == unstreamed alm2allmaps (the single-chip
memory lever for NSIDE >= 4096; reference bounds the same memory by 20-ring
chunking, alm2allmaps_transpose_mpi.c:76,256-261)."""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T


def _alm(plan, seed=0):
    rng = np.random.default_rng(seed)
    alm = (rng.normal(size=(plan.nl, plan.nm))
           + 1j * rng.normal(size=(plan.nl, plan.nm)))
    l = np.arange(plan.nl)[:, None]
    m = np.arange(plan.nm)[None, :]
    return jnp.asarray(np.where(m <= l, alm, 0), plan.cdtype)


def test_streamed_matches_unstreamed_scan():
    plan = SHTPlan(5, dtype=jnp.float64)
    plan.use_pallas = False
    alm = _alm(plan)
    ref = T.alm2allmaps(plan, alm)
    plan.synth_stream = 4
    out = T._alm2allmaps_streamed(plan, alm, 4)
    for a, b in zip(ref, out):
        sc = np.max(np.abs(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-10 * sc, rtol=1e-9)


def test_streamed_matches_unstreamed_pallas_interpret():
    plan = SHTPlan(4, dtype=jnp.float32)
    plan.use_pallas = False
    alm = _alm(plan, 1)
    ref = T.alm2allmaps(plan, alm)
    plan.use_pallas = True
    plan._geo_views = {}
    with pltpu.force_tpu_interpret_mode():
        out = T._alm2allmaps_streamed(plan, alm, 2)
    for a, b in zip(ref, out):
        sc = np.max(np.abs(np.asarray(a)))
        err = np.max(np.abs(np.asarray(b) - np.asarray(a)))
        assert err < 3e-5 * sc, err / sc


def test_host_streamed_matches_unstreamed():
    plan = SHTPlan(5, dtype=jnp.float64)
    plan.use_pallas = False
    alm = _alm(plan, 2)
    ref = T.alm2allmaps(plan, alm)
    out = T.alm2allmaps_host_streamed(plan, alm, 4)
    for a, b in zip(ref, out):
        sc = np.max(np.abs(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-10 * sc, rtol=1e-9)


def test_auto_blocks():
    plan = SHTPlan(5, dtype=jnp.float32)
    assert T._synth_stream_blocks(plan) == 1
    plan.synth_stream = 8
    assert T._synth_stream_blocks(plan) == 8


def test_host_streamed_czt_cache_matches(monkeypatch):
    """CALCLENS_CZT_CACHE=1 (plan-cached chirp tables passed into the block
    jits) must be bit-identical to the in-graph table build."""
    monkeypatch.setenv("CALCLENS_CZT_CACHE", "0")
    plan = SHTPlan(5, dtype=jnp.float64)
    plan.use_pallas = False
    alm = _alm(plan, 3)
    ref = T.alm2allmaps_host_streamed(plan, alm, 4)
    monkeypatch.setenv("CALCLENS_CZT_CACHE", "1")
    out = T.alm2allmaps_host_streamed(plan, alm, 4)
    assert plan._czt_tab_cache  # tables were actually built and cached
    for a, b in zip(ref, out):
        sc = np.max(np.abs(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-12 * sc, rtol=1e-12)


def test_host_streamed_pipeline_depths_match(monkeypatch):
    """Depth-1 (fully serialized) and depth-3 pipelines must agree exactly
    with the default depth-2."""
    plan = SHTPlan(5, dtype=jnp.float64)
    plan.use_pallas = False
    alm = _alm(plan, 4)
    outs = []
    for d in ("1", "2", "3"):
        monkeypatch.setenv("CALCLENS_SYNTH_PIPELINE", d)
        outs.append(T.alm2allmaps_host_streamed(plan, alm, 4))
    for o in outs[1:]:
        for a, b in zip(outs[0], o):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
