"""Multi-chip sharding correctness: the fully-sharded plane step on an
8-device CPU mesh must reproduce the single-device step bit-for-bit (the
analog of the reference's mpirun -np N vs -np 1 check, SURVEY.md section 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calclens_tpu.parallel.sharding import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    import __graft_entry__ as g

    fn1, (packed1, pos1, mass1, scal1) = g._build(order_sht=5, order_ray=5)
    out1 = np.asarray(jax.jit(fn1)(packed1, pos1, mass1, scal1))

    mesh = make_mesh(8)
    fn8, (packed8, pos8, mass8, scal8) = g._build(order_sht=5, order_ray=5,
                                                  mesh=mesh)
    out8 = np.asarray(jax.jit(fn8)(packed8, pos8, mass8, scal8))

    assert out1.shape == out8.shape
    np.testing.assert_allclose(out8, out1, rtol=5e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_buffers_actually_sharded():
    import __graft_entry__ as g

    mesh = make_mesh(8)
    _, (packed, pos, mass, _) = g._build(order_sht=5, order_ray=5, mesh=mesh)
    assert len(packed.sharding.device_set) == 8
    assert len(pos.sharding.device_set) == 8
