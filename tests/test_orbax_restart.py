"""Orbax checkpoint of the packed ray buffer (multi-host production form)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu.config import RayTraceConfig
from calclens_tpu import restart as rst


def _cfg(**kw):
    base = dict(OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
                rayOrder=4, bundleOrder=2, SHTOrder=4)
    base.update(kw)
    return RayTraceConfig(**base).finalize()


def test_orbax_roundtrip(tmp_path):
    cfg = _cfg()
    packed = jnp.asarray(
        np.random.default_rng(0).normal(size=(21, 3072)), jnp.float32)
    path = os.path.join(str(tmp_path), "ckpt")
    rst.write_restart_orbax(path, cfg, packed, None, 3, 1)
    r2, nest, cp, mn = rst.read_restart_orbax(path, cfg)
    assert cp == 3 and mn == 1 and nest is None
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(packed))

    # config-compat validation refuses mismatched runs
    with pytest.raises(ValueError):
        rst.read_restart_orbax(path, _cfg(rayOrder=5))


def test_orbax_elastic_resume_across_device_counts(tmp_path):
    """Save on the 8-device mesh, resume single-device (and the reverse):
    the continued trace must match a straight-through run.  The reference
    PINS restart to identical NTasks (restart.c:66-124) — elasticity across
    device counts is a capability the checkpoint format must guarantee."""
    import jax
    import numpy as np
    from calclens_tpu.driver import Raytracer
    from calclens_tpu.parallel.sharding import make_mesh

    cfg = _cfg(SHTOrder=5, rayOrder=5, Precision="f64")
    rng = np.random.default_rng(17)
    v = rng.normal(size=(4096, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mass = np.full(4096, 5.0e15)

    def planes(rt, lo, hi):
        for p in range(lo, hi):
            rt.step(p, pos=v * (125.0 + 250.0 * p), mass=mass)

    mesh = make_mesh(8)

    # straight-through single-device reference
    rt_ref = Raytracer(cfg)
    rt_ref.init_rays()
    planes(rt_ref, 0, 4)
    ref = np.asarray(rt_ref.rays_packed)

    # save on 8 -> resume on 1
    rt8 = Raytracer(cfg, mesh=mesh)
    rt8.init_rays()
    planes(rt8, 0, 2)
    p8 = os.path.join(str(tmp_path), "ck8")
    rt8.save_restart_orbax(p8)
    rt1 = Raytracer(cfg)
    rt1.load_restart_orbax(p8)
    assert rt1.current_plane == 2
    planes(rt1, 2, 4)
    np.testing.assert_allclose(np.asarray(rt1.rays_packed), ref,
                               rtol=1e-12, atol=1e-13)

    # save on 1 -> resume on 8
    rt1b = Raytracer(cfg)
    rt1b.init_rays()
    planes(rt1b, 0, 2)
    p1 = os.path.join(str(tmp_path), "ck1")
    rt1b.save_restart_orbax(p1)
    rt8b = Raytracer(cfg, mesh=mesh)
    rt8b.load_restart_orbax(p1)
    assert len(rt8b.rays_packed.sharding.device_set) == 8
    planes(rt8b, 2, 4)
    np.testing.assert_allclose(np.asarray(rt8b.rays_packed), ref,
                               rtol=1e-12, atol=1e-13)
