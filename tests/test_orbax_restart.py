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
