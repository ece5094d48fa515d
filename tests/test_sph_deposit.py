"""SPH deposit scheme (sigma-bucketed harmonic smoothing; reference
shtpoissonsolve.c:187-291 + partsmoothdens.c)."""
import numpy as np
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params
from calclens_tpu.ops import deposit as dep
from calclens_tpu.testing import pointmass as pm


def test_kernel_bl_properties():
    bl = dep.kernel_bl(0.05, 200)
    assert abs(bl[0] - 1.0) < 1e-12
    assert np.all(bl[:50] > 0)
    # smoothing suppresses small scales: decreasing at l ~ 1/sigma
    assert bl[150] < bl[10]


def test_smoothing_lengths_clamped():
    pos = jnp.asarray([[100.0, 0, 0], [1000.0, 0, 0], [10000.0, 0, 0]])
    sl = np.asarray(dep.smoothing_lengths(pos, 1.0, 1e-3, 5e-3))
    np.testing.assert_allclose(sl, [5e-3, 1e-3, 1e-3])


def test_sph_pointmass_farfield_matches_analytic(tmp_path):
    """Far outside the smoothing scale, the SPH-deposited point mass deflects
    exactly like the NGP one (exterior field of a compact kernel)."""
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        LensPlanePath=str(tmp_path), LensPlaneName="pmplane",
        SHTOrder=6, rayOrder=5, bundleOrder=3,
        partMass=5.0e16, raPointMass=32.0, decPointMass=14.0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        ComvSmoothingScale=10.0, DepositScheme="SPH",
        SmoothingBeamFWHM=0.05,
    ).finalize()
    mass_vec, mass_plane = pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(mass_plane + 1):
        rt.step(p)
        if p == mass_plane:
            alpha = np.asarray(rt.rays.alpha)
            n = np.asarray(rt.rays.n)
            nhat = n / np.linalg.norm(n, axis=1, keepdims=True)
            gamma = np.arccos(np.clip(nhat @ np.asarray(mass_vec), -1, 1))
    pp = plane_params(cfg, rt.cosmo, mass_plane)
    q = pm.charge(cfg, rt.cosmo, pp.rad)
    amag = np.hypot(alpha[:, 0], alpha[:, 1])
    # sigma ~ ComvSmoothingScale/chi = 0.016 rad; compare well outside it
    sel = (gamma > 0.25) & (gamma < 0.6)
    ref = pm.alpha_exact(gamma[sel], q)
    rel = np.abs(amag[sel] - ref) / ref
    assert np.median(rel) < 0.05, np.median(rel)
