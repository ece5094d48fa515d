"""NFW halo analytic test (reference NFWHALOTEST,
make_lensplanes_pointmass_test.c:247-367)."""
import numpy as np
import pytest

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params
from calclens_tpu.testing import pointmass as pm


def test_nfw_sampling_profile():
    rng = np.random.default_rng(1)
    r200, conc = 1.5, 6.0
    offs = pm.sample_nfw(rng, 100000, r200, conc, rmax=r200)
    r = np.linalg.norm(offs, axis=1)
    # enclosed-mass fractions match the NFW m(<r) = mu(x c)/mu(c)
    mu = lambda x: np.log(1 + x) - x / (1 + x)
    for f in (0.25, 0.5, 0.75):
        want = mu(f * conc) / mu(conc)
        got = np.mean(r < f * r200)
        assert abs(got - want) < 0.01, (f, got, want)


@pytest.mark.slow
def test_nfw_halo_deflection(tmp_path):
    conc = 5.0
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=800.0, NumLensPlanes=8,
        LensPlanePath=str(tmp_path), LensPlaneName="nfwplane",
        SHTOrder=7, rayOrder=6, bundleOrder=3,
        partMass=2.0e17, raPointMass=32.0, decPointMass=14.0,
        radPointMass=150.0, NFWHaloTest=True, Precision="f64",
        SmoothingBeamFWHM=0.01,
    ).finalize()
    vec, mass_plane, r200 = pm.make_nfw_planes(cfg, n_parts=100000, conc=conc)
    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(mass_plane + 1):
        rt.step(p)
        if p == mass_plane:
            alpha = np.asarray(rt.rays.alpha)
            n = np.asarray(rt.rays.n)
            nhat = n / np.linalg.norm(n, axis=1, keepdims=True)
            gamma = np.arccos(np.clip(nhat @ vec, -1, 1))
    pp = plane_params(cfg, rt.cosmo, mass_plane)
    amag = np.hypot(alpha[:, 0], alpha[:, 1])
    # compare at transverse radii well inside r200 (sampled halo truncated
    # there; untruncated analytic M2D drifts high near the edge) but above
    # the map resolution
    gmin = 2.0 * cfg.SmoothingBeamFWHM
    gmax = 0.6 * r200 / pp.rad
    sel = (gamma > gmin) & (gamma < gmax)
    assert sel.sum() > 20
    ref = pm.alpha_nfw(gamma[sel], cfg, rt.cosmo, pp.rad, r200, conc,
                       cfg.partMass)
    rel = np.abs(amag[sel] - ref) / ref
    assert np.median(rel) < 0.15, np.median(rel)
