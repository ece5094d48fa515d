"""End-to-end point-mass analytic test (the reference's POINTMASSTEST,
SURVEY.md section 4.1) — the correctness anchor for deposit + SHT Poisson +
interpolation + propagation, all signs and unit factors included."""
import numpy as np
import pytest
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params, gauss_beam
from calclens_tpu.healpix import core as hp
from calclens_tpu.testing import pointmass as pm


@pytest.fixture(scope="module")
def traced(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pmtest")
    cfg = RayTraceConfig(
        OmegaM=0.3,
        maxComvDistance=2000.0,
        NumLensPlanes=8,
        LensPlanePath=str(tmp),
        LensPlaneName="pmplane",
        SHTOrder=7,
        rayOrder=6,
        bundleOrder=3,
        partMass=5.0e16,
        raPointMass=32.0,
        decPointMass=14.0,
        radPointMass=625.0,
        PointMassTest=True,
        Precision="f64",
        ComvSmoothingScale=1.0,
        # ~3 map pixels: suppresses the non-band-limited ringing of the pixel
        # delta so the bilinear interpolation error dominates (the analytic
        # reference below applies the same beam)
        SmoothingBeamFWHM=0.024,
    ).finalize()

    mass_vec, mass_plane = pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    rt = Raytracer(cfg)
    rt.init_rays()

    alpha_at_lens = None
    gamma_at_lens = None
    for p in range(cfg.NumLensPlanes):
        rt.step(p)
        if p == mass_plane:
            # per-plane alpha was just used in the propagation; capture it
            alpha_at_lens = np.array(rt.rays.alpha)
            nhat = np.array(rt.rays.n)
            nhat = nhat / np.linalg.norm(nhat, axis=1, keepdims=True)
            # n is now at plane p+1; separations unchanged to O(alpha)
            gamma_at_lens = np.arccos(np.clip(nhat @ mass_vec, -1, 1))
    return cfg, rt, mass_vec, mass_plane, alpha_at_lens, gamma_at_lens


def test_deflection_vs_analytic(traced):
    cfg, rt, mass_vec, mass_plane, alpha, gamma = traced
    pp = plane_params(cfg, rt.cosmo, mass_plane)
    q = pm.charge(cfg, rt.cosmo, pp.rad)
    amag = np.linalg.norm(alpha, axis=1)

    bl = gauss_beam(cfg.SmoothingBeamFWHM, rt.plan.lmax)
    sel = (gamma > 0.05) & (gamma < 0.5)
    ref_band = pm.alpha_bandlimited(gamma[sel], q, rt.plan.lmax, bl=bl)
    err = np.abs(amag[sel] - ref_band) / np.abs(ref_band)
    # interpolation + quadrature errors only (truncation is in ref_band)
    assert np.median(err) < 0.01, np.median(err)
    assert np.percentile(err, 95) < 0.05

    # far field matches the exact cot(gamma/2) law too
    sel2 = (gamma > 0.15) & (gamma < 0.6)
    ref_exact = pm.alpha_exact(gamma[sel2], q)
    err2 = np.abs(amag[sel2] - ref_exact) / ref_exact
    assert np.median(err2) < 0.02, np.median(err2)


def test_deflection_direction_toward_mass(traced):
    cfg, rt, mass_vec, mass_plane, alpha, gamma = traced
    # reconstruct theta/phi basis at each ray and check alpha points at mass
    n = np.array(rt.rays.n)
    nhat = n / np.linalg.norm(n, axis=1, keepdims=True)
    sel = (gamma > 0.1) & (gamma < 0.4)
    phihat = np.stack([-nhat[:, 1], nhat[:, 0], np.zeros(len(nhat))], 1)
    phihat /= np.linalg.norm(phihat, axis=1, keepdims=True)
    thetahat = np.cross(phihat, nhat)
    thetahat /= np.linalg.norm(thetahat, axis=1, keepdims=True)
    avec = alpha[:, :1] * thetahat + alpha[:, 1:2] * phihat
    # direction toward the mass projected on the tangent plane
    tomass = mass_vec[None, :] - nhat * (nhat @ mass_vec)[:, None]
    tomass /= np.linalg.norm(tomass, axis=1, keepdims=True)
    cosang = np.sum(avec[sel] * tomass[sel], axis=1) / np.linalg.norm(avec[sel], axis=1)
    assert np.median(cosang) > 0.999


def test_final_shear_vs_analytic(traced):
    cfg, rt, mass_vec, mass_plane, alpha, gamma_lens = traced
    pp = plane_params(cfg, rt.cosmo, mass_plane)
    q = pm.charge(cfg, rt.cosmo, pp.rad)
    A = np.array(rt.rays.A)
    kappa = 1.0 - 0.5 * (A[:, 0, 0] + A[:, 1, 1])
    g1 = 0.5 * (A[:, 1, 1] - A[:, 0, 0])
    g2 = -0.5 * (A[:, 0, 1] + A[:, 1, 0])
    shear = np.sqrt(g1**2 + g2**2)

    sel = (gamma_lens > 0.15) & (gamma_lens < 0.4)
    ref = pm.shear_tangential(gamma_lens[sel], q, pp.rad, cfg.maxComvDistance)
    err = np.abs(shear[sel] - ref) / ref
    assert np.median(err) < 0.05, np.median(err)
    # convergence ~ 0 away from the mass
    assert np.median(np.abs(kappa[sel])) < 0.05 * np.median(ref)


def test_ray_positions_bend(traced):
    """Final angular positions satisfy beta = theta - (ws-wl)/ws * alpha."""
    cfg, rt, mass_vec, mass_plane, alpha, gamma_lens = traced
    pp = plane_params(cfg, rt.cosmo, mass_plane)
    q = pm.charge(cfg, rt.cosmo, pp.rad)
    ws = cfg.maxComvDistance
    n = np.array(rt.rays.n)
    nhat = n / np.linalg.norm(n, axis=1, keepdims=True)
    gamma_final = np.arccos(np.clip(nhat @ mass_vec, -1, 1))
    # initial gamma from the undeflected grid
    vec0 = hp.pix2vec_nest(rt.ray_nest, cfg.rayOrder)
    gamma0 = np.arccos(np.clip(vec0 @ mass_vec, -1, 1))
    sel = (gamma0 > 0.1) & (gamma0 < 0.4)
    pred = gamma0[sel] - (ws - pp.rad) / ws * pm.alpha_exact(gamma0[sel], q)
    err = np.abs(gamma_final[sel] - pred) / pm.alpha_exact(gamma0[sel], q)
    # prediction and trace agree to a few % of the deflection itself
    assert np.median(err) < 0.05, np.median(err)


def test_radial_distance_correct(traced):
    cfg, rt, *_ = traced
    r = np.linalg.norm(np.array(rt.rays.n), axis=1)
    assert np.allclose(r, cfg.maxComvDistance, rtol=1e-10)
