"""Multigrid refinement (reference mgpoissonsolve.c): solver convergence +
non-SHTONLY point-mass physics."""
import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu import mg
from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params
from calclens_tpu.testing import pointmass as pm


def test_fas_solver_converges_to_discrete_solution():
    L = 0.2
    levels = tuple(mg.build_levels(L, 64))
    lev = levels[0]
    N = lev.N
    i = np.arange(N)
    th = i * lev.dL + lev.thetaLoc
    ph = i * lev.dL + lev.phiLoc
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    u_exact = np.stack([
        np.sin(40 * (TH - np.pi / 2)) * np.cos(35 * PH),
        np.cos(25 * (TH - np.pi / 2)) * np.sin(20 * PH) + 0.2,
    ])
    u_exact = jnp.asarray(u_exact)
    rhs = mg.lop(u_exact, lev)
    ghost = np.zeros((N, N))
    ghost[0, :] = ghost[-1, :] = ghost[:, 0] = ghost[:, -1] = 1
    u0 = u_exact * jnp.asarray(ghost)
    u = mg.solve_fas(u0, rhs, levels, ncycles=20, npre=2, npost=2)
    err = np.max(np.abs(np.asarray(u - u_exact)[:, 1:-1, 1:-1]))
    assert err < 1e-4, err


def test_levels_and_patch_sizing():
    assert mg.patch_interior_sizes(64) == [64, 32, 16, 8, 4]
    assert mg.patch_interior_sizes(80) == [80, 40, 20, 10, 5]
    n = mg.choose_patch_n(0.4, 0.4 / 128)
    assert n >= mg.NUM_MGPATCH_MIN


@pytest.mark.slow
def test_mg_pointmass_deflection(tmp_path):
    """Non-SHTONLY: a LOW-lmax SHT (long range/BC) + multigrid refinement
    must recover the point-mass deflection including scales the SHT alone
    cannot resolve."""
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        LensPlanePath=str(tmp_path), LensPlaneName="pmplane",
        SHTOrder=5, rayOrder=6, bundleOrder=2,
        partMass=5.0e16, raPointMass=32.0, decPointMass=14.0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        SHTOnly=False,
    ).finalize()
    mass_vec, mass_plane = pm.make_pointmass_planes(cfg)
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
    # windows: inside the patch of the mass's cell but off the grid spike
    sel = (gamma > 0.08) & (gamma < 0.25)
    ref = pm.alpha_exact(gamma[sel], q)
    rel = np.abs(amag[sel] - ref) / ref
    assert np.median(rel) < 0.2, np.median(rel)

    # direction toward the mass
    phihat = np.stack([-nhat[:, 1], nhat[:, 0], np.zeros(len(nhat))], 1)
    phihat /= np.linalg.norm(phihat, axis=1, keepdims=True)
    thetahat = np.cross(phihat, nhat)
    avec = alpha[:, :1] * thetahat + alpha[:, 1:2] * phihat
    tomass = np.asarray(mass_vec)[None, :] - nhat * (nhat @ np.asarray(mass_vec))[:, None]
    tomass /= np.linalg.norm(tomass, axis=1, keepdims=True)
    cosang = np.sum(avec[sel] * tomass[sel], 1) / np.linalg.norm(avec[sel], axis=1)
    assert np.median(cosang) > 0.99
