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


def _bucketed_vs_oracle_err(order, min_sl, max_sl, csl, seed=7):
    """Deflection-field RMS error of the production bucketed scheme
    (deposit_sph_bucketed + solve_potential_sph windows) vs the exact
    per-particle reference algorithm (testing/sph_oracle.py)."""
    import jax.numpy as jnp
    from calclens_tpu.sht.plan import SHTPlan
    from calclens_tpu.sht import transforms as T
    from calclens_tpu.healpix import jaxhp
    from calclens_tpu.testing import sph_oracle

    plan = SHTPlan(order, dtype=jnp.float64)
    plan.use_pallas = False
    tab = jaxhp.InterpTables(order, dtype=jnp.float64)

    rng = np.random.default_rng(seed)
    N = 150
    vec = rng.normal(size=(N, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    r = rng.uniform(400.0, 1000.0, N)  # 2.5x spread in smoothing length
    pos = vec * r[:, None]
    mass = rng.uniform(0.5, 2.0, N) * 1e14

    sl = np.clip(csl / r, min_sl, max_sl)
    dens_exact = sph_oracle.deposit_sph_exact(order, pos, mass, sl)
    alm_e = T.map2alm(plan, jnp.asarray(dens_exact))

    sigmas = dep.sph_sigma_grid(min_sl, max_sl, 8)
    dens_b = dep.deposit_sph_bucketed(
        order, jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(sl),
        sigmas, plan.npix, tab=tab)
    # production kernel windows incl. the CIC deconvolution
    w2 = dep.pixwin_disc_bl(order, plan.lmax) ** 2
    alm_b = 0.0
    for b, sig in enumerate(sigmas):
        bl = jnp.asarray(dep.kernel_bl(float(sig), plan.lmax) / w2)
        alm_b = alm_b + T.map2alm(plan, dens_b[b]) * bl[:, None]

    ls = np.arange(plan.nl)[:, None]
    inv = np.where(ls > 0, -1.0 / np.maximum(ls * (ls + 1.0), 1.0), 0.0)
    out_b = T.alm2allmaps(plan, alm_b * inv)
    out_e = T.alm2allmaps(plan, alm_e * inv)
    errs = []
    for comp in (1, 2):  # d_theta, d_phi (the deflection components)
        gb, ge = np.asarray(out_b[comp]), np.asarray(out_e[comp])
        errs.append(float(np.sqrt(np.mean((gb - ge) ** 2) / np.mean(ge ** 2))))
    return errs


def test_sph_bucketed_vs_exact_oracle():
    """Plane-level bucketing error vs the exact reference algorithm
    (VERDICT round-1 item 7): < 1% once the kernel is resolved by >~ 5 map
    pixels, < 2.5% down to ~2 pixels (the reference's own resolution floor:
    it samples the kernel with FAC=3 resolution elements, raytrace.h:128)."""
    # sigma = 4.7-11.7 pixels at order 6 (pixel scale 0.0128 rad)
    errs = _bucketed_vs_oracle_err(6, 0.06, 0.15, 60.0)
    assert max(errs) < 0.01, errs
    # sigma = 2.3-6.2 pixels: sub-pixel placement residual dominates
    errs2 = _bucketed_vs_oracle_err(6, 0.03, 0.08, 30.0)
    assert max(errs2) < 0.025, errs2


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
