"""Cut-sky physics validation (shtpoissonsolve.c:454-502): a ra-dec patch
run — vacuum cells zeroed, live cells backdens-subtracted — must reproduce
the full-sky deflections and magnification matrices for rays inside the
patch.

The window term the vacuum mask introduces (-backdens restricted to the
patch instead of the whole sphere) scales as backdens/peak ~ pixarea/4pi
(one particle), so interior rays must agree to f64 quadrature tolerance.
"""
import numpy as np
import pytest

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer
from calclens_tpu.healpix import core as hp
from calclens_tpu.testing import pointmass as pm

RA0, DEC0 = 32.0, 14.0


def _trace(tmp_path, box):
    kw = dict(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        LensPlanePath=str(tmp_path), LensPlaneName="pmplane",
        SHTOrder=7, rayOrder=6, bundleOrder=3,
        partMass=5.0e16, raPointMass=RA0, decPointMass=DEC0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        ComvSmoothingScale=1.0, SmoothingBeamFWHM=0.024,
    )
    if box:
        kw.update(minRa=RA0 - 20.0, maxRa=RA0 + 20.0,
                  minDec=DEC0 - 20.0, maxDec=DEC0 + 20.0)
    cfg = RayTraceConfig(**kw).finalize()
    mass_vec, mass_plane = pm.make_pointmass_planes(
        cfg, snap_to_pixel_order=cfg.SHTOrder)
    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(mass_plane + 1):
        rt.step(p)
    return cfg, rt, np.asarray(mass_vec)


def test_cutsky_patch_matches_fullsky_interior(tmp_path):
    cfg_f, rt_f, mass_vec = _trace(tmp_path / "full", box=False)
    cfg_c, rt_c, _ = _trace(tmp_path / "cut", box=True)
    assert rt_c.vacmask is not None and rt_f.vacmask is None
    # patch run really is cut-sky: fewer rays, some vacuum cells
    assert len(rt_c._ray_nest) < len(np.asarray(rt_f.rays.n))
    assert np.asarray(rt_c.vacmask).any()

    rays_f, rays_c = rt_f.rays, rt_c.rays
    # match rays by nest pixel: full-sky buffer is ALL pixels in nest-of-ring
    # storage order; recover each buffer's pixel from the initial direction
    def nestpix(rt):
        if rt._ray_nest is not None:
            return np.asarray(rt._ray_nest)
        n = np.asarray(rt.rays.n)
        # initial direction is unchanged only for untraced rays; use beta
        theta, phi = hp.vec2ang(np.asarray(rt.rays.beta))
        return hp.ring2nest(hp.ang2pix_ring(theta, phi, cfg_f.rayOrder),
                            cfg_f.rayOrder)

    pix_c = np.asarray(rt_c._ray_nest)
    theta_c, phi_c = hp.pix2ang_nest(pix_c, cfg_c.rayOrder)
    ra_c, dec_c = hp.ang2radec(theta_c, phi_c)
    # interior: at least 5 deg inside the box edge
    interior = ((ra_c > RA0 - 15) & (ra_c < RA0 + 15)
                & (dec_c > DEC0 - 15) & (dec_c < DEC0 + 15))
    assert interior.sum() > 100

    theta_f, phi_f = hp.vec2ang(np.asarray(rays_f.beta))
    pix_f = hp.ring2nest(hp.ang2pix_ring(theta_f, phi_f, cfg_f.rayOrder),
                         cfg_f.rayOrder)
    lut = np.full(int(hp.order2npix(cfg_f.rayOrder)), -1, np.int64)
    lut[pix_f] = np.arange(len(pix_f))
    sel_f = lut[pix_c[interior]]
    assert np.all(sel_f >= 0)

    # tolerances sit ~10x above the measured physical window term
    # (|diff|/scale ~ 1e-7) and >=100x below the lensing signal itself
    for field, tol in (("n", 1e-6), ("alpha", 5e-3), ("A", 1e-5),
                       ("phi", 1e-5)):
        a = np.asarray(getattr(rays_c, field))[interior]
        b = np.asarray(getattr(rays_f, field))[sel_f]
        scale = max(np.abs(b).max(), 1e-30)
        np.testing.assert_allclose(a, b, atol=tol * scale, err_msg=field)

    # the point-mass deflection itself is order 1e-4 rad here: the match
    # above is much tighter than the signal, not a trivial zero==zero
    assert np.abs(np.asarray(rays_c.alpha)[interior]).max() > 1e-6
