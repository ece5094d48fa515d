"""UseHEALPixLensPlaneMaps input path + cut-sky vacuum mask."""
import numpy as np
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params
from calclens_tpu.healpix import core as hp
from calclens_tpu.io import healpix_maps
from calclens_tpu.testing import pointmass as pm


def test_mapplane_input_matches_particle_deposit(tmp_path):
    """A point mass fed as a precomputed count map must produce the same
    deflections as the particle path (both NGP at the same pixel)."""
    common = dict(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=6, rayOrder=5, bundleOrder=3,
        partMass=5.0e16, raPointMass=32.0, decPointMass=14.0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        SmoothingBeamFWHM=0.05,
    )
    cfg_p = RayTraceConfig(LensPlanePath=str(tmp_path), LensPlaneName="pm",
                           **common).finalize()
    mass_vec, mass_plane = pm.make_pointmass_planes(cfg_p, snap_to_pixel_order=cfg_p.SHTOrder)
    rt_p = Raytracer(cfg_p)
    rt_p.init_rays()
    for p in range(mass_plane + 1):
        rt_p.step(p)

    # write count maps: counts = mass/partMass at the particle's RING pixel
    npix = int(hp.order2npix(cfg_p.SHTOrder))
    mdir = tmp_path / "maps"
    theta, phi = hp.vec2ang(np.asarray(mass_vec))
    pix = int(hp.ang2pix_ring(theta, phi, cfg_p.SHTOrder))
    for p in range(8):
        counts = np.zeros(npix, np.float32)
        if p == mass_plane:
            counts[pix] = 1.0
        healpix_maps.write_plane_map(str(mdir), "massmap", p, counts)
    cfg_m = RayTraceConfig(
        HEALPixLensPlaneMapPath=str(mdir), HEALPixLensPlaneMapName="massmap",
        HEALPixLensPlaneMapOrder=common["SHTOrder"], **common).finalize()
    assert cfg_m.UseHEALPixLensPlaneMaps
    rt_m = Raytracer(cfg_m)
    rt_m.init_rays()
    for p in range(mass_plane + 1):
        rt_m.step(p)

    np.testing.assert_allclose(np.asarray(rt_m.rays.alpha),
                               np.asarray(rt_p.rays.alpha), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rt_m.rays.n),
                               np.asarray(rt_p.rays.n), atol=1e-9)


def test_vacuum_mask_cutsky():
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=5, rayOrder=5, bundleOrder=3,
        minRa=30.0, maxRa=60.0, minDec=-10.0, maxDec=20.0,
    ).finalize()
    rt = Raytracer(cfg)
    rt.init_rays()
    assert rt.vacmask is not None
    vac = np.asarray(rt.vacmask)
    npix = int(hp.order2npix(cfg.SHTOrder))
    assert vac.shape == (npix,)
    # box interior is never vacuum; far side of the sky is vacuum
    theta, phi = hp.pix2ang_ring(np.arange(npix), cfg.SHTOrder)
    ra, dec = hp.ang2radec(theta, phi)
    inside = (ra >= 30) & (ra <= 60) & (dec >= -10) & (dec <= 20)
    assert not np.any(vac[inside])
    far = (ra >= 180) & (ra <= 270)
    assert np.all(vac[far])
    # rays restricted to the box
    assert len(rt.ray_nest) < npix
