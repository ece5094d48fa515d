"""Lens maps, restart/resume, CMB propagation, CLI (reference maputils.c,
restart.c, propagate_to_cmb_from_restart.c, main.c)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu import maps as lm
from calclens_tpu import restart as rst
from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer
from calclens_tpu.healpix import core as hp
from calclens_tpu.io import fits
from calclens_tpu.rays.propagate import init_rays
from calclens_tpu.testing import pointmass as pm


def test_comoving_distance_2f1_matches_quadrature():
    from calclens_tpu.cosmology import Cosmology

    cosmo = Cosmology(0.3)
    for z in (0.1, 0.5, 1.0, 2.0):
        ref = cosmo.comvdist(1.0 / (1.0 + z))
        got = float(lm.comoving_distance_2f1(z, 0.3))
        assert abs(got - ref) / ref < 1e-6, (z, got, ref)


def test_map_plane_nums():
    nums = lm.map_plane_nums([0.2, 0.5], 0.3, 4000.0, 100)
    # chi(0.2) ~ 571, chi(0.5) ~ 1322 Mpc/h; binL = 40
    assert nums[0] == round(float(lm.comoving_distance_2f1(0.2, 0.3)) / 40.0)
    assert nums[1] > nums[0]


def test_update_lens_map_and_fits(tmp_path):
    order, map_order = 4, 2
    npix = int(hp.order2npix(order))
    nest = np.arange(npix, dtype=np.int64)
    vec = hp.pix2vec_nest(nest, order)
    rays = init_rays(vec, 100.0, dtype=jnp.float64)
    accum = lm.LensMapAccum.zeros(map_order)
    accum = lm.update_lens_map(accum, rays, jnp.asarray(nest), order, map_order)
    cnt = np.asarray(accum.count)
    assert np.all(cnt == 4 ** (order - map_order))
    # A = I everywhere -> kappa = 0, A00 mean = 1
    conv = lm.convergence_from_accum(accum)
    np.testing.assert_allclose(conv, 0.0, atol=1e-12)

    cpath, rpath = lm.write_map_outputs(accum, map_order, str(tmp_path), 0)
    hdus = fits.read_fits(rpath)
    hdr, rec = hdus[1]
    assert hdr["NSIDE"] == 1 << map_order
    assert str(hdr["ORDERING"]).startswith("NESTED")
    np.testing.assert_allclose(rec["A00"], 1.0)
    np.testing.assert_array_equal(rec["N_RAYS"], cnt)
    hdus_c = fits.read_fits(cpath)
    np.testing.assert_allclose(hdus_c[1][1]["SIGNAL"], 0.0, atol=1e-7)


def _small_cfg(tmp, **kw):
    base = dict(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        LensPlanePath=str(tmp), LensPlaneName="pmplane",
        SHTOrder=5, rayOrder=4, bundleOrder=2,
        partMass=5.0e16, raPointMass=32.0, decPointMass=14.0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        OutputPath=str(tmp / "out"),
        # the default lens-map order (11, reference raytrace.c:44) writes a
        # 2.8 GB Rays_2048 table — minutes of pure disk I/O in a tiny test
        LensMapOrder=4,
    )
    base.update(kw)
    return RayTraceConfig(**base).finalize()


def test_restart_roundtrip_and_resume(tmp_path):
    cfg = _small_cfg(tmp_path)
    pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    os.makedirs(cfg.OutputPath, exist_ok=True)

    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(4):
        rt.step(p)
    rt.save_restart()

    rt2 = Raytracer(cfg)
    rt2.load_restart()
    assert rt2.current_plane == 4
    np.testing.assert_array_equal(rt2.ray_nest, rt.ray_nest)
    for p in range(4, cfg.NumLensPlanes):
        rt.step(p)
        rt2.step(p)
    np.testing.assert_allclose(np.asarray(rt2.A if hasattr(rt2, 'A') else rt2.rays.A),
                               np.asarray(rt.rays.A), rtol=1e-12)

    # incompatible config refuses to resume
    cfg_bad = _small_cfg(tmp_path, rayOrder=5)
    rt3 = Raytracer(cfg_bad)
    with pytest.raises(ValueError):
        rt3.load_restart(os.path.join(cfg.OutputPath, "restart.npz"))


def test_full_run_with_outputs_and_cmb(tmp_path):
    zfile = tmp_path / "zmaps.txt"
    # a redshift whose plane lands inside the run
    zfile.write_text("0.35\n")
    cfg = _small_cfg(tmp_path, MapRedshiftList=str(zfile),
                     RayOutputName="ray_", OutputRayDeflections=True)
    pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    rt = Raytracer(cfg)
    rt.run(progress=False)
    out = os.listdir(cfg.OutputPath)
    assert any(f.startswith("Convergence_") for f in out)
    assert any(f.startswith("Rays_") for f in out)
    assert any(f.startswith("ray_") for f in out)
    assert "restart_orbax" in out  # run() checkpoints shard-parallel

    # CMB propagation from the final state
    accum = rt.propagate_to_cmb(map_order=3)
    assert int(np.asarray(accum.count).sum()) == len(rt.ray_nest)
    r = np.linalg.norm(np.asarray(rt.rays.n), axis=1)
    w_cmb = float(lm.comoving_distance_2f1(1100.0, cfg.OmegaM))
    np.testing.assert_allclose(r, w_cmb, rtol=1e-10)


def test_cli_main(tmp_path):
    cfg = _small_cfg(tmp_path, RayOutputName="ray_")
    pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    cfgfile = tmp_path / "run.cfg"
    cfgfile.write_text(cfg.to_cfg())
    from calclens_tpu.raytrace import main

    assert main([str(cfgfile)]) == 0
    assert os.path.isdir(os.path.join(cfg.OutputPath, "restart_orbax"))


def test_empty_plane_step_is_zero_density_solve():
    """A plane with no particles must behave exactly like solving the
    Poisson equation with nothing in it: zeroed per-plane fields and pure
    geodesic propagation (the reference's explicit zero-particle skip,
    poissondrivers.c:82-157).  Checked two ways: the dedicated skip path
    equals a full SHT solve of an all-zero density map (backdens 0), and
    the driver dispatches to the skip path for an empty particle list."""
    import jax
    from calclens_tpu.poisson import (PlaneScalars, empty_plane_step_packed,
                                      plane_step_density_packed)
    from calclens_tpu.rays import soa

    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=5, rayOrder=4, bundleOrder=2, Precision="f64",
    ).finalize()
    rt = Raytracer(cfg)
    rt.init_rays()
    packed0 = np.asarray(rt.rays_packed)
    dt = rt.dtype

    scal = PlaneScalars(
        densfact=jnp.asarray(1.7, dt), backdens=jnp.asarray(0.0, dt),
        wp=jnp.asarray(750.0, dt), wpm1=jnp.asarray(500.0, dt),
        wpm2=jnp.asarray(250.0, dt))

    out_skip = np.asarray(empty_plane_step_packed(
        False, jnp.asarray(packed0), scal))
    zero_density = jnp.zeros(rt.plan.npix, dt)
    out_zero, _ = plane_step_density_packed(
        rt.plan, rt.tab, jnp.asarray(packed0), zero_density, False, False,
        scal)
    np.testing.assert_allclose(out_skip, np.asarray(out_zero),
                               rtol=1e-12, atol=1e-12)

    # per-plane field rows are zero; rays actually moved (propagation ran)
    rays = soa.unpack(jnp.asarray(out_skip))
    assert np.all(np.asarray(rays.alpha) == 0.0)
    assert np.all(np.asarray(rays.U) == 0.0)
    assert np.all(np.asarray(rays.phi) == 0.0)
    assert not np.allclose(out_skip, packed0)

    # driver dispatch: an empty particle list takes the skip path and
    # produces the same buffer (same plane scalars via plane_params)
    from calclens_tpu.driver import plane_params
    pp = plane_params(cfg, rt.cosmo, 2)
    scal_p = PlaneScalars(
        densfact=jnp.asarray(pp.densfact, dt),
        backdens=jnp.asarray(pp.backdens, dt),
        wp=jnp.asarray(pp.rad_plus1, dt), wpm1=jnp.asarray(pp.rad, dt),
        wpm2=jnp.asarray(pp.rad_minus1, dt))
    ref = np.asarray(empty_plane_step_packed(
        False, jnp.asarray(packed0), scal_p))
    rt.rays_packed = jnp.asarray(packed0)
    rt.step(2, pos=[], mass=[])
    np.testing.assert_allclose(np.asarray(rt.rays_packed), ref,
                               rtol=1e-12, atol=1e-12)


def test_run_with_gals_async_matches_sync(tmp_path, monkeypatch):
    """The driver's async grid-search overlap (search dispatched before the
    plane step, hits collected after) must produce the same image catalogs
    as the synchronous path (CALCLENS_GALS_ASYNC=0)."""
    from calclens_tpu.gals import io as galsio
    from calclens_tpu.io import fits as cfits

    rng = np.random.default_rng(23)
    nsrc = 200
    g = rng.normal(size=(nsrc, 3))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    rad = rng.uniform(300.0, 1900.0, nsrc)
    gpath = tmp_path / "gals.fit"
    galsio.write_source_gals(str(gpath), g * rad[:, None])
    glist = tmp_path / "gals.txt"
    glist.write_text(str(gpath) + "\n")

    def run_mode(sub, async_flag):
        out = tmp_path / sub
        cfg = _small_cfg(tmp_path, OutputPath=str(out),
                         GalsFileList=str(glist), GalOutputName="gal_",
                         minRa=0.0, maxRa=360.0, minDec=-90.0, maxDec=90.0)
        pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
        monkeypatch.setenv("CALCLENS_GALS_ASYNC", async_flag)
        rt = Raytracer(cfg)
        rt.run(progress=False)
        rows = {}
        for f in sorted(os.listdir(out)):
            if f.startswith("gal_"):
                for hdr, data in cfits.read_fits(os.path.join(out, f))[1:]:
                    rows[f] = data
        return rows

    a = run_mode("outA", "1")
    s = run_mode("outS", "0")
    assert set(a) == set(s) and len(a) > 0
    total = 0
    for f in a:
        oa = np.lexsort((a[f]["ra"], a[f]["index"]))
        ob = np.lexsort((s[f]["ra"], s[f]["index"]))
        for c in ("index", "ra", "dec", "A00", "A01", "A10", "A11"):
            np.testing.assert_allclose(np.asarray(a[f][c])[oa],
                                       np.asarray(s[f][c])[ob],
                                       rtol=0, atol=1e-12, err_msg=c)
        total += len(a[f]["index"])
    assert total >= nsrc * 0.9  # nearly every source imaged once


def test_cmb_mode_output_parity(tmp_path):
    """CMB mode writes the reference's full output set
    (propagate_to_cmb_from_restart.c:203-205, 389-492): the rays-at-CMB
    restart-layout file, the single convergence map, and the 7-column ray
    map — and the rays-at-CMB bytes round-trip through the legacy reader
    (whose byte layout is validated against the actual reference binary in
    test_legacy_restart.test_reference_binary_restart_interop)."""
    from calclens_tpu.io import legacy_restart as lr
    from calclens_tpu.raytrace import run_cmb_mode

    cfg = _small_cfg(tmp_path, CMBMapOrder=3)
    pm.make_pointmass_planes(cfg, snap_to_pixel_order=cfg.SHTOrder)
    os.makedirs(cfg.OutputPath, exist_ok=True)
    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(cfg.NumLensPlanes):
        rt.step(p)
    rt.current_plane = cfg.NumLensPlanes

    written = run_cmb_mode(rt)
    names = {os.path.basename(p) for p in written}
    assert names == {"restart_rays_at_cmb.0", "CMB_convergence_8.fits",
                     "CMB_rays_8.fits"}
    for p in written:
        assert os.path.exists(p)

    # rays-at-CMB file: legacy layout, rays at chi(z=1100), bit round-trip
    meta, _, rays, _ = lr.read_legacy_restart_file(
        os.path.join(cfg.OutputPath, "restart_rays_at_cmb.0"))
    assert meta["CurrentPlaneNum"] == cfg.NumLensPlanes
    packed, nest = lr.legacy_rays_to_packed(meta, rays, dtype=np.float64)
    np.testing.assert_array_equal(np.sort(nest), np.sort(rt.ray_nest))
    w_cmb = float(lm.comoving_distance_2f1(1100.0, cfg.OmegaM))
    np.testing.assert_allclose(np.linalg.norm(packed[0:3], axis=0), w_cmb,
                               rtol=1e-10)

    # convergence map: kappa = 1 - (A00+A11)/2 per-pixel mean, 0 where
    # empty, recomputed here from the rays-at-CMB file contents (the
    # reference lowers each ray's initial nest pixel, maputils.c:140)
    hdus = fits.read_fits(os.path.join(cfg.OutputPath,
                                       "CMB_convergence_8.fits"))
    conv = hdus[1][1]["SIGNAL"]
    lpix = nest >> (2 * (cfg.rayOrder - 3))
    npix_map = 12 * 4**3
    cnt = np.bincount(lpix, minlength=npix_map)
    a00 = np.bincount(lpix, weights=packed[6], minlength=npix_map)
    a11 = np.bincount(lpix, weights=packed[9], minlength=npix_map)
    good = cnt > 0
    expect = np.where(good,
                      1.0 - 0.5 * (a00 + a11) / np.where(good, cnt, 1), 0.0)
    np.testing.assert_allclose(conv, expect.astype(np.float32), rtol=2e-5,
                               atol=1e-7)
    assert np.all(conv[~good] == 0.0)

    # 7-column ray map reads back with matching ray counts
    rhdus = fits.read_fits(os.path.join(cfg.OutputPath, "CMB_rays_8.fits"))
    rec = rhdus[1][1]
    assert int(rec["N_RAYS"].sum()) == len(rt.ray_nest)
    np.testing.assert_array_equal(rec["N_RAYS"], cnt)


def test_tunnel_fetch_chunking(monkeypatch):
    """utils.tunnel.fetch: chunked device->host transfer must be exact for
    any shape/dtype when forced down the chunking path (the axon tunnel's
    32 KiB message cap; a plain asarray elsewhere)."""
    import jax.numpy as jnp
    from calclens_tpu.utils import tunnel

    monkeypatch.setattr(tunnel, "_is_axon", lambda: True)
    rng = np.random.default_rng(3)
    for shape, dt in (((21, 3001), np.float32), ((777,), np.int64),
                      ((5, 7, 11), np.float64)):
        h = (rng.normal(size=shape) * 100).astype(dt)
        d = jnp.asarray(h)
        got = tunnel.fetch(d, max_bytes=256)  # force many chunks
        assert got.dtype == h.dtype and got.shape == h.shape
        np.testing.assert_array_equal(got, np.asarray(d))
    # host arrays pass through untouched
    np.testing.assert_array_equal(tunnel.fetch(np.arange(5)), np.arange(5))
