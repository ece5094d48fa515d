"""FITS writer/reader and ray-output layout tests (reference rayio.c)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.healpix import core as hp
from calclens_tpu.io import fits, rayio
from calclens_tpu.rays import frames
from calclens_tpu.rays.propagate import Rays, init_rays


def test_fits_image_bintable_roundtrip(tmp_path):
    img = np.arange(24, dtype=np.int64)
    rec = np.zeros(5, dtype=np.dtype([("nest", "<i8"), ("ra", "<f8"), ("w", "<f4")]))
    rec["nest"] = np.arange(5)
    rec["ra"] = np.linspace(0, 359, 5)
    rec["w"] = 2.5
    fn = str(tmp_path / "t.fits")
    fits.write_fits(fn, [
        fits.image_hdu(img, header={"NumFiles": (3, "files")}),
        fits.bintable_hdu(rec, name="Rays"),
    ])
    hdus = fits.read_fits(fn)
    assert len(hdus) == 2
    hdr0, data0 = hdus[0]
    assert hdr0["SIMPLE"] is True
    assert hdr0["NumFiles"] == 3
    np.testing.assert_array_equal(data0, img)
    hdr1, data1 = hdus[1]
    assert hdr1["XTENSION"].startswith("BINTABLE")
    np.testing.assert_array_equal(data1["nest"], rec["nest"])
    np.testing.assert_allclose(data1["ra"], rec["ra"])
    np.testing.assert_allclose(data1["w"], rec["w"])


def test_fits_block_alignment(tmp_path):
    fn = str(tmp_path / "t.fits")
    fits.write_fits(fn, [fits.image_hdu(np.zeros(1, np.int64))])
    import os
    assert os.path.getsize(fn) % 2880 == 0


def _make_rays(order, dtype=jnp.float64, seed=3):
    npix = int(hp.order2npix(order))
    nest = np.arange(npix, dtype=np.int64)
    vec = hp.pix2vec_nest(nest, order)
    rays = init_rays(vec, 100.0, dtype=dtype)
    rng = np.random.default_rng(seed)
    A = np.eye(2) + 0.01 * rng.normal(size=(npix, 2, 2))
    alpha = 1e-3 * rng.normal(size=(npix, 2))
    # displace positions slightly off the pixel centers
    n2 = np.asarray(rays.n) + 0.1 * rng.normal(size=(npix, 3))
    n2 = n2 / np.linalg.norm(n2, axis=1, keepdims=True) * 100.0
    return rays._replace(
        A=jnp.asarray(A, dtype), alpha=jnp.asarray(alpha, dtype),
        n=jnp.asarray(n2, dtype),
    ), nest


def test_frame_transforms_invert():
    rays, nest = _make_rays(2)
    obs = jnp.asarray(hp.pix2vec_nest(nest, 2), rays.n.dtype)
    r1 = frames.rot_rays_radec2ang(
        frames.rot_rays_ang2radec(rays))
    np.testing.assert_allclose(np.asarray(r1.alpha), np.asarray(rays.alpha), atol=1e-14)
    np.testing.assert_allclose(np.asarray(r1.A), np.asarray(rays.A), atol=1e-14)
    r2 = frames.paratrans_rays_obs2curr(
        frames.paratrans_rays_curr2obs(rays, obs), obs)
    np.testing.assert_allclose(np.asarray(r2.A), np.asarray(rays.A), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2.Aprev), np.asarray(rays.Aprev), atol=1e-12)


def test_write_read_rays_layout(tmp_path):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path), RayOutputName="ray_",
        NumRayOutputFiles=3, OutputRayDeflections=True, OutputPhi=True,
    ).finalize()
    rays, nest = _make_rays(cfg.rayOrder)
    paths = rayio.write_rays(cfg, rays, nest)
    assert len(paths) == 3

    nbc = int(hp.order2npix(cfg.bundleOrder))
    rays_per_cell = 4 ** (cfg.rayOrder - cfg.bundleOrder)
    total = 0
    seen_cells = 0
    for p in paths:
        hdr, num, start, rows = rayio.read_rays(p)
        assert hdr["NumFiles"] == 3
        assert hdr["PeanoCellHEALPixOrder"] == cfg.bundleOrder
        assert hdr["RayHEALPixOrder"] == cfg.rayOrder
        assert len(num) == nbc
        # every nonzero cell holds the full complement of rays
        nz = num[num > 0]
        assert np.all(nz == rays_per_cell)
        seen_cells += len(nz)
        # rows grouped per cell: the layout start indices address the table
        for c in np.flatnonzero(num):
            sl = rows[start[c]: start[c] + num[c]]
            pe = hp.nest2peano(sl["nest"] >> (2 * (cfg.rayOrder - cfg.bundleOrder)),
                               cfg.bundleOrder)
            assert np.all(pe == c)
            # nest-ordered within the cell
            assert np.all(np.diff(sl["nest"]) > 0)
        total += len(rows)
    assert seen_cells == nbc
    assert total == int(hp.order2npix(cfg.rayOrder))


def _ring_order_rays(cfg, seed=7):
    """Rays in RING storage order (the driver's layout) + packed buffer."""
    from calclens_tpu.rays import soa

    npix = int(hp.order2npix(cfg.rayOrder))
    nest = hp.ring2nest(np.arange(npix, dtype=np.int64), cfg.rayOrder)
    vec = hp.pix2vec_nest(nest, cfg.rayOrder)
    rays = init_rays(vec, 100.0, dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    A = np.eye(2) + 0.01 * rng.normal(size=(npix, 2, 2))
    alpha = 1e-3 * rng.normal(size=(npix, 2))
    phi = rng.normal(size=npix)
    n2 = np.asarray(rays.n) + 0.1 * rng.normal(size=(npix, 3))
    n2 = n2 / np.linalg.norm(n2, axis=1, keepdims=True) * 100.0
    rays = rays._replace(A=jnp.asarray(A), alpha=jnp.asarray(alpha),
                         phi=jnp.asarray(phi), n=jnp.asarray(n2))
    packed = jnp.asarray(np.asarray(jnp.stack([
        rays.n[:, 0], rays.n[:, 1], rays.n[:, 2],
        rays.beta[:, 0], rays.beta[:, 1], rays.beta[:, 2],
        rays.A[:, 0, 0], rays.A[:, 0, 1], rays.A[:, 1, 0], rays.A[:, 1, 1],
        rays.Aprev[:, 0, 0], rays.Aprev[:, 0, 1],
        rays.Aprev[:, 1, 0], rays.Aprev[:, 1, 1],
        rays.alpha[:, 0], rays.alpha[:, 1],
        rays.U[:, 0, 0], rays.U[:, 0, 1], rays.U[:, 1, 0], rays.U[:, 1, 1],
        rays.phi])))
    return rays, nest, packed


def _assert_ray_files_match(paths_a, paths_b):
    assert len(paths_a) == len(paths_b)
    for pa, pb in zip(paths_a, paths_b):
        ha, na, sa, ra = rayio.read_rays(pa)
        hb, nb, sb, rb = rayio.read_rays(pb)
        assert ha == hb
        np.testing.assert_array_equal(na, nb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ra["nest"], rb["nest"])
        for f in ra.dtype.names:
            if f != "nest":
                np.testing.assert_allclose(ra[f], rb[f], atol=1e-9,
                                           err_msg=f)


def test_write_rays_sharded_fullsky_matches_host(tmp_path):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path / "a"), RayOutputName="ray_",
        NumRayOutputFiles=3, OutputRayDeflections=True, OutputPhi=True,
    ).finalize()
    rays, nest, packed = _ring_order_rays(cfg)
    pa = rayio.write_rays(cfg, rays, nest)
    cfg_b = dataclasses.replace(cfg, OutputPath=str(tmp_path / "b"))
    pb = rayio.write_rays_sharded(cfg_b, packed, None)
    _assert_ray_files_match(pa, pb)


def test_write_rays_sharded_restricted_matches_host(tmp_path):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path / "a"), RayOutputName="ray_",
        NumRayOutputFiles=2, OutputRayDeflections=True,
    ).finalize()
    rays, nest, packed = _ring_order_rays(cfg)
    # a ra-dec-box-like subset (every 3rd ray), storage order preserved
    keep = np.arange(0, len(nest), 3)
    sub = rays._replace(**{f: getattr(rays, f)[keep]
                           for f in rays._fields})
    pa = rayio.write_rays(cfg, sub, nest[keep])
    cfg_b = dataclasses.replace(cfg, OutputPath=str(tmp_path / "b"))
    pb = rayio.write_rays_sharded(cfg_b, packed[:, keep], nest[keep])
    _assert_ray_files_match(pa, pb)


def test_write_rays_sharded_on_mesh(tmp_path):
    """Mesh-sharded buffer writes the same files as the single-device path;
    the global [21, N] array is never gathered to the host."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path / "a"), RayOutputName="ray_",
        NumRayOutputFiles=4, OutputRayDeflections=True, OutputPhi=True,
    ).finalize()
    _, nest, packed = _ring_order_rays(cfg)
    pa = rayio.write_rays_sharded(cfg, packed, None)
    mesh = Mesh(np.array(jax.devices()), ("rays",))
    sharded = jax.device_put(packed, NamedSharding(mesh, P(None, "rays")))
    cfg_b = dataclasses.replace(cfg, OutputPath=str(tmp_path / "b"))
    pb = rayio.write_rays_sharded(cfg_b, sharded, None)
    _assert_ray_files_match(pa, pb)


def test_written_A_is_observer_frame(tmp_path):
    """At pixel centers with A=I, observer-frame A stays I in any basis."""
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=3, bundleOrder=1, SHTOrder=4,
        OutputPath=str(tmp_path), RayOutputName="ray_",
    ).finalize()
    npix = int(hp.order2npix(cfg.rayOrder))
    nest = np.arange(npix, dtype=np.int64)
    vec = hp.pix2vec_nest(nest, cfg.rayOrder)
    rays = init_rays(vec, 500.0, dtype=jnp.float64)
    paths = rayio.write_rays(cfg, rays, nest)
    _, num, start, rows = rayio.read_rays(paths[0])
    np.testing.assert_allclose(rows["A00"], 1.0, atol=1e-12)
    np.testing.assert_allclose(rows["A11"], 1.0, atol=1e-12)
    np.testing.assert_allclose(rows["A01"], 0.0, atol=1e-12)
    np.testing.assert_allclose(rows["A10"], 0.0, atol=1e-12)


def test_binary_ray_output_roundtrip(tmp_path):
    """RayOutputFormat=bin writes the reference's raw container
    (file_write_rays2bin, rayio.c:828-1046): int32-framed 256-byte header,
    the two int64 layout arrays, then the packed ray records.  Content must
    match the FITS writer row for row."""
    mk = lambda fmt, sub: RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path / sub), RayOutputName="ray_",
        NumRayOutputFiles=2, OutputRayDeflections=True, OutputPhi=True,
        RayOutputFormat=fmt,
    ).finalize()
    cfg_b, cfg_f = mk("bin", "b"), mk("fits", "f")
    rays, nest = _make_rays(cfg_b.rayOrder)
    paths_b = rayio.write_rays(cfg_b, rays, nest)
    paths_f = rayio.write_rays(cfg_f, rays, nest)
    assert len(paths_b) == 2

    for pb, pf in zip(paths_b, paths_f):
        hdr, num, start, rows = rayio.read_rays_bin(pb)
        assert hdr["NumFiles"] == 2
        assert hdr["PeanoCellHEALPixOrder"] == cfg_b.bundleOrder
        assert hdr["RayHEALPixOrder"] == cfg_b.rayOrder
        assert hdr["flag_defl"] == 1 and hdr["flag_phi"] == 1
        hdrf, numf, startf, rowsf = rayio.read_rays(pf)
        np.testing.assert_array_equal(num, numf)
        np.testing.assert_array_equal(start, startf)
        assert rows.dtype.names == tuple(rowsf.dtype.names)
        for name in rows.dtype.names:
            np.testing.assert_array_equal(rows[name], rowsf[name])

    # framing: every marker carries its block's byte count
    import struct
    with open(paths_b[0], "rb") as fp:
        raw = fp.read()
    m0 = struct.unpack("<i", raw[:4])[0]
    assert m0 == 256
    assert struct.unpack("<i", raw[4 + m0: 8 + m0])[0] == m0
    nbc = int(hp.order2npix(cfg_b.bundleOrder))
    off = 8 + m0
    for _ in range(2):
        m = struct.unpack("<i", raw[off: off + 4])[0]
        assert m == 8 * nbc
        off += 8 + m
    mrec = struct.unpack("<i", raw[off: off + 4])[0]
    assert mrec == rows.dtype.itemsize * int(num.sum())
    assert len(raw) == off + 8 + mrec


def test_binary_ray_output_sharded_matches_host(tmp_path):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path / "s"), RayOutputName="ray_",
        NumRayOutputFiles=2, RayOutputFormat="bin", Precision="f32",
    ).finalize()
    rays, nest, packed = _ring_order_rays(cfg)
    paths_s = rayio.write_rays_sharded(cfg, packed, None)
    cfg_h = dataclasses.replace(cfg, OutputPath=str(tmp_path / "h")).finalize()
    paths_h = rayio.write_rays(cfg_h, rays, nest)
    for ps, ph in zip(paths_s, paths_h):
        hdr_s, num_s, start_s, rows_s = rayio.read_rays_bin(ps)
        hdr_h, num_h, start_h, rows_h = rayio.read_rays_bin(ph)
        np.testing.assert_array_equal(num_s, num_h)
        np.testing.assert_array_equal(rows_s["nest"], rows_h["nest"])
        for name in ("ra", "dec", "A00", "A01", "A10", "A11"):
            np.testing.assert_allclose(rows_s[name], rows_h[name],
                                       atol=2e-5, rtol=2e-5)
