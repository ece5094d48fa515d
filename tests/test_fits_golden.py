"""Golden-byte FITS cross-validation against the REAL CFITSIO library.

The reference consumes/produces FITS exclusively through CFITSIO
(rayio.c:364-474, galsio.c:75-356, maputils.c).  io.fits has so far only
round-tripped against itself; here every writer output is re-parsed with the
system libcfitsio via ctypes (io.cfitsio) and must yield identical headers,
layouts and column values — the interop bar for "a reference-written reader
would accept these files".
"""
import numpy as np
import pytest
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.healpix import core as hp
from calclens_tpu.io import cfitsio, fits, rayio
from calclens_tpu.rays.propagate import init_rays

pytestmark = pytest.mark.skipif(not cfitsio.available(),
                                reason="libcfitsio not installed")


def _make_rays(order, seed=3):
    npix = int(hp.order2npix(order))
    nest = np.arange(npix, dtype=np.int64)
    vec = hp.pix2vec_nest(nest, order)
    rays = init_rays(vec, 100.0, dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    A = np.eye(2) + 0.01 * rng.normal(size=(npix, 2, 2))
    alpha = 1e-3 * rng.normal(size=(npix, 2))
    return rays._replace(A=jnp.asarray(A), alpha=jnp.asarray(alpha)), nest


def test_ray_fits_parses_with_cfitsio(tmp_path):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path), RayOutputName="ray_",
        NumRayOutputFiles=2, OutputRayDeflections=True, OutputPhi=True,
    ).finalize()
    rays, nest = _make_rays(cfg.rayOrder)
    paths = rayio.write_rays(cfg, rays, nest)

    for p in paths:
        hdr, num, start, rows = rayio.read_rays(p)
        with cfitsio.CFitsFile(p) as f:
            assert f.num_hdus() == 2
            assert f.move_to(1) == 0  # IMAGE
            assert f.key_long("NumFiles") == 2
            assert f.key_long("PeanoCellHEALPixOrder") == cfg.bundleOrder
            assert f.key_long("RayHEALPixOrder") == cfg.rayOrder
            layout = f.image().astype(np.int64)
            nbc = len(layout) // 2
            np.testing.assert_array_equal(layout[:nbc], num)
            np.testing.assert_array_equal(layout[nbc:], start)

            assert f.move_to(2) == 2  # BINTABLE
            assert f.key_string("EXTNAME").strip() == "Rays"
            cols = f.colnames()
            assert cols == ["nest", "ra", "dec", "A00", "A01", "A10", "A11",
                            "alpha0", "alpha1", "phi"]
            np.testing.assert_array_equal(f.column("nest", "i8"),
                                          rows["nest"])
            for c in ("ra", "dec", "A00", "A01", "A10", "A11",
                      "alpha0", "alpha1", "phi"):
                np.testing.assert_array_equal(f.column(c), rows[c])


def test_image_gals_fits_parses_with_cfitsio(tmp_path):
    from calclens_tpu.gals import io as gio
    from calclens_tpu.gals.gridsearch import ImageGals

    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        OutputPath=str(tmp_path), GalOutputName="gal_",
        NumGalOutputFiles=1,
    ).finalize()
    rng = np.random.default_rng(0)
    n = 37
    imgs = ImageGals(index=np.arange(n, dtype=np.int64) * 7,
                     ra=rng.uniform(0, 360, n), dec=rng.uniform(-90, 90, n),
                     A=np.eye(2) + 0.01 * rng.normal(size=(n, 2, 2)))
    path = gio.write_image_gals(cfg, imgs, plane_num=3)
    with cfitsio.CFitsFile(path) as f:
        f.move_to(2)
        np.testing.assert_array_equal(f.column("index", "i8"), imgs.index)
        np.testing.assert_array_equal(f.column("ra"), imgs.ra)
        np.testing.assert_array_equal(f.column("dec"), imgs.dec)
        np.testing.assert_array_equal(f.column("A00"), imgs.A[:, 0, 0])
        np.testing.assert_array_equal(f.column("A11"), imgs.A[:, 1, 1])


def test_lens_map_fits_parses_with_cfitsio(tmp_path):
    from calclens_tpu import maps

    order = 3
    npix = int(hp.order2npix(order))
    rng = np.random.default_rng(1)
    acc = maps.LensMapAccum(
        jnp.asarray(rng.integers(0, 5, npix).astype(np.int32)),
        *(jnp.asarray(rng.normal(size=npix)) for _ in range(6)))
    fn = str(tmp_path / "lensmap.fits")
    maps.write_lens_map_fits(acc, 1 << order, fn)
    ours = fits.read_fits(fn)
    with cfitsio.CFitsFile(fn) as f:
        nh = f.num_hdus()
        assert nh == len(ours)
        f.move_to(nh)
        names = f.colnames()
        _, rec = ours[-1]
        for c in names:
            np.testing.assert_array_equal(f.column(c), rec[c])


def test_single_map_fits_parses_with_cfitsio(tmp_path):
    from calclens_tpu import maps

    order = 3
    npix = int(hp.order2npix(order))
    sig = np.arange(npix, dtype=np.float32) * 0.5
    fn = str(tmp_path / "single.fits")
    maps.write_single_map_fits(sig, 1 << order, fn)
    with cfitsio.CFitsFile(fn) as f:
        f.move_to(2)
        assert f.key_string("PIXTYPE").strip() == "HEALPIX"
        col = f.colnames()[0]
        np.testing.assert_array_equal(f.column(col, "f4"), sig)
