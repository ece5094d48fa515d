"""Ring weights / pixel window loaders + concat postprocessing."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu.gals import concat
from calclens_tpu.gals.gridsearch import ImageGals
from calclens_tpu.gals import io as galsio
from calclens_tpu.io.weights import read_pixel_window, read_ring_weights
from calclens_tpu.config import RayTraceConfig

WPATH = "/root/reference/healpix_weights"
needs_weights = pytest.mark.skipif(not os.path.isdir(WPATH),
                                   reason="healpix weight files not present")


@needs_weights
def test_read_ring_weights_and_window():
    for order in (2, 5):
        nside = 1 << order
        w = read_ring_weights(WPATH, order)
        assert w.shape == (2 * nside,)
        assert np.all(np.abs(w - 1.0) < 0.25)
        b = read_pixel_window(WPATH, order)
        assert b.shape == (4 * nside + 1,)
        assert abs(b[0] - 1.0) < 1e-8
        assert np.all(np.diff(b) <= 1e-12)  # monotone decreasing


@needs_weights
def test_ring_weights_improve_quadrature():
    """map2alm of Y_00 with corrective weights is at least as accurate."""
    from calclens_tpu.sht.plan import SHTPlan
    from calclens_tpu.sht import transforms as T

    order = 4
    w = read_ring_weights(WPATH, order)
    plain = SHTPlan(order, dtype=jnp.float64)
    wtd = SHTPlan(order, dtype=jnp.float64, ring_weights=w)
    m = jnp.ones(plain.npix, jnp.float64)  # sqrt(4 pi) * Y_00
    want = np.sqrt(4.0 * np.pi)
    err_plain = abs(float(jnp.real(T.map2alm(plain, m)[0, 0])) - want)
    err_wtd = abs(float(jnp.real(T.map2alm(wtd, m)[0, 0])) - want)
    assert err_wtd <= err_plain * 1.5
    assert err_wtd < 1e-6


def test_concat_lensed_catalogs(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(40, 3)) * 500.0
    cat1, cat2 = tmp_path / "c1.fit", tmp_path / "c2.fit"
    galsio.write_source_gals(str(cat1), pos[:25])
    galsio.write_source_gals(str(cat2), pos[25:])
    lst = tmp_path / "gals.txt"
    lst.write_text(f"{cat1}\n{cat2}\n")

    cfg = RayTraceConfig(OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
                         rayOrder=4, bundleOrder=2, SHTOrder=4,
                         OutputPath=str(tmp_path / "out"),
                         GalOutputName="gal_").finalize()
    # fake images on two planes: sources 0..9 (indices as fileNum+2*row)
    idx = np.array([0, 2, 4, 1, 3], np.int64)  # rows 0,1,2 of cat1; 0,1 of cat2
    img = ImageGals(index=idx, ra=np.arange(5.0), dec=np.arange(5.0) + 10,
                    A=np.tile(np.eye(2) * 0.8, (5, 1, 1)))
    galsio.write_image_gals(cfg, img, plane_num=1)

    allimg = concat.read_all_images(cfg.OutputPath, "gal_", 4)
    assert len(allimg) == 5
    outs = concat.write_lensed_catalogs(str(lst), allimg, str(tmp_path / "lensed"))
    assert len(outs) == 2
    r1 = None
    from calclens_tpu.io import fits as cfits

    for hdr, data in cfits.read_fits(outs[0]):
        if str(hdr.get("XTENSION", "")).startswith("BINTABLE"):
            r1 = data
    assert len(r1) == 3  # three images from cat1
    np.testing.assert_allclose(r1["px"], pos[[0, 1, 2], 0])
    np.testing.assert_allclose(r1["kappa"], 1.0 - 0.8)
    np.testing.assert_allclose(r1["mu"], 1.0 / 0.64)
