"""Device-resident lens-map accumulation (reference maputils.c:129-192).

The reference never centralizes rays for lens maps: each task accumulates
its own and MPI_Reduce combines the coarse [7, npix_map] sums.  These tests
pin the TPU analog: device NEST<->RING conversions, the gather/reshape
full-sky accumulation, the sharded scatter+reduce-scatter path on the
8-device CPU mesh, and that no full-ray-buffer gather appears in the
sharded HLO.
"""
import re

import numpy as np
import jax
import jax.numpy as jnp

from calclens_tpu import maps as lm
from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer
from calclens_tpu.healpix import core as hp
from calclens_tpu.healpix import jaxhp


def test_ring_nest_dev_roundtrip_matches_host():
    rng = np.random.default_rng(3)
    for order in (0, 1, 3, 6, 10, 13):
        npix = int(hp.order2npix(order))
        n = min(npix, 4096)
        pix = rng.integers(0, npix, size=n).astype(np.int64)
        pix[:1] = 0
        pix[-1:] = npix - 1
        got_n = np.asarray(jaxhp.ring2nest_dev(jnp.asarray(pix, jnp.int32),
                                               order))
        np.testing.assert_array_equal(got_n, hp.ring2nest(pix, order))
        got_r = np.asarray(jaxhp.nest2ring_dev(jnp.asarray(
            hp.ring2nest(pix, order), jnp.int32), order))
        np.testing.assert_array_equal(got_r, pix)


def test_coarse_nest_from_ring_matches_host_shift():
    rng = np.random.default_rng(5)
    for order, mo in ((6, 3), (10, 6), (13, 11), (4, 4)):
        npix = int(hp.order2npix(order))
        pix = rng.integers(0, npix, size=2048).astype(np.int64)
        want = hp.ring2nest(pix, order) >> (2 * (order - mo))
        got = np.asarray(jaxhp.coarse_nest_from_ring(
            jnp.asarray(pix, jnp.int32), order, mo))
        np.testing.assert_array_equal(got, want)


def _stepped_raytracer(mesh=None, ray_order=5):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=5, rayOrder=ray_order, bundleOrder=2, Precision="f64",
    ).finalize()
    rt = Raytracer(cfg, mesh=mesh)
    rt.init_rays()
    rng = np.random.default_rng(11)
    v = rng.normal(size=(4096, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rt.step(1, pos=v * 375.0, mass=np.full(4096, 5.0e15))
    return rt


def test_accum_fullsky_matches_host_update():
    rt = _stepped_raytracer()
    map_order = 3
    stacked = np.asarray(lm.accum_lens_map_packed(
        rt.rays_packed, None, rt.cfg.rayOrder, map_order))
    ref = lm.update_lens_map(lm.LensMapAccum.zeros(map_order), rt.rays,
                             jnp.asarray(rt.ray_nest), rt.cfg.rayOrder,
                             map_order)
    np.testing.assert_array_equal(np.rint(stacked[0]).astype(np.int64),
                                  np.asarray(ref.count))
    for i, k in enumerate(("A00", "A01", "A10", "A11", "ra", "dec")):
        np.testing.assert_allclose(stacked[i + 1], np.asarray(getattr(ref, k)),
                                   rtol=1e-12, atol=1e-12, err_msg=k)


def test_accum_sharded_matches_fullsky_and_no_ray_gather():
    from calclens_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(8)
    rt = _stepped_raytracer(mesh=mesh)
    map_order = 3
    sh = lm.accum_lens_map_sharded(rt.rays_packed, rt.cfg.rayOrder,
                                   map_order, mesh)
    single = lm.accum_lens_map_packed(
        jax.device_put(rt.rays_packed, jax.devices("cpu")[0]), None,
        rt.cfg.rayOrder, map_order)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(single),
                               rtol=1e-12, atol=1e-10)

    # structural: the sharded accumulation must not gather the [21, N] ray
    # buffer (or any N-sized operand) onto one participant
    from jax.sharding import PartitionSpec as P
    from calclens_tpu.parallel.sharding import AXIS
    from jax.sharding import NamedSharding

    N = rt.rays_packed.shape[1]
    aval = jax.ShapeDtypeStruct((21, N), rt.rays_packed.dtype,
                                sharding=NamedSharding(mesh, P(None, AXIS)))

    def fn(pk):
        return lm.accum_lens_map_sharded(pk, rt.cfg.rayOrder, map_order, mesh)

    txt = jax.jit(fn).lower(aval).compile().as_text()
    for m in re.finditer(r"all-gather[^=]*=?\s*\w*\[([0-9,]+)\]", txt):
        n_el = int(np.prod([int(v) for v in m.group(1).split(",")]))
        assert n_el < N, f"all-gather of {n_el} elements (N={N})"


def test_driver_map_outputs_device_path(tmp_path):
    """_write_map_outputs through the device path produces the same FITS
    tables as the host accumulation did."""
    rt = _stepped_raytracer()
    rt.cfg.OutputPath = str(tmp_path)
    rt.cfg.LensMapOrder = 3
    cpath, rpath = rt._write_map_outputs()
    from calclens_tpu.io import fits

    ref = lm.update_lens_map(lm.LensMapAccum.zeros(3), rt.rays,
                             jnp.asarray(rt.ray_nest), rt.cfg.rayOrder, 3)
    hdr, rec = fits.read_fits(rpath)[1]
    cnt = np.asarray(ref.count, np.int64)
    np.testing.assert_array_equal(rec["N_RAYS"], cnt)
    np.testing.assert_allclose(
        rec["A00"], np.asarray(ref.A00) / np.maximum(cnt, 1), rtol=1e-12)
    sig = fits.read_fits(cpath)[1][1]["SIGNAL"]
    np.testing.assert_allclose(sig, lm.convergence_from_accum(ref),
                               rtol=0, atol=1e-6)


def test_propagate_to_cmb_device_accum():
    rt = _stepped_raytracer()
    accum = rt.propagate_to_cmb(map_order=3)
    npix_ray = int(hp.order2npix(rt.cfg.rayOrder))
    assert int(np.asarray(accum.count).sum()) == npix_ray
    # all rays landed at chi(z_cmb)
    r = np.linalg.norm(np.asarray(rt.rays.n), axis=1)
    w = float(lm.comoving_distance_2f1(1100.0, 0.3))
    np.testing.assert_allclose(r, w, rtol=1e-10)
